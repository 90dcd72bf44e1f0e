"""DelayedJobExecutor: lazy UDF results.

Counterpart of the reference's ``libertem/executor/delayed.py``
(DelayedJobExecutor:211, delayed_to_buffer_wrappers:460): there,
``run_udf`` returns dask arrays that only compute when consumed, so
runs can be composed into larger lazy graphs.

TPU-native translation: jax itself dispatches asynchronously, so the
lazy boundary that matters is the *host IO + run loop*.  A delayed run
returns :class:`DelayedResults` immediately — no data is read — and
executes exactly once, on first access to any buffer's data (or an
explicit ``compute()``).  Buffer *declarations* (names, shapes,
dtypes) come from a dry run and are available without computing.  When
dask is installed, ``to_dask()`` additionally exposes each buffer as a
``dask.array`` backed by the same single-shot computation, enabling
composition with dask pipelines like the reference.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from .base import JobExecutor
from .inline import InlineJobExecutor


class DelayedBuffer:
    """Lazy proxy for one result buffer: shape/dtype available
    immediately, data triggers the shared computation."""

    def __init__(self, name: str, decl, compute: Callable[[], dict],
                 data_shape=None, data_dtype=None):
        self._name = name
        self._decl = decl
        self._compute = compute
        self._data_shape = data_shape
        self._data_dtype = data_dtype

    @property
    def kind(self):
        return self._decl.kind

    @property
    def extra_shape(self):
        return self._decl.extra_shape

    @property
    def dtype(self):
        return self._decl.dtype

    def _materialized(self):
        return self._compute()[self._name]

    @property
    def data(self):
        return self._materialized().data

    @property
    def raw_data(self):
        return self._materialized().raw_data

    @property
    def masked_data(self):
        return self._materialized().masked_data

    @property
    def valid_mask(self):
        return self._materialized().valid_mask

    def __array__(self, dtype=None):
        arr = np.asarray(self.data)
        return arr.astype(dtype) if dtype is not None else arr

    def to_dask(self):
        """dask.array view; shape/dtype come from the dry-run
        declaration so building the graph stays lazy — only computing
        the dask array runs the UDF pass (once)."""
        import dask
        import dask.array as da

        lazy = dask.delayed(
            lambda: np.asarray(self._materialized().data)
        )()
        return da.from_delayed(
            lazy, shape=self._data_shape, dtype=self._data_dtype
        )

    def __repr__(self):
        return (
            f"<DelayedBuffer {self._name!r} kind={self._decl.kind} "
            f"dtype={self._decl.dtype}>"
        )


class DelayedResults(dict):
    """dict of DelayedBuffer for one UDF; computes once, on demand."""

    def __init__(self, buffers: dict, compute: Callable[[], dict]):
        super().__init__(buffers)
        self._compute = compute

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k) from None

    def compute(self):
        """Force execution; returns the eager results dict (with the
        run's damage buffer, like the eager path)."""
        from ..udf.base import SingleUDFResults

        materialized = self._compute()
        return SingleUDFResults(
            materialized, self._compute.full_results().damage
        )


def make_delayed_results(context, dataset, udfs, single, roi,
                         corrections, progress=False):
    """Build lazy result proxies for a run; executes (once) on first
    data access via the context's eager machinery."""
    import threading

    from ..udf.base import UDFRunner

    # buffer declarations via a dry run (no data read) — sets up UDF
    # meta so shapes/dtypes resolve (reference: dry_run udf/base.py:2440)
    decls = [
        dict(b) for b in UDFRunner(udfs).dry_run(dataset, roi).buffers
    ]
    state = {}
    # accessing two lazy buffers from dask's threaded scheduler must
    # not run the UDF pass twice concurrently
    run_lock = threading.Lock()

    def run_once():
        with run_lock:
            if "results" not in state:
                runner = UDFRunner(udfs)
                results = runner.run_for_dataset(
                    dataset, roi=roi, corrections=corrections,
                    progress=progress,
                    device=context.executor.main_device,
                    devices=context._run_devices(),
                )
                state["results"] = results
        return state["results"]

    nav_shape = tuple(dataset.meta.shape.nav)
    sig_shape = tuple(dataset.meta.shape.sig)

    def _decl_shape(b):
        # analytic .data shape from the declaration — touching
        # b.data would transfer the dry-run zeros from the device
        extra = tuple(b.extra_shape)
        if b.kind == "nav":
            return nav_shape + extra
        if b.kind == "sig":
            return sig_shape + extra
        return extra if extra else ()

    out = []
    for i, decl in enumerate(decls):
        def compute(i=i):
            return run_once().buffers[i]

        compute.full_results = run_once
        bufs = {
            name: DelayedBuffer(
                name, b, compute,
                data_shape=_decl_shape(b),
                data_dtype=np.dtype(b.dtype),
            )
            for name, b in decl.items()
        }
        out.append(DelayedResults(bufs, compute))
    if single:
        return out[0]
    return out


class DelayedJobExecutor(JobExecutor):
    """Marker executor selecting the lazy run path; computation, when
    forced, runs on the wrapped eager executor (inline by default)."""

    is_delayed = True

    def __init__(self, wrapped: Optional[JobExecutor] = None, **kwargs):
        super().__init__(**kwargs)
        self._wrapped = wrapped or InlineJobExecutor()

    @property
    def main_device(self):
        return self._wrapped.main_device

    @property
    def devices(self):
        return self._wrapped.devices

    def get_available_workers(self):
        return self._wrapped.get_available_workers()

    def run_function(self, fn, *args, **kwargs):
        return self._wrapped.run_function(fn, *args, **kwargs)

    def close(self):
        self._wrapped.close()
