"""AutoUDF: wrap an arbitrary f(frame) -> result
(reference: libertem/udf/auto.py:11 — backs Context.map).

jax-traceable functions run on the device path, auto-shaped by
abstract evaluation (no FLOPs spent).  Anything else — numpy-only
code, or f returning arbitrary Python objects (strings, dicts,
callables; reference test_auto_weird) — falls back to the HOST
engine, with an object-dtype nav buffer when the result is not
array-like (the reference wraps those the same way, auto.py:42).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import UDF


class AutoUDF(UDF):
    def __init__(self, f=None, monitor=False):
        super().__init__(f=f, monitor=monitor)
        self._probe = None  # (mode, shape, dtype)

    def auto_buffer(self, var):
        return self.buffer(
            kind="nav", extra_shape=var.shape, dtype=var.dtype
        )

    def _probe_f(self):
        """Classify f on a mock frame: 'jax' (traceable),
        'host' (numpy array result), or 'object' (anything else)."""
        if self._probe is not None:
            return self._probe
        sig = tuple(self.meta.dataset_shape.sig)
        try:
            mock = jax.ShapeDtypeStruct(sig, self.meta.input_dtype)
            out = jax.eval_shape(self.params.f, mock)
            self._probe = ("jax", tuple(out.shape), out.dtype)
        except Exception:
            # reference semantics (auto.py:42): run f for real on a
            # zero frame to discover the result shape
            res = self.params.f(
                np.zeros(sig, dtype=self.meta.input_dtype)
            )
            try:
                arr = np.asarray(res)
                if arr.dtype == object:
                    raise ValueError
                self._probe = ("host", tuple(arr.shape), arr.dtype)
            except Exception:
                self._probe = ("object", (), np.dtype(object))
        return self._probe

    def get_backends(self):
        mode, _, _ = self._probe_f()
        if mode == "jax":
            return (self.BACKEND_JAX,)
        return (self.BACKEND_NUMPY,)

    def get_result_buffers(self):
        mode, shape, dtype = self._probe_f()
        bufs = {
            "result": self.buffer(
                kind="nav", extra_shape=shape, dtype=dtype
            ),
        }
        if self.params.monitor:
            if mode == "object":
                raise ValueError(
                    "monitor= requires an array-valued f"
                )
            # reference auto.py: a 'single' buffer holding the most
            # recently processed frame's result, for live monitoring
            bufs["monitor"] = self.buffer(
                kind="single", extra_shape=shape, dtype=dtype,
            )
        return bufs

    def process_frame(self, frame):
        mode, shape, dtype = self._probe_f()
        res = self.params.f(frame)
        if mode == "object":
            # object results live in a host-side object array; the
            # rebind write-back stores f's return value per nav slot
            # (numpy ELEMENT assignment keeps lists/dicts intact)
            self.results.result = res
            return
        if self._host_mode:
            arr = np.asarray(res).reshape(shape)
            self.results.result = arr  # rebind write-back
            if self.params.monitor:
                self.results.monitor[...] = arr
            return
        res = jnp.asarray(res)
        self.results.result = res.reshape(
            self.results.result.shape
        )
        if self.params.monitor:
            self.results.monitor = res.reshape(
                self.results.monitor.shape
            )

    def merge(self, dest, src):
        # a custom merge receives ALL buffers and must write each
        # (reference udf/base.py:1420): nav rows copy positionally,
        # the monitor ('single') buffer takes the latest partition —
        # "some recent frame", like the reference
        if "result" in src:
            dest.result[...] = src.result
        if "monitor" in src:
            dest.monitor = src.monitor
