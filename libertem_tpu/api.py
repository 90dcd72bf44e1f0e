"""Context — the public Python API.

TPU-native counterpart of the reference's ``libertem/api.py``
(Context:177, load:446, run_udf:914, run_udf_iter:1053, map:1617,
create_*_analysis:514–852, run:854).
"""
from __future__ import annotations

from typing import Iterable, Optional, Sequence, Union

import numpy as np

from .common.buffers import BufferWrapper
from .common.snooze import keep_alive
from .executor.base import JobExecutor
from .executor.inline import InlineJobExecutor
from .io.corrections import CorrectionSet
from .io.dataset.base import DataSet
from .udf.base import (
    SingleUDFResults,
    UDF,
    UDFResults,
    UDFRunner,
)


class ResultGenerator:
    """Iterator of partial UDFResults with mid-run parameter patching
    (reference: api.py:73 ResultGenerator +
    update_parameters_experimental api.py:99)."""

    def __init__(self, gen, runner: UDFRunner, plots=None, ctx=None,
                 udfs=None):
        self._gen = gen
        self._runner = runner
        self._plots = plots
        self._ctx = ctx
        self._udfs = udfs
        self._last = None

    def __iter__(self):
        return self

    def __next__(self):
        try:
            res = next(self._gen)
        except StopIteration:
            if self._plots and self._last is not None:
                self._ctx._update_plots(
                    self._plots, self._last, self._udfs, final=True
                )
                self._plots = None
            self._emit_end()
            raise
        if self._plots:
            self._ctx._update_plots(self._plots, res, self._udfs)
            self._last = res
        return res

    def _emit_end(self):
        if self._ctx is not None and not getattr(
            self, "_ended", False
        ):
            self._ended = True
            self._ctx._emit_run_event("run_udf:end", self._udfs)

    def update_parameters_experimental(self, patches):
        self._runner.update_parameters_experimental(patches)

    def throw(self, *args):
        return self._gen.throw(*args)

    def close(self):
        self._gen.close()
        self._emit_end()


class AsyncResultGenerator:
    """Async counterpart of :class:`ResultGenerator` (reference
    ResultAsyncGenerator, api.py:1460): supports ``async for``,
    ``await .update_parameters_experimental(...)``, ``athrow`` and
    ``aclose``."""

    def __init__(self, agen, sync_gen: "ResultGenerator"):
        self._agen = agen
        self._sync_gen = sync_gen

    def __aiter__(self):
        return self

    def __anext__(self):
        return self._agen.__anext__()

    async def update_parameters_experimental(self, patches):
        self._sync_gen.update_parameters_experimental(patches)

    def athrow(self, *args):
        return self._agen.athrow(*args)

    def aclose(self):
        return self._agen.aclose()


class Context:
    """Entry point: load datasets, run UDFs and analyses."""

    def __init__(self, executor: Optional[JobExecutor] = None,
                 plot_class=None, snooze_timeout=None):
        from .common.tracing import maybe_setup_tracing
        maybe_setup_tracing("libertem-tpu")
        if executor is None:
            executor = InlineJobExecutor()
        self.executor = executor
        self._plot_class = plot_class
        self.snooze_manager = None
        if snooze_timeout is not None:
            # reference api.py:238 snooze_timeout: scale down after
            # idle.  Here there is no worker pool to shrink — the
            # held resources are XLA executables and cached device
            # buffers, released via jax.clear_caches(); runs hold
            # the manager awake via the keep_alive decorator.
            from .common.snooze import SnoozeManager
            self.snooze_manager = SnoozeManager(
                down=self._snooze_down, timeout=snooze_timeout,
            )
        # reference parity: the executor exposes the snooze manager
        # (common/executor.py snooze_manager property)
        executor._snooze_manager = self.snooze_manager

    @staticmethod
    def _snooze_down():
        try:
            import jax
            jax.clear_caches()
        except Exception:
            pass

    @property
    def plot_class(self):
        """Default live-plot class for ``plots=True``
        (reference api.py:436)."""
        if self._plot_class is None:
            from .viz.mpl import MPLLive2DPlot
            self._plot_class = MPLLive2DPlot
        return self._plot_class

    @plot_class.setter
    def plot_class(self, value):
        self._plot_class = value

    @classmethod
    def make_with(
        cls, executor_spec: str = "inline", /, *,
        cpus=None, gpus=None, tpus=None, main_process_gpu=None,
        plot_class=None, snooze_timeout=None, **kwargs,
    ) -> "Context":
        """Create a Context with a named executor
        (reference api.py:238).  All of the reference's distributed
        specs map onto the device mesh:

        'inline' | 'synchronous' | 'threads' | 'concurrent'
            -> single-device InlineJobExecutor
        'sharded' | 'tpu' | 'dask' | 'dask-make-default' |
        'dask-integration' | 'pipelined'
            -> ShardedJobExecutor over all devices
        'delayed' -> DelayedJobExecutor (requires dask)
        """
        from .common.exceptions import ExecutorSpecException

        # worker-spec validity rules (reference api.py:355): executors
        # without tunable workers reject cpus=/gpus= loudly
        limited = (
            "inline", "synchronous", "dask-integration", "delayed",
        )
        if cpus is not None and executor_spec in limited:
            raise ExecutorSpecException(
                f"Executor type {executor_spec} does not support "
                f"specifying CPU workers at this time"
            )
        if gpus is not None and executor_spec in limited + (
            "threads",
        ):
            raise ExecutorSpecException(
                f"Executor type {executor_spec} does not support "
                f"specifying GPU workers at this time"
            )
        if gpus:
            from .utils.devices import detect
            if not detect()["cudas"]:
                raise ExecutorSpecException(
                    "Cannot specify GPU workers as no GPUs detected"
                )
        if main_process_gpu is True or isinstance(
            main_process_gpu, int
        ) and not isinstance(main_process_gpu, bool):
            # reference make_canonical (api.py:237): requesting
            # main-process GPU compute needs CuPy + a CUDA device —
            # neither exists on a TPU host
            from .utils.devices import detect
            d = detect()
            if not d["has_cupy"] or not d["cudas"]:
                raise ExecutorSpecException(
                    "main_process_gpu requested but no GPU/CuPy "
                    "available on this host"
                )
        if executor_spec in ("inline", "synchronous"):
            return cls(executor=InlineJobExecutor(),
                       plot_class=plot_class,
                       snooze_timeout=snooze_timeout)
        elif executor_spec in ("threads", "concurrent"):
            from .executor.compat import ConcurrentJobExecutor
            return cls(executor=ConcurrentJobExecutor(),
                       plot_class=plot_class,
                       snooze_timeout=snooze_timeout)
        elif executor_spec in (
            "sharded", "tpu", "pipelined", "dask",
            "dask-make-default", "dask-integration",
        ):
            from .executor.sharded import ShardedJobExecutor
            devices = None
            if tpus is not None:
                import jax
                all_devices = jax.devices()
                devices = [all_devices[i] for i in tpus]
            return cls(executor=ShardedJobExecutor(devices=devices),
                       plot_class=plot_class,
                       snooze_timeout=snooze_timeout)
        elif executor_spec == "delayed":
            from .executor.compat import DelayedJobExecutor
            return cls(executor=DelayedJobExecutor(**kwargs),
                       plot_class=plot_class,
                       snooze_timeout=snooze_timeout)
        raise ExecutorSpecException(
            f"Argument `executor_spec` is {executor_spec}. Allowed "
            f'are "synchronous", "inline", "threads", "dask", '
            f'"dask-integration", "dask-make-default", "delayed", '
            f'"pipelined" (or this framework\'s "sharded"/"tpu").'
        )

    # -- datasets -----------------------------------------------------------

    def load(self, filetype: str, *args, **kwargs) -> DataSet:
        """Open a dataset (reference api.py:446).  ``filetype`` may be a
        registered format id or 'auto'."""
        from .io.dataset import load as _load
        ds = _load(filetype, *args, executor=self.executor, **kwargs)
        workers = self.executor.get_available_workers()
        ds.set_num_cores(max(4, 2 * len(workers)))
        return ds

    def export_dataset(self, dataset: DataSet, *, path: str,
                       progress=False, overwrite: bool = False):
        """Export a dataset to .npy (reference api.py:1706);
        refuses to clobber an existing file unless ``overwrite``."""
        import os as _os
        if not str(path).endswith(".npy"):
            raise ValueError(
                f"unrecognized file extension in {path!r}: only "
                ".npy is currently supported"
            )
        if not overwrite and _os.path.isfile(path):
            raise FileExistsError(
                f"cannot export dataset to existing path {path}; "
                "use overwrite=True to force export"
            )
        from .io.writers import write_dataset_npy
        return write_dataset_npy(self, dataset, path, progress=progress)

    # -- UDFs ------------------------------------------------------------

    @keep_alive
    def run_udf(
        self,
        dataset: DataSet,
        udf: Union[UDF, Sequence[UDF]],
        roi: Optional[np.ndarray] = None,
        corrections: Optional[CorrectionSet] = None,
        progress: bool = False,
        backends=None,
        plots=None,
        sync: bool = True,
    ):
        """Run one or more UDFs over a dataset in a single pass.

        Returns a dict of result buffers for a single UDF, or a list of
        dicts when given a sequence of UDFs (reference api.py:914).
        With ``sync=False``, returns an awaitable instead (the
        reference's async variant).
        """
        if not sync:
            return self.run_udf_async(
                dataset, udf, roi=roi, corrections=corrections,
                progress=progress, backends=backends, plots=plots,
            )
        udfs, single = self._normalize_udfs(udf)
        roi = self._normalize_roi(roi, dataset)
        if getattr(self.executor, "is_delayed", False) and not plots:
            # lazy results (reference: DelayedJobExecutor
            # executor/delayed.py:211) — no IO until data is accessed.
            # Subscription events mark result CONSTRUCTION here (the
            # actual compute is deferred to first access).
            self._emit_run_event("run_udf:start", udfs, dataset)
            try:
                from .executor.delayed import make_delayed_results
                return make_delayed_results(
                    self, dataset, udfs, single, roi, corrections,
                    progress=progress,
                )
            finally:
                self._emit_run_event("run_udf:end", udfs)
        plots = self._prepare_plots(plots, dataset, udfs, roi)
        runner = UDFRunner(
            udfs, debug=getattr(self.executor, '_debug', False),
            backends=backends,
            threads_per_worker=getattr(
                self.executor, "threads_per_worker", 1
            ),
        )
        self._emit_run_event("run_udf:start", udfs, dataset)
        try:
            if plots:
                results = None
                for results in runner.run_for_dataset_iter(
                    dataset, roi=roi, corrections=corrections,
                    progress=progress,
                    device=self.executor.main_device,
                    devices=self._run_devices(),
                ):
                    self._update_plots(plots, results, udfs)
                self._update_plots(plots, results, udfs, final=True)
            else:
                results = runner.run_for_dataset(
                    dataset, roi=roi, corrections=corrections,
                    progress=progress,
                    device=self.executor.main_device,
                    devices=self._run_devices(),
                )
        finally:
            self._emit_run_event("run_udf:end", udfs)
        return self._wrap(results, single)

    def _emit_run_event(self, topic, udfs, dataset=None):
        subs = getattr(self.executor, "subscriptions", None)
        if subs is None:
            return
        msg = {"udfs": [type(u).__name__ for u in udfs]}
        if dataset is not None:
            msg["dataset_shape"] = tuple(dataset.shape)
        subs.send(topic, msg)

    def _run_devices(self):
        devs = self.executor.devices
        return devs if len(devs) > 1 else None

    def run_udf_iter(
        self,
        dataset: DataSet,
        udf: Union[UDF, Sequence[UDF]],
        roi: Optional[np.ndarray] = None,
        corrections: Optional[CorrectionSet] = None,
        progress: bool = False,
        backends=None,
        plots=None,
        sync: bool = True,
    ) -> "ResultGenerator":
        """Generator of partial results, one per merged partition
        (reference api.py:1053).  The returned generator supports
        ``update_parameters_experimental([{...}, ...])`` to patch UDF
        parameters mid-run.  ``plots`` updates live plots on every
        yielded partial; ``sync=False`` returns an async generator
        (the reference's async variant)."""
        if not sync:
            sync_gen = self.run_udf_iter(
                dataset, udf, roi=roi, corrections=corrections,
                progress=progress, backends=backends, plots=plots,
            )
            from .common.async_utils import async_generator_eager
            return AsyncResultGenerator(
                async_generator_eager(iter(sync_gen), queue_size=8),
                sync_gen
            )
        udfs, single = self._normalize_udfs(udf)
        roi = self._normalize_roi(roi, dataset)
        plots = self._prepare_plots(plots, dataset, udfs, roi)
        runner = UDFRunner(
            udfs, debug=getattr(self.executor, '_debug', False),
            backends=backends,
            threads_per_worker=getattr(
                self.executor, "threads_per_worker", 1
            ),
        )
        self._emit_run_event("run_udf:start", udfs, dataset)
        gen = runner.run_for_dataset_iter(
            dataset, roi=roi, corrections=corrections, progress=progress,
            device=self.executor.main_device,
            devices=self._run_devices(),
        )
        return ResultGenerator(
            gen, runner, plots=plots, ctx=self, udfs=udfs
        )

    async def run_udf_iter_async(
        self, dataset, udf, roi=None, corrections=None,
        progress=False, backends=None, plots=None,
    ):
        """Async generator of partial results (reference:
        run_for_dataset_async udf/base.py:2735 via AsyncAdapter).
        ``plots`` updates live plots on each yielded partial like the
        sync variant (plot updates run on the driving thread)."""
        from .common.async_utils import async_generator_eager
        gen = self.run_udf_iter(
            dataset, udf, roi=roi, corrections=corrections,
            progress=progress, backends=backends, plots=plots,
        )
        async for item in async_generator_eager(
            iter(gen), queue_size=8,
        ):
            yield item

    async def run_udf_async(
        self, dataset, udf, roi=None, corrections=None,
        progress=False, backends=None, plots=None,
    ):
        """Awaitable variant of run_udf (the reference's
        ``run_udf(..., sync=False)``, api.py:914)."""
        from .common.async_utils import sync_to_async
        return await sync_to_async(
            self.run_udf, dataset, udf, roi=roi,
            corrections=corrections, progress=progress,
            backends=backends, plots=plots,
        )

    def inspect_udf(self, udf, dataset, roi=None):
        """Buffer declarations without running
        (reference udf/base.py:2397 inspect_udf)."""
        runner = UDFRunner([udf])
        results = runner.dry_run(dataset, roi)
        return SingleUDFResults(results.buffers[0], results.damage)

    def display(self, dataset, udf, roi=None):
        """Notebook-displayable summary of what a UDF would produce
        (reference api.py:1543 — returns an object with both str and
        ``_repr_html_`` representations)."""
        res = self.inspect_udf(udf, dataset, roi)

        class UDFDisplay:
            def __init__(self, title, rows):
                self._title = title
                self._rows = rows

            def __str__(self):
                lines = [self._title]
                for name, kind, dtype, extra in self._rows:
                    lines.append(
                        f"  {name}: kind={kind} dtype={dtype} "
                        f"extra_shape={extra}"
                    )
                return "\n".join(lines)

            __repr__ = __str__

            def _repr_html_(self):
                cells = "".join(
                    f"<tr><td>{name}</td><td>{kind}</td>"
                    f"<td>{dtype}</td><td>{extra}</td></tr>"
                    for name, kind, dtype, extra in self._rows
                )
                return (
                    f"<p>{self._title}</p>"
                    f"<table><tr><th>name</th><th>kind</th>"
                    f"<th>dtype</th><th>extra_shape</th></tr>"
                    f"{cells}</table>"
                )

        rows = [
            (name, buf.kind, buf.dtype, buf.extra_shape)
            for name, buf in res.items()
        ]
        return UDFDisplay(f"{type(udf).__name__} on {dataset}:", rows)

    def map(self, dataset: DataSet, f, roi=None, progress=False,
            corrections=None, backends=None):
        """Apply ``f(frame) -> ndarray`` to every frame
        (reference api.py:1617)."""
        from .udf.auto import AutoUDF
        udf = AutoUDF(f=f)
        results = self.run_udf(
            dataset, udf, roi=roi, progress=progress,
            corrections=corrections, backends=backends
        )
        return results["result"]

    # -- analyses -----------------------------------------------------------

    @keep_alive
    def run(self, analysis, roi=None, progress=False,
            corrections=None):
        """Run an Analysis and post-process into an AnalysisResultSet
        (reference api.py:854)."""
        if roi is None:
            roi = analysis.get_roi()
        udf = analysis.get_udf()
        udf_results = self.run_udf(
            analysis.dataset, udf, roi=roi, progress=progress,
            corrections=corrections,
        )
        damage = udf_results.damage if hasattr(udf_results, "damage") else None
        return analysis.get_udf_results(udf_results, roi, damage)

    def create_mask_analysis(self, factories, dataset, **kwargs):
        from .analysis.masks import MasksAnalysis
        return MasksAnalysis(
            dataset=dataset,
            parameters=dict(factories=factories, **kwargs),
        )

    def create_disk_analysis(self, dataset, cx=None, cy=None, r=None):
        from .analysis.disk import DiskMaskAnalysis
        return DiskMaskAnalysis(
            dataset=dataset,
            parameters={"cx": cx, "cy": cy, "r": r},
        )

    def create_ring_analysis(
        self, dataset, cx=None, cy=None, ri=None, ro=None
    ):
        from .analysis.ring import RingMaskAnalysis
        return RingMaskAnalysis(
            dataset=dataset,
            parameters={"cx": cx, "cy": cy, "ri": ri, "ro": ro},
        )

    def create_point_analysis(self, dataset, x=None, y=None):
        from .analysis.point import PointMaskAnalysis
        return PointMaskAnalysis(
            dataset=dataset, parameters={"cx": x, "cy": y}
        )

    def create_sum_analysis(self, dataset):
        from .analysis.sum import SumAnalysis
        return SumAnalysis(dataset=dataset, parameters={})

    def create_sumsig_analysis(self, dataset):
        from .analysis.sumsig import SumSigAnalysis
        return SumSigAnalysis(dataset=dataset, parameters={})

    def create_sd_analysis(self, dataset):
        from .analysis.sd import SDAnalysis
        return SDAnalysis(dataset=dataset, parameters={})

    def create_pick_analysis(self, dataset, x, y=None, z=None):
        from .analysis.raw import PickFrameAnalysis
        params = {"x": x}
        if y is not None:
            params["y"] = y
        if z is not None:
            params["z"] = z
        return PickFrameAnalysis(dataset=dataset, parameters=params)

    def create_com_analysis(
        self, dataset, cx=None, cy=None, mask_radius=None,
        flip_y=False, scan_rotation=0.0, mask_radius_inner=None,
    ):
        # reference validations (api.py create_com_analysis): CoM
        # needs a 2D scan over 2D frames, and the annular mode needs
        # BOTH radii
        if dataset.shape.nav.dims != 2:
            raise ValueError(
                "CoM analysis needs a 2D navigation shape, got "
                f"{tuple(dataset.shape.nav)}"
            )
        if dataset.shape.sig.dims != 2:
            raise ValueError(
                "CoM analysis needs a 2D signal shape, got "
                f"{tuple(dataset.shape.sig)}"
            )
        if mask_radius_inner is not None and mask_radius is None:
            raise ValueError(
                "mask_radius_inner requires mask_radius (annular "
                "mode needs both radii)"
            )
        from .analysis.com import COMAnalysis
        return COMAnalysis(
            dataset=dataset,
            parameters={
                "cx": cx, "cy": cy, "r": mask_radius,
                "ri": mask_radius_inner,
                "flip_y": flip_y, "scan_rotation": scan_rotation,
            },
        )

    def create_radial_fourier_analysis(
        self, dataset, cx=None, cy=None, ri=None, ro=None,
        n_bins=None, max_order=None, use_sparse=None,
    ):
        from .analysis.radialfourier import RadialFourierAnalysis
        return RadialFourierAnalysis(
            dataset=dataset,
            parameters={
                "cx": cx, "cy": cy, "ri": ri, "ro": ro,
                "n_bins": n_bins, "max_order": max_order,
                # accepted for reference signature parity; the mask
                # stack is auto-compacted here (ops/sparse_masks.py),
                # so the dense/sparse choice is engine-internal
                "use_sparse": use_sparse,
            },
        )

    def create_fem_analysis(self, dataset, cx=None, cy=None, ri=None, ro=None):
        from .analysis.fem import FEMAnalysis
        return FEMAnalysis(
            dataset=dataset,
            parameters={"cx": cx, "cy": cy, "ri": ri, "ro": ro},
        )

    # -- plumbing -----------------------------------------------------------

    def _normalize_udfs(self, udf):
        if isinstance(udf, UDF):
            return [udf], True
        udfs = list(udf)
        if not udfs:
            # reference api.py run_udf contract (test_context)
            raise ValueError("empty list of UDFs - nothing to do!")
        return udfs, False

    def _normalize_roi(self, roi, dataset):
        """Accept bool ndarray (nav or flat), sparse-like, or
        coordinate forms, matching the reference (api.py roi docs +
        common/sparse.py:20 to_sparse):

        * an all-int tuple ``(y, x)`` — a SINGLE selected coordinate
        * an iterable of ``(coord, value)`` pairs with one uniform
          truth value; ``value=False`` selects everything EXCEPT the
          given coordinates (inverse fill)
        * (extension) a bare iterable of coordinate tuples, all True
        """
        if roi is None:
            return None
        if hasattr(roi, "toarray"):  # scipy.sparse mask
            roi = np.asarray(roi.toarray())
        elif hasattr(roi, "todense"):  # sparse.pydata COO
            roi = np.asarray(roi.todense())
        if isinstance(roi, np.ndarray):
            if roi.dtype is not np.dtype(bool):
                import warnings
                warnings.warn(
                    f"ROI dtype is {roi.dtype}, expected bool. "
                    "Attempting cast to bool."
                )
            return roi.astype(bool).reshape(-1)
        nav_shape = tuple(dataset.shape.nav)
        entries = list(roi)
        if not entries:
            # an empty coordinate iterable selects NOTHING — the
            # all-ints check below would vacuously match and the ()
            # coordinate would fill the whole mask
            return np.zeros(int(np.prod(nav_shape)), dtype=bool)
        if all(
            isinstance(e, (int, np.integer)) for e in entries
        ):
            # one coordinate (True is an int too, as in the
            # reference's all-ints check)
            entries = [(tuple(entries), True)]
        else:
            norm = []
            for e in entries:
                e = tuple(e)
                if len(e) == 2 and isinstance(
                    e[-1], (bool, np.bool_)
                ):
                    coord = e[0]
                    if isinstance(coord, (int, np.integer)):
                        coord = (coord,)
                    norm.append((tuple(coord), bool(e[1])))
                else:
                    norm.append((e, True))
            entries = norm
        values = {v for _, v in entries}
        if len(values) > 1:
            raise ValueError(
                "cannot cast iterable roi coords with more than "
                f"one truth value {values}"
            )
        val = values.pop() if values else True
        mask = np.full(nav_shape, not val, dtype=bool)
        for coord, v in entries:
            mask[coord] = v
        return mask.reshape(-1)

    def _wrap(self, results: UDFResults, single: bool):
        if single:
            return SingleUDFResults(results.buffers[0], results.damage)
        return [
            SingleUDFResults(b, results.damage) for b in results.buffers
        ]

    def _prepare_plots(self, plots, dataset, udfs, roi):
        """Normalize the ``plots=`` argument (reference api.py:1477):
        True -> one default live plot per UDF; a list of channel-name
        lists -> plots for those channels; Live2DPlot instances pass
        through."""
        if not plots:
            return None
        import warnings

        from .viz.base import Live2DPlot
        prepared = []
        chan_lists = (
            isinstance(plots, (list, tuple))
            and all(isinstance(p, (list, tuple)) for p in plots)
            and all(
                all(isinstance(pp, (str, list, tuple)) for pp in p)
                for p in plots
            )
        )
        if plots is True or chan_lists:
            # dry run yields the declared buffer set per UDF, used
            # both for the default channel choice and for validating
            # requested channel names (reference api.py:1477)
            dry = UDFRunner(udfs).dry_run(dataset, roi)
            if plots is True:
                channels = []
                for idx, udf in enumerate(udfs):
                    chans = [
                        k
                        for k, buf in dry.buffers[idx].items()
                        if buf.data is not None
                        and len(np.squeeze(buf.data).shape) == 2
                    ]
                    if not chans:
                        warnings.warn(
                            f"No plottable channels found for UDF "
                            f"#{idx}: {type(udf).__name__}, "
                            f"not plotting."
                        )
                    channels.append(chans)
            else:
                channels = plots
                for idx, udf_channels in enumerate(channels):
                    for ch in udf_channels:
                        name = (
                            ch[0]
                            if isinstance(ch, (list, tuple)) else ch
                        )
                        if name not in dry.buffers[idx]:
                            raise ValueError(
                                f"channel {name} not found, have: "
                                f"{list(dry.buffers[idx].keys())}"
                            )
            from .udf.base import UDFResults
            for idx, (udf, udf_channels) in enumerate(
                zip(udfs, channels)
            ):
                for channel in udf_channels:
                    if isinstance(channel, list):
                        channel = tuple(channel)
                    p = self.plot_class(
                        dataset, udf, roi=roi, channel=channel,
                        # reuse the dry run instead of re-running it
                        # per plot (reference api.py:1513)
                        udfresult=UDFResults(
                            (dry.buffers[idx],), dry.damage
                        ),
                    )
                    p.display()
                    prepared.append(p)
            return prepared or None
        for p in plots:
            # duck-typed: anything with new_data()/get_udf() plots
            # (the reference accepts arbitrary plot objects, and its
            # own tests drive Mocks through this path)
            if isinstance(p, Live2DPlot) or hasattr(p, "new_data"):
                prepared.append(p)
        return prepared or None

    def _update_plots(self, plots, results, udfs, final=False):
        damage = np.asarray(results.damage.data)
        for p in plots:
            get_udf = getattr(p, "get_udf", None)
            udf = get_udf() if get_udf is not None else getattr(
                p, "udf", None
            )
            try:
                idx = udfs.index(udf)
            except ValueError:
                idx = 0
            p.new_data(results.buffers[idx], damage, force=final)

    def close(self):
        if self.snooze_manager is not None:
            self.snooze_manager.close()
        self.executor.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
