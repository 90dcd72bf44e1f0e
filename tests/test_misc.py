import json

import numpy as np
import pytest

from libertem_tpu.api import Context
from libertem_tpu.io.dataset.memory import MemoryDataSet
from libertem_tpu.udf import StdDevUDF, SumSigUDF, SumUDF

from conftest import _mk_random


@pytest.fixture
def ds():
    return MemoryDataSet(
        data=_mk_random((6, 6, 10, 10), dtype="float32"),
        sig_dims=2, num_partitions=2,
    ).initialize()


def test_make_with_specs():
    for spec in ("inline", "synchronous", "threads", "concurrent"):
        ctx = Context.make_with(spec)
        assert len(ctx.executor.devices) == 1
    for spec in ("sharded", "dask", "pipelined", "tpu"):
        ctx = Context.make_with(spec)
        assert len(ctx.executor.devices) >= 1
    from libertem_tpu.common.exceptions import ExecutorSpecException
    with pytest.raises(ExecutorSpecException):
        Context.make_with("bogus")


def test_executor_compat_names():
    from libertem_tpu.executor import (
        ConcurrentJobExecutor, DaskJobExecutor, PipelinedExecutor,
    )
    assert ConcurrentJobExecutor().devices
    assert DaskJobExecutor().devices
    assert PipelinedExecutor().devices


def test_inspect_and_display(lt_ctx, ds):
    res = lt_ctx.inspect_udf(SumUDF(), ds)
    assert "intensity" in res
    assert res["intensity"].kind == "sig"
    disp = lt_ctx.display(ds, SumSigUDF())
    text = str(disp)
    assert "intensity" in text and "nav" in text
    assert "intensity" in disp._repr_html_()


def test_run_udf_async_via_loop(lt_ctx, ds):
    import asyncio
    res = asyncio.run(lt_ctx.run_udf_async(ds, SumUDF()))
    assert res["intensity"].data.shape == (10, 10)


def test_merge_all(ds):
    from libertem_tpu.udf.base import UDFData
    udf = StdDevUDF()
    parts = []
    rng = np.random.default_rng(0)
    chunks = [rng.normal(size=(5, 4, 4)) for _ in range(3)]
    for c in chunks:
        parts.append(UDFData({
            "num_frames": np.float32(c.shape[0]),
            "sum": c.sum(axis=0).astype(np.float32),
            "varsum": (
                (c - c.mean(axis=0)) ** 2
            ).sum(axis=0).astype(np.float32),
        }))
    merged = udf.merge_all(parts)
    allc = np.concatenate(chunks, axis=0)
    assert np.allclose(merged["sum"], allc.sum(axis=0), rtol=1e-4)
    assert np.allclose(
        merged["varsum"],
        ((allc - allc.mean(axis=0)) ** 2).sum(axis=0),
        rtol=1e-3,
    )


def test_message_converter():
    from libertem_tpu.common.messageconverter import (
        MessageConverter, ValidationError,
    )

    class Conv(MessageConverter):
        SCHEMA = {
            "type": "object",
            "properties": {
                "type": {"const": "RAW"},
                "nav_shape": {
                    "type": "array",
                    "items": {"type": "number", "minimum": 1},
                    "minItems": 2, "maxItems": 2,
                },
            },
            "required": ["type"],
        }

    conv = Conv()
    assert conv.to_python(
        {"type": "RAW", "nav_shape": [4, 5]}
    )["type"] == "RAW"
    with pytest.raises(ValidationError):
        conv.to_python({"type": "MIB"})
    with pytest.raises(ValidationError):
        conv.to_python({"type": "RAW", "nav_shape": [4]})


def test_notebook_generator():
    from libertem_tpu.web.notebook_generator import (
        notebook_for, notebook_to_bytes,
    )
    nb = notebook_for(
        "raw",
        {"path": "/data/x.raw", "dtype": "uint16",
         "nav_shape": (32, 32), "sig_shape": (128, 128)},
        [
            {"analysisType": "APPLY_DISK_MASK",
             "parameters": {"cx": 64, "cy": 64, "r": 32}},
            {"analysisType": "CENTER_OF_MASS",
             "parameters": {"cx": 64, "cy": 64, "r": 32}},
        ],
    )
    raw = notebook_to_bytes(nb)
    parsed = json.loads(raw)
    assert parsed["nbformat"] == 4
    src = "".join(
        "".join(c["source"]) for c in parsed["cells"]
    )
    assert "create_disk_analysis" in src
    assert "create_com_analysis" in src
    assert 'ctx.load("raw"' in src


def test_progress_and_snooze(lt_ctx, ds, capsys):
    # progress smoke test
    res = lt_ctx.run_udf(ds, SumUDF(), progress=True)
    assert res["intensity"].data is not None
    # snooze manager triggers down/up callbacks
    import time

    from libertem_tpu.common.snooze import SnoozeManager
    events = []
    m = SnoozeManager(
        up=lambda: events.append("up"),
        down=lambda: events.append("down"),
        timeout=0.01,
    )
    time.sleep(0.1)
    m._check()
    assert "down" in events
    m.touch()
    assert "up" in events
    m.close()


def test_utils_devices_generate():
    from libertem_tpu.utils.devices import detect
    from libertem_tpu.utils.generate import (
        cbed_frame, exclude_pixels, gradient_data, hologram_frame,
    )
    d = detect()
    assert len(d["cpus"]) >= 1
    frame, indices, peaks = cbed_frame(fy=64, fx=64, radius=3)
    # reference contract: a 1-frame stack
    assert frame.shape == (1, 64, 64)
    assert frame.max() > 0
    holo = hologram_frame(
        np.ones((32, 32)), np.zeros((32, 32))
    )
    assert holo.shape == (32, 32)
    g = gradient_data((4, 4), (8, 8))
    assert g.shape == (4, 4, 8, 8)
    ex = exclude_pixels((16, 16), 5)
    assert ex.shape[1] == 5


def test_parity_modules():
    from libertem_tpu.common.scheduler import Scheduler
    from libertem_tpu.common.sparse import (
        is_sparse, to_dense, to_sparse,
    )
    from libertem_tpu.common.backend import (
        get_pinned_device, set_use_device, get_use_device,
    )
    from libertem_tpu.common.threading import (
        set_num_threads, set_num_threads_env,
    )
    from libertem_tpu.executor.inline import InlineJobExecutor
    import scipy.sparse as sp

    ex = InlineJobExecutor()
    sched = Scheduler(ex.get_available_workers())
    assert sched.effective_worker_count() >= 1

    class FakeTask:
        def get_resources(self):
            return {"compute": 1}

    assert len(sched.workers_for_task(FakeTask())) >= 1

    m = sp.csr_matrix(np.eye(4, dtype=np.float32))
    assert is_sparse(m)
    assert not is_sparse(np.eye(4))
    assert np.allclose(to_dense(m), np.eye(4))
    assert is_sparse(to_sparse(np.eye(4)))

    set_use_device(0)
    assert get_use_device() == 0

    with set_num_threads(1):
        pass
    with set_num_threads_env(1):
        import os
        assert os.environ["OMP_NUM_THREADS"] == "1"


def test_preload(monkeypatch):
    from libertem_tpu.preload import do_preloads
    monkeypatch.setenv("LIBERTEM_TPU_PRELOAD", "json;nonexistent_xyz")
    do_preloads()  # imports json, warns about the other


def test_update_parameters_experimental(lt_ctx):
    """Mid-run parameter patching: swap the mask between partitions
    and observe later partitions using the new mask."""
    from libertem_tpu.udf import ApplyMasksUDF
    data = np.ones((8, 4, 8, 8), dtype=np.float32)
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=4
    ).initialize()
    m1 = np.ones((8, 8), dtype=np.float32)
    m2 = 2 * np.ones((8, 8), dtype=np.float32)
    udf = ApplyMasksUDF(mask_factories=[lambda: m1])
    gen = lt_ctx.run_udf_iter(ds, udf)
    partials = []
    for i, res in enumerate(gen):
        partials.append(res)
        if i == 1:
            gen.update_parameters_experimental([
                {"mask_factories": [lambda: m2]},
            ])
    final = partials[-1].buffers[0]["intensity"].data.reshape(-1)
    # first two partitions (16 frames) used m1 (sum=64), later m2
    assert np.allclose(final[:16], 64.0)
    assert np.allclose(final[16:], 128.0)


def test_plots_dummy(lt_ctx):
    from libertem_tpu.viz.base import Dummy2DPlot
    data = _mk_random((4, 4, 8, 8), dtype="float32")
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=2
    ).initialize()
    udf = SumSigUDF()
    plot = Dummy2DPlot(ds, udf, min_delta=0.0)
    res = lt_ctx.run_udf(ds, udf, plots=[plot])
    assert plot.data is not None
    assert np.allclose(
        np.nan_to_num(plot.data), data.sum(axis=(2, 3)), rtol=1e-4
    )


def test_plots_mpl(lt_ctx):
    import matplotlib
    matplotlib.use("Agg")
    data = _mk_random((4, 4, 8, 8), dtype="float32")
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=2
    ).initialize()
    res = lt_ctx.run_udf(ds, SumSigUDF(), plots=True)
    assert res["intensity"].data.shape == (4, 4)


def test_dtype_matrix(lt_ctx):
    for dtype in ("uint8", "int32", "float32", "uint16"):
        data = _mk_random((4, 4, 8, 8), dtype=dtype)
        ds = MemoryDataSet(
            data=data, sig_dims=2, num_partitions=2
        ).initialize()
        res = lt_ctx.run_udf(ds, SumUDF())
        assert np.allclose(
            res["intensity"].data,
            data.astype(np.float64).sum(axis=(0, 1)),
            rtol=1e-4,
        )


def test_complex_input(lt_ctx):
    data = _mk_random((4, 4, 8, 8), dtype="complex64")
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=2
    ).initialize()
    res = lt_ctx.run_udf(ds, SumUDF())
    assert np.allclose(
        res["intensity"].data, data.sum(axis=(0, 1)),
        rtol=1e-3, atol=1e-3,
    )


def test_mixin_markers():
    from libertem_tpu.udf.base import (
        UDF, UDFFrameMixin, UDFTileMixin, UDFPartitionMixin,
    )

    class MyUDF(UDFTileMixin, UDF):
        def get_result_buffers(self):
            return {}

        def process_tile(self, tile):
            pass

    assert MyUDF().get_method() == "tile"


def test_bench_smoke(monkeypatch):
    """bench.py machinery runs end-to-end on small shapes (CPU)."""
    import bench as bench_mod
    monkeypatch.setattr(bench_mod, "NAV", (8, 8))
    monkeypatch.setattr(bench_mod, "SIG", (32, 32))
    rng = np.random.default_rng(0)
    data = rng.normal(
        size=(8, 8, 32, 32)
    ).astype(np.float32)
    bps, roof_bps = bench_mod.bench_tpu(data, repeats=1)
    assert bps > 0 and roof_bps > 0
    cpu = bench_mod.bench_cpu_baseline(data)
    assert cpu > 0


def test_progress_reporter_object(lt_ctx, ds):
    from libertem_tpu.common.progress import ProgressReporter

    events = []

    class Rec(ProgressReporter):
        def start(self, state):
            events.append(("start", state.num_frames_total))

        def update(self, state):
            events.append(("update", state.num_frames_complete))

        def end(self, state):
            events.append(("end", state.num_frames_complete))

    res = lt_ctx.run_udf(ds, SumUDF(), progress=Rec())
    assert events[0][0] == "start"
    assert events[-1] == ("end", 36)


def test_scipy_sparse_roi(lt_ctx, ds):
    import scipy.sparse as sp
    mask = np.zeros((6, 6), dtype=bool)
    mask[1, 2] = mask[4, 4] = True
    roi = sp.coo_matrix(mask)
    res = lt_ctx.run_udf(ds, SumUDF(), roi=roi)
    assert res.damage.raw_data.shape == (2,)


def test_roi_coordinate_forms(lt_ctx, ds):
    """Reference roi coordinate forms (api.py roi docs +
    common/sparse.py:20 to_sparse): a single all-int coordinate
    tuple, (coord, value) pairs, inverse fill with value=False, and
    mixed truth values rejected."""
    from libertem_tpu.udf import SumSigUDF

    def flat(res):
        return np.asarray(res["intensity"].data).reshape(-1)

    # single coordinate
    r = flat(lt_ctx.run_udf(ds, SumSigUDF(), roi=(1, 2)))
    assert not np.isnan(r[1 * 6 + 2])
    assert np.isnan(r[0])
    # (coord, value) pairs
    r = flat(lt_ctx.run_udf(
        ds, SumSigUDF(), roi=(((1, 2), True), ((4, 4), True))
    ))
    assert not np.isnan(r[4 * 6 + 4])
    assert np.isnan(r[3])
    # inverse fill: everything except (0, 0)
    r = flat(lt_ctx.run_udf(ds, SumSigUDF(), roi=(((0, 0), False),)))
    assert np.isnan(r[0])
    assert not np.isnan(r[1])
    assert not np.isnan(r[35])
    # bare coordinate list (extension)
    r = flat(lt_ctx.run_udf(ds, SumSigUDF(), roi=[(2, 3), (5, 5)]))
    assert not np.isnan(r[2 * 6 + 3])
    assert np.isnan(r[4])
    with pytest.raises(ValueError, match="truth value"):
        lt_ctx.run_udf(
            ds, SumSigUDF(), roi=(((0, 0), True), ((1, 1), False))
        )


def test_debug_executor_pickle_safety(ds):
    """InlineJobExecutor(debug=True) forces a pickle round-trip of the
    UDFs every run (reference: debug executors, udf/base.py:2325) —
    unpicklable parameters fail fast with a clear error."""
    import threading

    import pytest

    from libertem_tpu.api import Context
    from libertem_tpu.executor.inline import InlineJobExecutor
    from libertem_tpu.udf import SumUDF
    from libertem_tpu.udf.base import UDF, UDFException

    ctx = Context(executor=InlineJobExecutor(debug=True))
    # a picklable UDF passes
    res = ctx.run_udf(ds, SumUDF())
    assert res["intensity"].data is not None

    class Unpicklable(UDF):
        def __init__(self, **kwargs):
            kwargs.setdefault("lock", threading.Lock())
            super().__init__(**kwargs)

        def get_result_buffers(self):
            return {"x": self.buffer(kind="nav", dtype="float32")}

        def process_tile(self, tile):
            pass

    with pytest.raises(UDFException, match="pickle-safe"):
        ctx.run_udf(ds, Unpicklable())
    # without debug, the run is permitted (single-process semantics)
    ctx2 = Context(executor=InlineJobExecutor())
    ctx2.run_udf(ds, Unpicklable())


def test_notebook_generator_generic_fallback():
    """Unknown analysis ids still produce runnable registry-based
    notebook cells; the FFT family and CLUST have dedicated
    templates since round 3."""
    from libertem_tpu.web.notebook_generator import (
        notebook_for, notebook_to_bytes,
    )
    nb = notebook_for(
        "raw", {"path": "/x.raw", "dtype": "uint16",
                "nav_shape": (8, 8), "sig_shape": (16, 16)},
        [{"analysisType": "FFTSUM_FRAMES", "parameters": {}},
         {"analysisType": "CLUST",
          "parameters": {"n_clust": 4}},
         {"analysisType": "SOME_CUSTOM_ANALYSIS",
          "parameters": {"foo": 1}}],
    )
    src = "".join(
        "".join(c["source"]) for c in json.loads(
            notebook_to_bytes(nb)
        )["cells"]
    )
    assert "SumfftAnalysis" in src
    assert "ClusterAnalysis" in src
    assert "n_clust=4" in src
    assert "get_analysis_by_type('SOME_CUSTOM_ANALYSIS')" in src
    assert "no template" not in src


def test_generated_notebook_executes(tmp_path):
    """The reference runs generated notebooks under nbval
    (tests/template/): here every code cell of a generated notebook
    is exec'd in order against a real raw file."""
    import matplotlib
    matplotlib.use("Agg")
    from libertem_tpu.web.notebook_generator import notebook_for

    data = _mk_random((4, 4, 8, 8), dtype="uint16")
    path = str(tmp_path / "nb.raw")
    data.tofile(path)
    nb = notebook_for(
        "raw",
        {"path": path, "dtype": "uint16",
         "nav_shape": [4, 4], "sig_shape": [8, 8]},
        [
            {"analysisType": "SUM_FRAMES", "parameters": {}},
            {"analysisType": "APPLY_DISK_MASK",
             "parameters": {"cx": 4, "cy": 4, "r": 3}},
            {"analysisType": "CENTER_OF_MASS",
             "parameters": {"cx": 4, "cy": 4}},
            {"analysisType": "FFTSUM_FRAMES", "parameters": {}},
        ],
    )
    ns: dict = {}
    n_code = 0
    for cell in nb["cells"]:
        if cell["cell_type"] != "code":
            continue
        src = "".join(cell["source"])
        # notebooks default to the sharded executor; tests run inline
        src = src.replace('make_with("sharded")', 'make_with("inline")')
        exec(src, ns)  # noqa: S102 - that's the point of the test
        n_code += 1
    assert n_code >= 6
    # every analysis ran through its dedicated template
    assert "result" in ns


def test_run_udf_sync_false(lt_ctx, ds):
    """run_udf(sync=False) returns an awaitable (reference api.py:914
    sync parameter)."""
    import asyncio
    coro = lt_ctx.run_udf(ds, SumUDF(), sync=False)
    res = asyncio.run(coro)
    assert res["intensity"].data.shape == (10, 10)


def test_aux_param_patch_mid_run(lt_ctx):
    """Patching an aux-data parameter mid-run must rebuild the device
    aux arrays (regression: review finding — patched aux was silently
    ignored)."""
    from libertem_tpu.udf.base import UDF

    class WeightedSumSigUDF(UDF):
        def get_result_buffers(self):
            return {
                "ws": self.buffer(kind="nav", dtype="float32"),
            }

        def process_tile(self, tile):
            flat = tile.reshape(tile.shape[0], -1)
            self.results.ws += (
                flat.sum(axis=1) * self.params.weights
            )

        def merge(self, dest, src):
            pass

    data = np.ones((8, 4, 8, 8), dtype=np.float32)
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=4
    ).initialize()
    from libertem_tpu.udf.base import UDF as _UDF
    w1 = np.ones(32, dtype=np.float32)
    udf = WeightedSumSigUDF(
        weights=_UDF.aux_data(w1, kind="nav", dtype="float32")
    )
    gen = lt_ctx.run_udf_iter(ds, udf)
    partials = []
    for i, res in enumerate(gen):
        partials.append(res)
        if i == 0:
            w2 = 3 * np.ones(32, dtype=np.float32)
            gen.update_parameters_experimental([{
                "weights": _UDF.aux_data(
                    w2, kind="nav", dtype="float32"
                ),
            }])
    final = partials[-1].buffers[0]["ws"].data.reshape(-1)
    ratio = final / 64.0
    assert set(np.round(ratio, 3).tolist()) <= {1.0, 3.0}
    assert (ratio > 2).any(), "patched aux data never took effect"


def test_abandoned_iterator_releases_prefetch(lt_ctx, ds):
    """Dropping a partial-results iterator mid-run must not leave the
    prefetch worker blocked (regression: review finding)."""
    import threading

    before = {
        t.name for t in threading.enumerate()
    }
    gen = lt_ctx.run_udf_iter(ds, SumUDF())
    next(iter(gen))
    gen.close()
    del gen
    import gc as _gc
    import time as _time
    _gc.collect()
    deadline = _time.time() + 5.0
    while _time.time() < deadline:
        alive = {
            t.name for t in threading.enumerate()
        } - before
        if not any("Thread" in n or "worker" in n for n in alive):
            break
        _time.sleep(0.1)
    leaked = {
        t.name for t in threading.enumerate()
    } - before
    assert not any(
        n.startswith("Thread-") for n in leaked
    ), f"prefetch thread leaked: {leaked}"


def test_snooze_manager_wired_and_closeable():
    """Context(snooze_timeout=...) builds a real SnoozeManager;
    runs hold it awake; close() stops the timer chain for good."""
    import time as _time

    from libertem_tpu.common.snooze import SnoozeManager

    ctx = Context.make_with("inline", snooze_timeout=3600)
    assert ctx.snooze_manager is not None
    data = _mk_random((2, 2, 4, 4), dtype="float32")
    mds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=1
    ).initialize()
    ctx.run_udf(mds, SumUDF())
    assert not ctx.snooze_manager.is_snoozing
    ctx.close()
    assert ctx.snooze_manager._closed

    # down() fires after the timeout; up() on the next touch;
    # close() prevents any further scheduling
    calls = []
    mgr = SnoozeManager(
        up=lambda: calls.append("up"),
        down=lambda: calls.append("down"),
        timeout=1e-9,
    )
    # near-zero timeout -> first _check snoozes; invoke directly
    # rather than waiting for the timer
    mgr._check()
    assert calls == ["down"] and mgr.is_snoozing
    mgr.touch()
    assert calls == ["down", "up"] and not mgr.is_snoozing
    # a touch callback may re-enter the manager (no deadlock)
    mgr2 = SnoozeManager(
        up=lambda: mgr2.touch(), down=lambda: None, timeout=1e-9,
    )
    mgr2._check()
    t = _time.monotonic()
    mgr2.touch()
    assert _time.monotonic() - t < 1.0
    mgr.close(); mgr2.close()
    assert mgr._timer is None


def test_set_num_threads_passes_body_importerror():
    from libertem_tpu.common.threading import set_num_threads

    with pytest.raises(ImportError, match="definitely_missing"):
        with set_num_threads(2):
            import definitely_missing_module_xyz  # noqa: F401


def test_cbed_default_lattice_is_2d():
    from libertem_tpu.utils.generate import cbed_frame

    frame, indices, peaks = cbed_frame(fy=64, fx=64, radius=3)
    # both lattice directions present: peaks span 2 dimensions
    assert len(np.unique(peaks[:, 0])) > 1
    assert len(np.unique(peaks[:, 1])) > 1
    assert len(np.unique(peaks, axis=0)) == len(peaks)


def test_roi_empty_coordinate_list(lt_ctx, ds):
    """An empty coordinate iterable selects NOTHING (it used to
    vacuously match the all-ints check and select everything)."""
    res = lt_ctx.run_udf(ds, SumSigUDF(), roi=[])
    out = np.asarray(res["intensity"].data, dtype=np.float64)
    assert np.isnan(out).all()


def test_complex_safe_transfer_helpers():
    """Complex arrays cross the device boundary as real planes
    (some PJRT backends — the dev tunnel — reject complex
    transfers outright; see common/backend.py)."""
    import numpy as np
    from libertem_tpu.common.backend import (
        asarray_safe, device_put_safe, device_zeros_safe,
    )

    a = (np.arange(12, dtype=np.float32)
         + 1j * np.arange(12, dtype=np.float32)
         ).astype(np.complex64).reshape(3, 4)
    d = device_put_safe(a)
    assert d.dtype == np.complex64
    back = asarray_safe(d)
    assert back.dtype == np.complex64
    assert np.array_equal(back, a)
    # complex128 truncates to complex64 without x64 — same as
    # jnp.zeros under the default jax config
    z = device_zeros_safe((2, 5), np.complex64)
    zb = asarray_safe(z)
    assert zb.dtype == np.complex64 and not zb.any()
    # real dtypes pass straight through
    r = asarray_safe(device_put_safe(np.ones(3, np.float32)))
    assert r.dtype == np.float32 and (r == 1).all()
