"""Reference public-API parity surface (round-3 sweep): the
attributes/methods a reference user reaches for on DataSet,
BufferWrapper and UDFMeta, implemented with real behavior here
(reference: io/dataset/base/dataset.py, common/buffers.py,
udf/base.py UDFMeta)."""
import numpy as np
import pytest

from conftest import _mk_random

from libertem_tpu.common.buffers import BufferWrapper
from libertem_tpu.common.shape import Shape
from libertem_tpu.io.dataset.memory import MemoryDataSet
from libertem_tpu.udf import SumUDF
from libertem_tpu.udf.base import UDF, UDFRunner


@pytest.fixture
def ds():
    data = _mk_random((4, 4, 8, 8), dtype="float32")
    return MemoryDataSet(
        data=data, sig_dims=2, num_partitions=2
    ).initialize(), data


def test_dataset_roi_helper(ds):
    d, _ = ds
    roi = d.roi[1:3, :]
    assert roi.shape == (4, 4)
    assert roi.sum() == 8
    assert roi[1:3].all() and not roi[0].any() and not roi[3].any()


def test_dataset_diagnostics_and_partition_size(ds):
    d, _ = ds
    # the diagnostics property = format-specific get_diagnostics()
    # plus the six common rows (reference base/dataset.py:177-196)
    diag = d.diagnostics
    assert diag[:len(d.get_diagnostics())] == d.get_diagnostics()
    common = [row["name"] for row in diag[len(d.get_diagnostics()):]]
    assert common == [
        "Partition shape",
        "Number of partitions",
        "Number of frames skipped at the beginning",
        "Number of frames ignored at the end",
        "Number of blank frames inserted at the beginning",
        "Number of blank frames inserted at the end",
    ]
    assert isinstance(d.get_diagnostics(), list)
    assert d.MAX_PARTITION_SIZE == 512 * 1024 * 1024


def test_dataset_supports_correction(ds):
    d, _ = ds
    assert d.supports_correction() is True


def test_dataset_sync_offset_info(lt_ctx, tmp_path):
    data = _mk_random((12, 8, 8), dtype="float32")
    path = str(tmp_path / "t.raw")
    data.tofile(path)
    d = lt_ctx.load(
        "raw", path=path, dtype="float32",
        nav_shape=(2, 4), sig_shape=(8, 8), sync_offset=2,
    )
    info = d.get_sync_offset_info()
    # 12 stored, 8 used, offset +2: skip 2, ignore 12-8-2=2 at end
    assert info["frames_skipped_start"] == 2
    assert info["frames_ignored_end"] == 2
    assert info["frames_inserted_start"] == 0
    d2 = lt_ctx.load(
        "raw", path=path, dtype="float32",
        nav_shape=(2, 4), sig_shape=(8, 8), sync_offset=-3,
    )
    info2 = d2.get_sync_offset_info()
    assert info2["frames_inserted_start"] == 3
    assert info2["frames_skipped_start"] == 0


def test_buffer_masked_views():
    """raw_masked_data / valid_slice_bounding / get_valid_slice_inner
    (reference common/buffers.py:586-633)."""
    buf = BufferWrapper("nav", (), "float32")
    shape = Shape((4, 4, 8, 8), sig_dims=2)
    buf.set_shape_ds(shape)
    data = np.arange(16, dtype=np.float32)
    valid = np.zeros(16, dtype=bool)
    valid[2:9] = True  # rows (0,2)..(2,0) in the 4x4 nav
    buf.set_result(data, valid_nav_mask=valid)
    rm = buf.raw_masked_data
    assert isinstance(rm, np.ma.MaskedArray)
    assert rm.shape == (16,)
    assert rm.compressed().tolist() == list(range(2, 9))
    # nav-expanded bbox: valid rows span nav rows 0..2
    bb = buf.valid_slice_bounding
    assert bb == (slice(0, 3), slice(0, 4))
    # inner slice across axis 0: only nav row 1 is FULLY valid
    inner = buf.get_valid_slice_inner(axis=0)
    assert inner == (slice(1, 2), slice(None))
    assert buf.valid_mask[inner].all()


def test_meta_valid_nav_mask_in_get_results(ds):
    d, data = ds
    seen = {}

    class MaskProbe(UDF):
        def get_result_buffers(self):
            return {
                "s": self.buffer(kind="nav", dtype="float32"),
            }

        def process_frame(self, frame):
            self.results.s = frame.sum()

        def get_results(self):
            seen["mask"] = self.meta.get_valid_nav_mask()
            seen["full"] = self.meta.get_valid_nav_mask(full_nav=True)
            return {}

    roi = np.zeros((4, 4), dtype=bool)
    roi[0, :2] = True
    UDFRunner([MaskProbe()]).run_for_dataset(d, roi=roi)
    assert seen["mask"].shape == (2,)
    assert seen["mask"].all()
    assert seen["full"].shape == (16,)
    assert seen["full"].sum() == 2
    assert seen["full"][:2].all()


def test_meta_array_backend(ds):
    d, _ = ds
    seen = {}

    class DevProbe(UDF):
        def get_result_buffers(self):
            return {"s": self.buffer(kind="nav", dtype="float32")}

        def process_tile(self, tile):
            seen["dev"] = self.meta.array_backend
            self.results.s += tile.reshape(tile.shape[0], -1).sum(
                axis=1
            )

    class HostProbe(UDF):
        def get_backends(self):
            return (self.BACKEND_NUMPY,)

        def get_result_buffers(self):
            return {"s": self.buffer(kind="nav", dtype="float32")}

        def process_frame(self, frame):
            seen["host"] = self.meta.array_backend
            self.results.s = frame.sum()

    UDFRunner([DevProbe(), HostProbe()]).run_for_dataset(d)
    assert seen["dev"] == "jax"
    assert seen["host"] == "numpy"


def test_meta_slice_host_fallback_and_traced_guidance(ds):
    d, _ = ds

    seen = []

    class SliceProbe(UDF):
        def get_result_buffers(self):
            return {"s": self.buffer(kind="nav", dtype="float32")}

        def process_frame(self, frame):
            # concrete per-frame Slice via the auto host fallback
            # (reference UDFMeta.slice semantics)
            seen.append(tuple(self.meta.slice.origin))

    with pytest.warns(UserWarning, match="HOST engine"):
        UDFRunner([SliceProbe()]).run_for_dataset(d)
    n = d.shape.nav.size
    assert seen[:2] == [(0, 0, 0), (1, 0, 0)]
    assert len(seen) == n

    class TracedSliceProbe(UDF):
        def get_backends(self):
            return (self.BACKEND_JAX,)

        def get_result_buffers(self):
            return {"s": self.buffer(kind="nav", dtype="float32")}

        def process_frame(self, frame):
            _ = self.meta.slice  # must raise with guidance

    with pytest.raises(Exception, match="global_offset"):
        UDFRunner([TracedSliceProbe()]).run_for_dataset(d)


def test_requires_custom_merge_all():
    class SigAndNav(UDF):
        def get_result_buffers(self):
            return {
                "n": self.buffer(kind="nav", dtype="float32"),
                "s": self.buffer(
                    kind="sig", dtype="float32", use="result_only"
                ),
            }

    u = SigAndNav()
    decls = u.get_result_buffers()
    # the sig buffer is result_only: plain merge doesn't see it,
    # merge_all does (reference udf/base.py:1387 vs 1406)
    assert not u.requires_custom_merge(decls)
    assert u.requires_custom_merge_all(decls)


def test_masks_balance_and_sparse_circular():
    from libertem_tpu import masks as m
    t = np.array([[2.0, -1.0], [2.0, -3.0]])
    b = m.balance(t)
    assert abs(b.sum()) < 1e-12
    assert (b[t > 0] == t[t > 0]).all()

    stack = m.sparse_circular_multi_stack(
        mask_index=[0, 1], centerX=[4, 10], centerY=[6, 6],
        imageSizeX=16, imageSizeY=12, radius=3,
    )
    assert stack.shape == (2, 12, 16)
    full0 = m.circular(4, 6, 16, 12, 3)
    full1 = m.circular(10, 6, 16, 12, 3)
    assert np.allclose(stack[0], full0)
    assert np.allclose(stack[1], full1)


def test_com_helper_api():
    from libertem_tpu.udf import com

    img_sum = np.array([[2.0, 0.0], [1.0, 4.0]])
    img_y = np.array([[6.0, 5.0], [2.0, 4.0]])
    img_x = np.array([[2.0, 5.0], [3.0, 8.0]])
    sy, sx = com.center_shifts(img_sum, img_y, img_x, 1.0, 1.0)
    assert sy[0, 0] == 2.0 and sx[0, 0] == 0.0
    assert sy[0, 1] == 0.0 and sx[0, 1] == 0.0  # zero-sum -> ref

    rng = np.random.default_rng(0)
    y = rng.random((6, 6))
    x = rng.random((6, 6))
    fy, fx = com.apply_correction(y, x, 37.0, True)
    by, bx = com.apply_correction(fy, fx, 37.0, True, forward=False)
    assert np.allclose(by, y) and np.allclose(bx, x)

    # divergence of field (y, x) = (i, j) is 2; curl is 0
    i, j = np.mgrid[0:6, 0:6].astype(np.float64)
    assert np.allclose(com.divergence(i, j), 2.0)
    assert np.allclose(com.curl_2d(i, j), 0.0)
    assert np.allclose(com.magnitude(3.0 * i, 4.0 * i), 5.0 * i)

    straight, flipped = com.coordinate_check(i, j)
    assert straight.shape == (360,) and flipped.shape == (360,)
    # the uncorrected field is curl-free -> rotation 0 is a minimum
    assert straight[0] <= straight.min() + 1e-12

    # factory triple matches the direct stack builder
    fs = com.com_masks_factory(12, 16, cy=6, cx=8, r=4)
    stack = com.com_masks((12, 16), cy=6, cx=8, r=4)
    assert np.allclose(fs[0](), stack[0])
    assert np.allclose(fs[1](), stack[1])
    assert np.allclose(fs[2](), stack[2])

    g = com.GuessResult(scan_rotation=10.0, flip_y=False,
                        cy=1.0, cx=2.0)
    assert g.scan_rotation == g["scan_rotation"] == 10.0
    import json
    assert json.loads(json.dumps(dict(g))) == dict(g)
    # reference NamedTuple order: positional unpack works
    rot, flip, cy, cx = g
    assert (rot, flip, cy, cx) == (g.scan_rotation, g.flip_y, g.cy, g.cx)


def test_slice_usage_error():
    from libertem_tpu.common.shape import Shape
    from libertem_tpu.common.slice import Slice, SliceUsageError

    with pytest.raises(SliceUsageError):
        Slice((0, 0), Shape((4, 4, 4), sig_dims=2))
    assert issubclass(SliceUsageError, ValueError)


def test_math_ndenumerate():
    from libertem_tpu.common.math import ndenumerate
    arr = np.arange(4).reshape(2, 2)
    assert dict(ndenumerate(arr)) == {
        (0, 0): 0, (0, 1): 1, (1, 0): 2, (1, 1): 3,
    }


def test_devices_api():
    from libertem_tpu.utils.devices import detect, has_cupy
    assert has_cupy() is False
    d = detect()
    for k in ("cpus", "cudas", "has_cupy", "tpus"):
        assert k in d


def test_viz_channels_and_colormap(ds):
    d, data = ds
    from libertem_tpu import viz
    from libertem_tpu.viz.base import (
        get_plottable_2D_channels, make_colormap,
    )
    from libertem_tpu.udf.base import UDFRunner

    res = UDFRunner([SumUDF()]).run_for_dataset(d)
    bufs = res.buffers[0]
    assert get_plottable_2D_channels(bufs) == ["intensity"]
    cmap = make_colormap()
    assert cmap.name == "libertem_cyclic"
    # lazy module attribute (reference exposes a module-level value)
    from libertem_tpu.viz import base as viz_base
    assert viz_base.libertem_cyclic(0.5) is not None


def test_context_signature_parity(lt_ctx, tmp_path):
    """Round-3 signature sweep: kwargs a reference user passes to
    Context methods (reference api.py) must be accepted with real
    behavior."""
    import asyncio

    from libertem_tpu.io.corrections import CorrectionSet
    from libertem_tpu.viz import Dummy2DPlot

    data = _mk_random((2, 3, 8, 8), dtype="float32")
    d = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=2
    ).initialize()

    # export_dataset: refuses to clobber unless overwrite=True
    out = str(tmp_path / "exp.npy")
    lt_ctx.export_dataset(d, path=out)
    with pytest.raises(FileExistsError, match="overwrite"):
        lt_ctx.export_dataset(d, path=out)
    lt_ctx.export_dataset(d, path=out, overwrite=True)
    # the npy header carries the FULL nav dims (reference record.py:49)
    assert np.allclose(np.load(out), data)
    with pytest.raises(ValueError, match="npy"):
        lt_ctx.export_dataset(d, path=str(tmp_path / "exp.tiff"))

    # map / run with corrections=
    dark = np.full((8, 8), 1.0, dtype=np.float32)
    corr = CorrectionSet(dark=dark)
    m = lt_ctx.map(
        d, lambda frame: frame.sum(), corrections=corr
    )
    exp = (data.reshape(-1, 8, 8) - 1.0).sum(axis=(1, 2))
    assert np.allclose(
        np.asarray(m.data).reshape(-1), exp, rtol=1e-4
    )
    an = lt_ctx.create_sum_analysis(dataset=d)
    res = lt_ctx.run(an, corrections=corr)
    assert np.allclose(
        res["intensity"].raw_data,
        (data.reshape(-1, 8, 8) - 1.0).sum(axis=0), rtol=1e-4,
    )

    # run_udf_iter with plots= and sync=False
    plot = Dummy2DPlot(dataset=d, udf=SumUDF())
    seen = []
    gen = lt_ctx.run_udf_iter(d, plot.udf, plots=[plot])
    for part in gen:
        seen.append(part)
    assert len(seen) >= 1
    assert plot.data is not None

    async def drive():
        out = []
        agen = lt_ctx.run_udf_iter(d, SumUDF(), sync=False)
        async for part in agen:
            out.append(part)
        return out

    parts = asyncio.run(drive())
    assert len(parts) >= 1

    # create_pick_analysis accepts z for 3D nav
    d3 = MemoryDataSet(
        data=_mk_random((2, 2, 3, 8, 8), dtype="float32"),
        sig_dims=2, num_partitions=2,
    ).initialize()
    pa = lt_ctx.create_pick_analysis(d3, x=2, y=1, z=1)
    r = lt_ctx.run(pa)
    assert r["intensity"].raw_data.shape == (8, 8)

    # radial fourier accepts use_sparse
    rf = lt_ctx.create_radial_fourier_analysis(
        dataset=d, use_sparse=False
    )
    lt_ctx.run(rf)


def test_udf_signature_parity(ds):
    """ApplyMasksUDF reference kwargs and UDFRunner
    progress_reporter= (reference udf/masks.py:255, udf/base.py
    UDFRunner)."""
    d, data = ds
    from libertem_tpu.common.progress import ProgressReporter
    from libertem_tpu.udf import ApplyMasksUDF
    from libertem_tpu import masks as m

    mf = [lambda: m.circular(4, 4, 8, 8, 3)]
    udf = ApplyMasksUDF(
        mask_factories=mf, use_torch=False,
        preferred_dtype=np.float64, backends=("jax",),
    )
    assert udf.get_preferred_input_dtype() == np.float64
    res = UDFRunner([udf]).run_for_dataset(d)
    expected = (
        data.reshape(-1, 64).astype(np.float64)
        @ m.circular(4, 4, 8, 8, 3).reshape(64).astype(np.float64)
    )
    assert np.allclose(
        np.asarray(res.buffers[0]["intensity"].data).reshape(-1),
        expected, rtol=1e-5,
    )
    # backends= IS the declared set (reference udf/masks.py:371);
    # a cupy-only declaration maps to the device path (the TPU is
    # this framework's accelerator) and still computes correctly
    cupy_only = ApplyMasksUDF(mask_factories=mf, backends=("cupy",))
    res2 = UDFRunner([cupy_only]).run_for_dataset(d)
    got = np.asarray(
        res2.buffers[0]["intensity"].data
    ).reshape(-1)
    assert np.allclose(got, expected, rtol=1e-4)
    # an unknown backend name errors loudly at construction
    with pytest.raises(ValueError, match="unknown backends"):
        ApplyMasksUDF(
            mask_factories=mf, backends=("BACKEND_DOES_NOT_EXIST",)
        )

    calls = {"start": 0, "update": 0, "end": 0}

    class Rep(ProgressReporter):
        def start(self, state):
            calls["start"] += 1

        def update(self, state):
            calls["update"] += 1

        def end(self, state):
            calls["end"] += 1

    runner = UDFRunner(
        [SumUDF()], progress_reporter=Rep()
    )
    runner.run_for_dataset(d, progress=True)
    assert calls["start"] == 1 and calls["end"] == 1


def test_backend_constants_parity(ds):
    """Reference BACKEND_* constants exist and route sanely: sparse
    spellings run on the host engine, cupy-only maps to the device
    path, unknown-only errors (reference common/udf.py:43)."""
    d, data = ds
    assert UDF.BACKEND_CUPY == "cupy"
    assert UDF.BACKEND_SPARSE_COO in UDF.BACKEND_ALL
    seen = {}

    class SparseDecl(UDF):
        def get_backends(self):
            # a reference UDF written against sparse tiles
            return (self.BACKEND_SCIPY_CSR, self.BACKEND_NUMPY)

        def get_result_buffers(self):
            return {"s": self.buffer(kind="nav", dtype="float32")}

        def process_frame(self, frame):
            seen["type"] = type(frame).__name__
            self.results.s = frame.sum()

    res = UDFRunner([SparseDecl()]).run_for_dataset(d)
    # host engine, tiles CONVERTED to the first declared backend
    # (reference TileConverter semantics, udf/base.py:2189)
    assert seen["type"] == "csr_matrix"
    assert np.allclose(
        np.asarray(res.buffers[0]["s"].data).reshape(-1),
        data.reshape(16, -1).sum(axis=1), rtol=1e-5,
    )

    class CupyOnly(UDF):
        def get_backends(self):
            return (self.BACKEND_CUPY,)

        def get_result_buffers(self):
            return {"s": self.buffer(kind="nav", dtype="float32")}

        def process_frame(self, frame):
            # device path: xp is jnp
            self.results.s = self.xp.sum(frame)

    r2 = UDFRunner([CupyOnly()]).run_for_dataset(d)
    assert np.allclose(
        r2.buffers[0]["s"].data.reshape(-1),
        data.reshape(16, -1).sum(axis=1), rtol=1e-5,
    )

    class Unknowable(UDF):
        def get_backends(self):
            return ("tensorflow",)

        def get_result_buffers(self):
            return {"s": self.buffer(kind="nav", dtype="float32")}

        def process_frame(self, frame):
            pass

    from libertem_tpu.udf.base import UDFException
    with pytest.raises(UDFException, match="backends"):
        UDFRunner([Unknowable()]).run_for_dataset(d)


def test_slice_shift_clip_to():
    from libertem_tpu.common.shape import Shape
    from libertem_tpu.common.slice import Slice

    a = Slice((4, 0, 0), Shape((4, 8, 8), sig_dims=2))
    b = Slice((2, 0, 0), Shape((8, 8, 8), sig_dims=2))
    # shift: origin relative to other's (reference slice.py:116)
    s = a.shift(b)
    assert s.origin == (2, 0, 0) and tuple(s.shape) == (4, 8, 8)
    # clip_to: intersect with a zero-origin shape (slice.py:397)
    c = a.clip_to(Shape((6, 8, 8), sig_dims=2))
    assert c.origin == (4, 0, 0) and tuple(c.shape) == (2, 8, 8)


def test_executor_utility_api(ds):
    """Reference executor utility surface with real behavior
    (common/executor.py:185-432)."""
    d, data = ds
    from libertem_tpu.executor.inline import InlineJobExecutor
    from libertem_tpu.api import Context

    ex = InlineJobExecutor()
    assert ex.run_process_local(lambda a, b: a + b, (1, 2)) == 3
    assert ex.run_each_host(lambda: 42) == {"localhost": 42}
    parts = list(d.get_partitions())
    got = list(ex.run_each_partition(parts, lambda p: p.num_frames))
    assert sum(got) == 16

    with ex.scatter({"x": 1}) as handle:
        assert handle.get() == {"x": 1}
        ex.scatter_update(handle, {"x": 2})
        assert handle.get() == {"x": 2}

        class Patchable:
            def __init__(self):
                self.v = 0

            def patch(self, p):
                self.v = p

        with ex.scatter(Patchable()) as h2:
            ex.scatter_update_patch(h2, 7)
            assert h2.get().v == 7

    assert ex.modify_buffer_type("b") == "b"
    from libertem_tpu.udf.base import UDFRunner
    assert ex.get_udf_runner() is UDFRunner

    # subscriptions: Context.run_udf emits start/end events
    events = []
    key = ex.subscribe(
        "run_udf:start", lambda topic, msg: events.append((topic, msg))
    )
    ctx = Context(executor=ex)
    assert ex.snooze_manager is None  # no timeout configured
    ctx.run_udf(d, SumUDF())
    assert len(events) == 1
    assert events[0][1]["udfs"] == ["SumUDF"]
    assert ex.unsubscribe(key)
    ctx.run_udf(d, SumUDF())
    assert len(events) == 1  # unsubscribed


def test_backends_scoped_per_run(ds):
    """backends= is a PER-RUN restriction: it must not stick to the
    UDF instance, and it must reach the async paths (round-3 review
    findings)."""
    import asyncio

    from libertem_tpu.api import Context
    from libertem_tpu.executor.inline import InlineJobExecutor

    ctx = Context(executor=InlineJobExecutor())
    d, data = ds
    seen = []

    class Probe(UDF):
        def get_backends(self):
            return (self.BACKEND_JAX, self.BACKEND_NUMPY)

        def get_result_buffers(self):
            return {"s": self.buffer(kind="nav", dtype="float32")}

        def process_frame(self, frame):
            seen.append(self.meta.array_backend)
            self.results.s = frame.sum()

    u = Probe()
    ctx.run_udf(d, u, backends=("numpy",))
    assert seen[-1] == "numpy"
    seen.clear()
    ctx.run_udf(d, u)  # no restriction: back on the device path
    assert seen[-1] == "jax"
    seen.clear()
    # async path honors backends too
    asyncio.run(ctx.run_udf_async(d, u, backends=("numpy",)))
    assert seen[-1] == "numpy"
    seen.clear()

    async def drive():
        async for _ in ctx.run_udf_iter(
            d, u, backends=("numpy",), sync=False
        ):
            pass

    asyncio.run(drive())
    assert seen[-1] == "numpy"


def test_run_events_on_iter_and_balance_and_guess():
    """run_udf_iter emits start/end events; balance() handles int
    templates; GuessResult follows the attribute protocol (round-3
    review findings)."""
    import copy

    from libertem_tpu import masks as m
    from libertem_tpu.api import Context
    from libertem_tpu.executor.inline import InlineJobExecutor
    from libertem_tpu.udf.com import GuessResult

    b = m.balance(np.array([[2, -1], [2, -3]]))
    assert abs(b.sum()) < 1e-12  # int template: no UFuncTypeError

    g = GuessResult(scan_rotation=10.0, flip_y=False,
                cy=1.0, cx=2.0)
    assert not hasattr(g, "bogus")  # KeyError -> AttributeError
    assert copy.deepcopy(g) == g

    ctx = Context(executor=InlineJobExecutor())
    data = _mk_random((2, 2, 8, 8), dtype="float32")
    d = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=2
    ).initialize()
    events = []
    ctx.executor.subscribe(
        "run_udf:start", lambda t, msg: events.append("start")
    )
    ctx.executor.subscribe(
        "run_udf:end", lambda t, msg: events.append("end")
    )
    for _ in ctx.run_udf_iter(d, SumUDF()):
        pass
    assert events == ["start", "end"]


def test_hdf5_target_size_both_directions(lt_ctx, tmp_path):
    """target_size works in BOTH directions (reference hdf5.py:556):
    a large target REDUCES the partition count below the core
    heuristic (round-3 review finding)."""
    import h5py

    data = _mk_random((8, 8, 8), dtype="float32")
    p = str(tmp_path / "ts.h5")
    with h5py.File(p, "w") as f:
        f.create_dataset("data", data=data)
    ds = lt_ctx.load("hdf5", path=p, ds_path="data",
                     target_size=data.nbytes)
    ds.set_num_cores(8)
    assert ds.get_num_partitions() == 1
    ds2 = lt_ctx.load("hdf5", path=p, ds_path="data",
                      target_size=data.nbytes // 4)
    assert ds2.get_num_partitions() == 4
    # explicit num_partitions wins over target_size
    ds3 = lt_ctx.load("hdf5", path=p, ds_path="data",
                      target_size=data.nbytes, num_partitions=3)
    assert ds3.get_num_partitions() == 3
