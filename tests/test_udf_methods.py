"""Coverage for the runner's less-common lowering paths: sig-tiled
schemes, frame-mode with sig accumulation (lax.scan), frame-mode
nav-only (vmap), PARTITION method, shifts, sparse mask factories,
coordinates metadata."""
import jax.numpy as jnp
import numpy as np
import pytest

from libertem_tpu.io.dataset.memory import MemoryDataSet
from libertem_tpu.udf import ApplyMasksUDF, SumUDF
from libertem_tpu.udf.base import UDF

from conftest import _mk_random


@pytest.fixture
def data():
    return _mk_random((5, 6, 16, 16), dtype="float32")


@pytest.fixture
def ds(data):
    return MemoryDataSet(
        data=data, sig_dims=2, num_partitions=2
    ).initialize()


class TiledSumUDF(UDF):
    """Sum with forced sig tiling to exercise the K>1 path."""

    def get_result_buffers(self):
        return {"intensity": self.buffer(kind="sig",
                                         dtype="float32")}

    def get_tiling_preferences(self):
        # 16x16 f32 frame = 1024 B; forcing 512 splits sig in half
        return {"depth": 8, "total_size": 512}

    def process_tile(self, tile):
        self.results.intensity += tile.sum(axis=0)

    def merge(self, dest, src):
        dest.intensity = dest.intensity + src.intensity


def test_sig_tiled_scheme(lt_ctx, ds, data):
    res = lt_ctx.run_udf(ds, TiledSumUDF())
    assert np.allclose(
        res["intensity"].data, data.sum(axis=(0, 1)), rtol=1e-4
    )


class TiledNavUDF(UDF):
    """nav output accumulated across sig tiles (per-tile partial
    sums into the same nav rows)."""

    def get_result_buffers(self):
        return {"intensity": self.buffer(kind="nav",
                                         dtype="float32")}

    def get_tiling_preferences(self):
        return {"depth": 8, "total_size": 512}

    def process_tile(self, tile):
        self.results.intensity += tile.sum(
            axis=tuple(range(1, tile.ndim))
        )


def test_sig_tiled_nav(lt_ctx, ds, data):
    res = lt_ctx.run_udf(ds, TiledNavUDF())
    assert np.allclose(
        res["intensity"].data, data.sum(axis=(2, 3)), rtol=1e-4
    )


class FrameStatsUDF(UDF):
    """frame mode writing BOTH nav and sig buffers -> scan path."""

    def get_result_buffers(self):
        return {
            "maxes": self.buffer(kind="nav", dtype="float32"),
            "total": self.buffer(kind="sig", dtype="float32"),
        }

    def process_frame(self, frame):
        self.results.maxes = frame.max()
        self.results.total += frame

    def merge(self, dest, src):
        dest.total = dest.total + src.total


def test_frame_scan_path(lt_ctx, ds, data):
    res = lt_ctx.run_udf(ds, FrameStatsUDF())
    flat = data.reshape(-1, 16, 16)
    assert np.allclose(
        res["maxes"].data.reshape(-1), flat.max(axis=(1, 2))
    )
    assert np.allclose(
        res["total"].data, flat.sum(axis=0), rtol=1e-4
    )


class FrameNavUDF(UDF):
    """frame mode, nav-only -> vmap path."""

    def get_result_buffers(self):
        return {"com_y": self.buffer(kind="nav", dtype="float32")}

    def process_frame(self, frame):
        h = frame.shape[0]
        ys = jnp.arange(h, dtype=jnp.float32)[:, None]
        self.results.com_y = (
            (frame * ys).sum() / frame.sum()
        )


def test_frame_vmap_path(lt_ctx, ds, data):
    res = lt_ctx.run_udf(ds, FrameNavUDF())
    flat = data.reshape(-1, 16, 16).astype(np.float64)
    ys = np.arange(16)[:, None]
    expected = (flat * ys).sum(axis=(1, 2)) / flat.sum(axis=(1, 2))
    assert np.allclose(
        res["com_y"].data.reshape(-1), expected, rtol=1e-3,
        atol=1e-3,
    )


class PartitionSumUDF(UDF):
    def get_result_buffers(self):
        return {"intensity": self.buffer(kind="sig",
                                         dtype="float32")}

    def process_partition(self, partition):
        vmask = self.meta.tile_valid.reshape(
            (-1,) + (1,) * (partition.ndim - 1)
        )
        self.results.intensity += (partition * vmask).sum(axis=0)

    def merge(self, dest, src):
        dest.intensity = dest.intensity + src.intensity


def test_partition_method(lt_ctx, ds, data):
    res = lt_ctx.run_udf(ds, PartitionSumUDF())
    assert np.allclose(
        res["intensity"].data, data.sum(axis=(0, 1)), rtol=1e-4
    )


def test_apply_masks_shifts_constant(lt_ctx, ds, data):
    m = np.zeros((16, 16), dtype=np.float32)
    m[4, 4] = 1.0
    udf = ApplyMasksUDF(
        mask_factories=[lambda: m],
        shifts=np.array([1, 2]),
    )
    res = lt_ctx.run_udf(ds, udf)
    # frame rolled by (-1,-2): mask at (4,4) sees original (5,6)
    expected = data[..., 5, 6].reshape(-1)
    assert np.allclose(
        res["intensity"].data.reshape(-1), expected,
        rtol=1e-4, atol=1e-4,
    )


def test_apply_masks_shifts_aux(lt_ctx, ds, data):
    m = np.zeros((16, 16), dtype=np.float32)
    m[4, 4] = 1.0
    n = 5 * 6
    rng = np.random.default_rng(2)
    shifts = rng.integers(-3, 4, (n, 2)).astype(np.float32)
    udf = ApplyMasksUDF(
        mask_factories=[lambda: m],
        shifts=UDF.aux_data(
            shifts, kind="nav", extra_shape=(2,), dtype="float32"
        ),
    )
    res = lt_ctx.run_udf(ds, udf)
    flat = data.reshape(n, 16, 16)

    def truncated(i):
        y = 4 + int(shifts[i, 0])
        x = 4 + int(shifts[i, 1])
        if 0 <= y < 16 and 0 <= x < 16:
            return flat[i, y, x]
        return 0.0  # shifted outside the frame -> zero (truncation)

    expected = np.array([truncated(i) for i in range(n)])
    assert np.allclose(
        res["intensity"].data.reshape(-1), expected,
        rtol=1e-4, atol=1e-4,
    )


def test_sparse_mask_factory(lt_ctx, ds, data):
    import scipy.sparse as sp
    dense = np.zeros((16, 16), dtype=np.float32)
    dense[3:6, 8:11] = 2.0
    sparse_mask = sp.csr_matrix(dense)
    udf = ApplyMasksUDF(mask_factories=[lambda: sparse_mask])
    res = lt_ctx.run_udf(ds, udf)
    expected = (
        data.reshape(-1, 16, 16) * dense
    ).sum(axis=(1, 2))
    assert np.allclose(
        res["intensity"].data.reshape(-1), expected, rtol=1e-3
    )


class CoordsUDF(UDF):
    """Verifies meta.coordinates delivers original nav coords."""

    def get_result_buffers(self):
        return {
            "coords": self.buffer(
                kind="nav", extra_shape=(2,), dtype="float32"
            ),
        }

    def process_tile(self, tile):
        self.results.coords = self.meta.coordinates.astype(
            jnp.float32
        )


def test_coordinates(lt_ctx, ds):
    rng = np.random.default_rng(1)
    roi = rng.random(30) > 0.4
    res = lt_ctx.run_udf(ds, CoordsUDF(), roi=roi)
    out = res["coords"].data.reshape(-1, 2)
    ys, xs = np.unravel_index(np.flatnonzero(roi), (5, 6))
    sel = roi
    assert np.allclose(out[sel][:, 0], ys)
    assert np.allclose(out[sel][:, 1], xs)


def test_1d_nav(lt_ctx):
    data = _mk_random((30, 12, 12), dtype="float32")
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=3
    ).initialize()
    from libertem_tpu.udf import SumSigUDF, SumUDF
    r1, r2 = lt_ctx.run_udf(ds, [SumUDF(), SumSigUDF()])
    assert np.allclose(
        r1["intensity"].data, data.sum(axis=0), rtol=1e-4
    )
    assert r2["intensity"].data.shape == (30,)


def test_3d_nav(lt_ctx):
    data = _mk_random((3, 4, 5, 8, 8), dtype="float32")
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=2
    ).initialize()
    from libertem_tpu.udf import SumSigUDF
    res = lt_ctx.run_udf(ds, SumSigUDF())
    assert res["intensity"].data.shape == (3, 4, 5)
    assert np.allclose(
        res["intensity"].data, data.sum(axis=(3, 4)), rtol=1e-4
    )


def test_missing_merge_raises(lt_ctx, ds):
    class BadUDF(UDF):
        def get_result_buffers(self):
            return {"x": self.buffer(kind="sig", dtype="float32")}

        def process_tile(self, tile):
            self.results.x += tile.sum(axis=0)

    # NotImplementedError for reference parity (the default
    # UDF.merge raises it; reference test_no_default_merge)
    with pytest.raises(NotImplementedError):
        lt_ctx.run_udf(ds, BadUDF())


def test_bad_roi_raises(lt_ctx, ds):
    from libertem_tpu.udf import SumUDF
    with pytest.raises(ValueError):
        lt_ctx.run_udf(
            ds, SumUDF(), roi=np.ones(7, dtype=bool)
        )


def test_utils_vectors():
    from libertem_tpu.utils import (
        make_cartesian, make_polar, rotate_deg,
    )
    v = np.array([[3.0, 4.0], [0.0, 1.0]])
    p = make_polar(v)
    assert np.allclose(p[0, 0], 5.0)
    back = make_cartesian(p)
    assert np.allclose(back, v)
    y, x = rotate_deg(0.0, 1.0, 90.0)
    assert np.allclose([y, x], [1.0, 0.0], atol=1e-12)


def test_1d_sig_spectra(lt_ctx):
    """EELS-style data: 2D nav, 1D signal."""
    data = _mk_random((6, 7, 64), dtype="float32")
    ds = MemoryDataSet(
        data=data, sig_dims=1, num_partitions=2
    ).initialize()
    from libertem_tpu.udf import StdDevUDF, SumSigUDF, SumUDF
    r1, r2, r3 = lt_ctx.run_udf(
        ds, [SumUDF(), SumSigUDF(), StdDevUDF()]
    )
    assert np.allclose(
        r1["intensity"].data, data.sum(axis=(0, 1)), rtol=1e-4
    )
    assert np.allclose(
        r2["intensity"].data, data.sum(axis=2), rtol=1e-4
    )
    flat = data.reshape(-1, 64)
    assert np.allclose(
        r3["var"].data, flat.var(axis=0), rtol=1e-3, atol=1e-4
    )


def test_viz_functions():
    from libertem_tpu.viz import (
        encode_image, rgb_from_2dvector, visualize_simple,
    )
    rng = np.random.default_rng(0)
    img = rng.random((16, 20))
    rgba = visualize_simple(img)
    assert rgba.shape == (16, 20, 4) and rgba.dtype == np.uint8
    rgba_log = visualize_simple(img, logarithmic=True)
    assert rgba_log.shape == (16, 20, 4)
    damage = np.zeros((16, 20), dtype=bool)
    damage[:8] = True
    rgba_dmg = visualize_simple(img, damage=damage)
    assert rgba_dmg.shape == (16, 20, 4)
    # complex input -> magnitude
    rgba_c = visualize_simple(img + 1j * img)
    assert rgba_c.shape == (16, 20, 4)
    rgb = rgb_from_2dvector(img - 0.5, img[::-1] - 0.5)
    assert rgb.shape == (16, 20, 3)
    png = encode_image(rgba)
    assert png.read(8)[1:4] == b"PNG"


def test_udf_instance_reuse(lt_ctx, ds, data):
    """Reusing a UDF instance across runs must not leak tracers from
    lazily-built operand caches (regression: caches must hold numpy,
    not traced constants)."""
    from libertem_tpu.udf import (
        ApplyMasksUDF, CoMUDF, CrystallinityUDF, FEMUDF,
    )
    m = np.ones((16, 16), dtype=np.float32)
    udfs = [
        ApplyMasksUDF(mask_factories=[lambda: m]),
        CoMUDF.with_params(),
        FEMUDF(center=(8, 8), rad_in=2, rad_out=6),
        CrystallinityUDF(rad_in=1, rad_out=5),
    ]
    first = lt_ctx.run_udf(ds, udfs)
    # second run with the SAME instances over a different dataset
    data2 = _mk_random((4, 4, 16, 16), dtype="float32", seed=9)
    ds2 = MemoryDataSet(
        data=data2, sig_dims=2, num_partitions=2
    ).initialize()
    second = lt_ctx.run_udf(ds2, udfs)
    flat2 = data2.reshape(-1, 16, 16)
    assert np.allclose(
        second[0]["intensity"].data.reshape(-1),
        flat2.sum(axis=(1, 2)), rtol=1e-3,
    )


def test_cleanup_hook_and_plot_class(lt_ctx):
    """UDF.cleanup runs after the pass (reference udf/base.py:1607);
    Context.plot_class selects the default live-plot implementation
    (reference api.py:436)."""
    from libertem_tpu.api import Context
    from libertem_tpu.io.dataset.memory import MemoryDataSet
    from libertem_tpu.udf.base import UDF
    from libertem_tpu.viz.base import Dummy2DPlot

    events = []

    class CleanupUDF(UDF):
        def get_result_buffers(self):
            return {"x": self.buffer(kind="nav", dtype="float32")}

        def process_tile(self, tile):
            pass

        def cleanup(self):
            events.append("cleanup")

    import numpy as np
    data = np.zeros((4, 4, 8, 8), dtype=np.float32)
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=2
    ).initialize()
    lt_ctx.run_udf(ds, CleanupUDF())
    assert events == ["cleanup"]

    ctx = Context(plot_class=Dummy2DPlot)
    assert ctx.plot_class is Dummy2DPlot
    res = ctx.run_udf(ds, CleanupUDF(), plots=True)
    assert res is not None


def test_frame_udf_never_sig_split(lt_ctx):
    """FRAME-method UDFs must receive whole frames even when a
    co-running tile UDF (or their own size preference) would sig-split
    the scheme — each sig sub-rectangle dispatched as a 'frame' would
    silently overwrite the previous slice's result."""
    import jax.numpy as jnp
    from libertem_tpu.udf.base import UDF

    class TinyTileUDF(UDF):
        def get_result_buffers(self):
            return {"s": self.buffer(kind="sig", dtype="float32")}

        def get_tiling_preferences(self):
            return {"total_size": 128, "depth": 4}

        def process_tile(self, tile):
            self.results.s = self.results.s + tile.sum(axis=0)

        def merge(self, dest, src):
            dest.s = dest.s + src.s

    class FrameSumUDF(UDF):
        def get_result_buffers(self):
            return {"fsum": self.buffer(kind="nav", dtype="float32")}

        def process_frame(self, frame):
            self.results.fsum = frame.sum()

    data = _mk_random((2, 2, 8, 8), dtype="float32")
    ds = MemoryDataSet(data=data, sig_dims=2, num_partitions=1)
    ds.initialize()
    res_tile, res_frame = lt_ctx.run_udf(
        ds, [TinyTileUDF(), FrameSumUDF()]
    )
    flat = data.reshape(-1, 8, 8)
    assert np.allclose(
        res_frame["fsum"].data.reshape(-1), flat.sum(axis=(1, 2)),
        rtol=1e-5,
    )
    assert np.allclose(
        res_tile["s"].data, flat.sum(axis=0), rtol=1e-5
    )

    # a frame UDF alone with a small size preference must also keep
    # whole frames
    class SmallPrefFrameUDF(FrameSumUDF):
        def get_tiling_preferences(self):
            return {"total_size": 128, "depth": 4}

    res = lt_ctx.run_udf(ds, SmallPrefFrameUDF())
    assert np.allclose(
        res["fsum"].data.reshape(-1), flat.sum(axis=(1, 2)),
        rtol=1e-5,
    )


def test_cleanup_ordering_and_abandoned_iter(lt_ctx):
    """cleanup() must run AFTER get_results (which may use task_data),
    and must also run when a partial-results iterator is abandoned
    mid-run."""
    events = []

    class LifecycleUDF(UDF):
        def get_task_data(self):
            return {"res": "open"}

        def get_result_buffers(self):
            return {"s": self.buffer(kind="sig", dtype="float32")}

        def process_tile(self, tile):
            self.results.s = self.results.s + tile.sum(axis=0)

        def merge(self, dest, src):
            dest.s = dest.s + src.s

        def get_results(self):
            # task_data must still be alive here
            events.append(("get_results", self.task_data.res))
            return {"s": self.results.s}

        def cleanup(self):
            events.append(("cleanup", None))

    data = _mk_random((4, 4, 8, 8), dtype="float32")
    ds = MemoryDataSet(data=data, sig_dims=2, num_partitions=2)
    ds.initialize()
    lt_ctx.run_udf(ds, LifecycleUDF())
    assert ("get_results", "open") in events
    # cleanup ran, and only after the last get_results
    assert events[-1] == ("cleanup", None)

    # abandoned iterator still cleans up
    events.clear()
    from libertem_tpu.udf.base import UDFRunner
    runner = UDFRunner([LifecycleUDF()])
    it = runner.run_for_dataset_iter(ds)
    next(it)
    it.close()
    assert ("cleanup", None) in events


def test_param_patch_length_mismatch(lt_ctx):
    from libertem_tpu.udf.base import UDFRunner
    from libertem_tpu.udf import SumUDF, SumSigUDF
    runner = UDFRunner([SumUDF(), SumSigUDF()])
    with pytest.raises(ValueError, match="1 patches for 2"):
        runner.update_parameters_experimental([{}])


def test_whole_frame_udfs_with_tiny_tile_udf(lt_ctx):
    """UDFs whose math needs whole frames (FFT ring, per-frame min,
    full-frame gather) declare whole_frames in their tiling prefs and
    keep correct results even when a co-running tile UDF asks for
    tiny tiles (which would otherwise sig-split the scheme)."""
    from libertem_tpu.udf import FEMUDF, LogsumUDF
    from libertem_tpu.udf.crystallinity import CrystallinityUDF

    class TinyTileUDF(UDF):
        def get_result_buffers(self):
            return {"s": self.buffer(kind="sig", dtype="float32")}

        def get_tiling_preferences(self):
            return {"total_size": 256, "depth": 4}

        def process_tile(self, tile):
            self.results.s = self.results.s + tile.sum(axis=0)

        def merge(self, dest, src):
            dest.s = dest.s + src.s

    data = _mk_random((3, 3, 16, 16), dtype="float32") + 2.0
    ds = MemoryDataSet(data=data, sig_dims=2, num_partitions=1)
    ds.initialize()
    flat = data.reshape(-1, 16, 16)

    # references computed alone (whole frames guaranteed)
    fem_alone = lt_ctx.run_udf(
        ds, FEMUDF.with_params(cy=8, cx=8, ri=2, ro=6)
    )["intensity"].data
    log_alone = lt_ctx.run_udf(ds, LogsumUDF())["logsum"].data

    res = lt_ctx.run_udf(ds, [
        TinyTileUDF(),
        FEMUDF.with_params(cy=8, cx=8, ri=2, ro=6),
        LogsumUDF(),
        CrystallinityUDF(rad_in=1, rad_out=5),
    ])
    assert np.allclose(res[0]["s"].data, flat.sum(axis=0), rtol=1e-4)
    assert np.allclose(
        np.asarray(res[1]["intensity"].data),
        np.asarray(fem_alone), rtol=1e-5,
    )
    assert np.allclose(
        np.asarray(res[2]["logsum"].data),
        np.asarray(log_alone), rtol=1e-5,
    )


def test_sharded_prep_keeps_aux_on_host():
    """_prepare(device=None) (the sharded path) must not device_put
    aux buffers — multi-host processes can't address devices[0]."""
    from libertem_tpu.udf.base import UDFRunner

    class AuxUDF(UDF):
        def get_result_buffers(self):
            return {"w": self.buffer(kind="nav", dtype="float32")}

        def process_frame(self, frame):
            self.results.w = frame.sum() * self.params.k

    data = _mk_random((2, 3, 4, 4), dtype="float32")
    ds = MemoryDataSet(data=data, sig_dims=2, num_partitions=1)
    ds.initialize()
    w = np.arange(6, dtype=np.float32)
    runner = UDFRunner([
        AuxUDF(k=AuxUDF.aux_data(w, kind="nav", dtype="float32"))
    ])
    prep = runner._prepare(ds, None, None, None)
    assert isinstance(prep["aux"][0]["k"], np.ndarray)
