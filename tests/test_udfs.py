import numpy as np
import pytest

from libertem_tpu import masks as mask_lib
from libertem_tpu.io.dataset.memory import MemoryDataSet
from libertem_tpu.udf import (
    ApplyMasksUDF,
    AutoUDF,
    CoMUDF,
    CrystallinityUDF,
    FEMUDF,
    LogsumUDF,
    NoOpUDF,
    PickUDF,
    StdDevUDF,
    SumSigUDF,
    SumUDF,
)
from libertem_tpu.udf.com import CoMParams

from utils import naive_mask_apply
from conftest import _mk_random


@pytest.fixture
def data():
    return _mk_random((14, 15, 24, 24), dtype="float32")


@pytest.fixture
def ds(data):
    return MemoryDataSet(
        data=data, sig_dims=2, num_partitions=3
    ).initialize()


def test_sum(lt_ctx, ds, data):
    res = lt_ctx.run_udf(ds, SumUDF())
    assert np.allclose(
        res["intensity"].data, data.sum(axis=(0, 1)), rtol=1e-4
    )


def test_sumsig(lt_ctx, ds, data):
    res = lt_ctx.run_udf(ds, SumSigUDF())
    assert np.allclose(
        res["intensity"].data, data.sum(axis=(2, 3)), rtol=1e-4
    )


def test_multi_udf_single_pass(lt_ctx, ds, data):
    res_sum, res_sumsig = lt_ctx.run_udf(ds, [SumUDF(), SumSigUDF()])
    assert np.allclose(
        res_sum["intensity"].data, data.sum(axis=(0, 1)), rtol=1e-4
    )
    assert np.allclose(
        res_sumsig["intensity"].data, data.sum(axis=(2, 3)), rtol=1e-4
    )


def test_stddev(lt_ctx, ds, data):
    res = lt_ctx.run_udf(ds, StdDevUDF())
    flat = data.reshape(-1, 24, 24)
    assert float(res["num_frames"].data) == flat.shape[0]
    assert np.allclose(res["sum"].data, flat.sum(axis=0), rtol=1e-4)
    assert np.allclose(
        res["mean"].data, flat.mean(axis=0), rtol=1e-4
    )
    assert np.allclose(
        res["var"].data, flat.var(axis=0), rtol=1e-3, atol=1e-4
    )
    assert np.allclose(
        res["std"].data, flat.std(axis=0), rtol=1e-3, atol=1e-4
    )


def test_stddev_roi(lt_ctx, ds, data):
    rng = np.random.default_rng(7)
    roi = rng.random(14 * 15) > 0.4
    res = lt_ctx.run_udf(ds, StdDevUDF(), roi=roi)
    flat = data.reshape(-1, 24, 24)[roi]
    assert float(res["num_frames"].data) == flat.shape[0]
    assert np.allclose(
        res["var"].data, flat.var(axis=0), rtol=1e-3, atol=1e-4
    )


def test_apply_masks(lt_ctx, ds, data):
    m0 = mask_lib.circular(12, 12, 24, 24, 5)
    m1 = mask_lib.ring(12, 12, 24, 24, 10, 6)
    m2 = mask_lib.gradient_x(24, 24)
    udf = ApplyMasksUDF(
        mask_factories=[lambda: m0, lambda: m1, lambda: m2]
    )
    res = lt_ctx.run_udf(ds, udf)
    expected = naive_mask_apply([m0, m1, m2], data)
    assert res["intensity"].data.shape == (14, 15, 3)
    assert np.allclose(
        res["intensity"].data, expected, rtol=5e-3, atol=1e-2
    )


def test_apply_masks_roi(lt_ctx, ds, data):
    m0 = mask_lib.circular(12, 12, 24, 24, 5)
    rng = np.random.default_rng(3)
    roi = rng.random(14 * 15) > 0.5
    udf = ApplyMasksUDF(mask_factories=[lambda: m0])
    res = lt_ctx.run_udf(ds, udf, roi=roi)
    expected = naive_mask_apply([m0], data).reshape(-1, 1)
    out = res["intensity"].data.reshape(-1, 1)
    assert np.allclose(out[roi], expected[roi], rtol=5e-3, atol=1e-2)
    assert np.isnan(out[~roi]).all()


def test_com(lt_ctx, ds, data):
    udf = CoMUDF.with_params()
    res = lt_ctx.run_udf(ds, udf)
    flat = data.reshape(-1, 24, 24).astype(np.float64)
    y, x = np.mgrid[0:24, 0:24]
    tot = flat.sum(axis=(1, 2))
    ref_y = (flat * y).sum(axis=(1, 2)) / tot
    ref_x = (flat * x).sum(axis=(1, 2)) / tot
    raw_com = res["raw_com"].data.reshape(-1, 2)
    assert np.allclose(raw_com[:, 0], ref_y, rtol=1e-3, atol=1e-3)
    assert np.allclose(raw_com[:, 1], ref_x, rtol=1e-3, atol=1e-3)
    # shifts relative to the reference's default INTEGER center
    # (h//2, w//2) = (12, 12)
    shifts = res["raw_shifts"].data.reshape(-1, 2)
    assert np.allclose(shifts[:, 0], ref_y - 12, rtol=1e-3, atol=5e-3)
    assert res["field"].data.shape == (14, 15, 2)
    assert res["magnitude"].data.shape == (14, 15)
    assert res["divergence"].data.shape == (14, 15)


def test_com_masked(lt_ctx, ds, data):
    udf = CoMUDF.with_params(cy=12, cx=12, r=8)
    res = lt_ctx.run_udf(ds, udf)
    flat = data.reshape(-1, 24, 24).astype(np.float64)
    y, x = np.mgrid[0:24, 0:24]
    mask = ((y - 12) ** 2 + (x - 12) ** 2 <= 64).astype(np.float64)
    tot = (flat * mask).sum(axis=(1, 2))
    ref_y = (flat * y * mask).sum(axis=(1, 2)) / tot
    raw_com = res["raw_com"].data.reshape(-1, 2)
    assert np.allclose(raw_com[:, 0], ref_y, rtol=1e-3, atol=1e-3)


def test_pick(lt_ctx, ds, data):
    roi = np.zeros(14 * 15, dtype=bool)
    roi[[3, 77, 150]] = True
    res = lt_ctx.run_udf(ds, PickUDF(), roi=roi)
    picked = res["intensity"].data
    flat = data.reshape(-1, 24, 24)
    assert picked.shape == (3, 24, 24)
    assert np.allclose(picked, flat[[3, 77, 150]])


def test_logsum(lt_ctx, ds, data):
    res = lt_ctx.run_udf(ds, LogsumUDF())
    flat = data.reshape(-1, 24, 24)
    mins = flat.min(axis=(1, 2), keepdims=True)
    expected = np.log1p(flat - mins).sum(axis=0)
    assert np.allclose(res["logsum"].data, expected, rtol=1e-3,
                       atol=1e-3)


def test_fem(lt_ctx, ds, data):
    udf = FEMUDF(center=(12, 12), rad_in=4, rad_out=9)
    res = lt_ctx.run_udf(ds, udf)
    y, x = np.ogrid[0:24, 0:24]
    d = np.sqrt((y - 12) ** 2 + (x - 12) ** 2)
    # reference ring semantics: rad_in < d <= rad_out
    sel = (d > 4) & (d <= 9)
    flat = data.reshape(-1, 24 * 24)
    expected = flat[:, sel.reshape(-1)].std(axis=1)
    assert np.allclose(
        res["intensity"].data.reshape(-1), expected,
        rtol=1e-3, atol=1e-4,
    )


def test_crystallinity(lt_ctx, ds, data):
    """Reference semantics (crystallinity.py:47-80): disk(out) -
    disk(in) ring centered at (h*0.5, w*0.5), |rfft2| summed over the
    half-plane; optional real-space central blanking disk."""
    udf = CrystallinityUDF(rad_in=2, rad_out=8,
                           real_center=(12, 12), real_rad=3)
    res = lt_ctx.run_udf(ds, udf)
    flat = data.reshape(-1, 24, 24)
    y, x = np.ogrid[0:24, 0:24]
    real_mask = 1.0 - (
        (y - 12.0) ** 2 + (x - 12.0) ** 2 <= 3.0 ** 2
    ).astype(np.float64)
    disk_out = ((y - 12.0) ** 2 + (x - 12.0) ** 2 <= 8.0 ** 2)
    disk_in = ((y - 12.0) ** 2 + (x - 12.0) ** 2 <= 2.0 ** 2)
    fmask = np.fft.fftshift(
        disk_out.astype(np.float64) - disk_in.astype(np.float64)
    )[:, :13]
    spec = np.abs(np.fft.rfft2(flat * real_mask))
    expected = (spec * fmask).sum(axis=(1, 2))
    assert np.allclose(
        res["intensity"].data.reshape(-1), expected, rtol=1e-3,
    )


def test_auto(lt_ctx, ds, data):
    import jax.numpy as jnp
    res = lt_ctx.map(ds, lambda frame: frame.sum())
    flat = data.reshape(-1, 24, 24)
    assert np.allclose(
        res.data.reshape(-1), flat.sum(axis=(1, 2)), rtol=1e-4
    )
    res2 = lt_ctx.map(ds, lambda frame: jnp.stack(
        [frame.max(), frame.min()]
    ))
    assert res2.data.shape == (14, 15, 2)
    assert np.allclose(
        res2.data[..., 0].reshape(-1), flat.max(axis=(1, 2))
    )


def test_noop(lt_ctx, ds):
    res = lt_ctx.run_udf(ds, NoOpUDF())
    assert res is not None


def test_aux_data(lt_ctx, ds, data):
    from libertem_tpu.udf.base import UDF

    class WeightedSumUDF(UDF):
        def get_result_buffers(self):
            return {
                "wsum": self.buffer(kind="sig", dtype="float32"),
            }

        def process_tile(self, tile):
            w = self.params.weights  # (depth,) aux rows
            self.results.wsum += (
                tile * w.reshape((-1,) + (1,) * (tile.ndim - 1))
            ).sum(axis=0)

        def merge(self, dest, src):
            dest.wsum = dest.wsum + src.wsum

    weights = np.linspace(0.1, 2.0, 14 * 15).astype(np.float32)
    udf = WeightedSumUDF(
        weights=UDF.aux_data(weights, kind="nav", extra_shape=(),
                             dtype="float32")
    )
    res = lt_ctx.run_udf(ds, udf)
    flat = data.reshape(-1, 24, 24)
    expected = (flat * weights[:, None, None]).sum(axis=0)
    assert np.allclose(res["wsum"].data, expected, rtol=1e-3)


def test_damage_partial_results(lt_ctx, ds, data):
    partials = list(lt_ctx.run_udf_iter(ds, SumSigUDF()))
    assert len(partials) == 3
    d0 = partials[0].damage.data
    assert d0.sum() > 0 and d0.sum() < 14 * 15
    assert partials[-1].damage.data.all()
    # partial nav results only valid where damaged
    buf = partials[0].buffers[0]["intensity"]
    vm = buf.valid_mask
    assert vm.sum() == d0.sum()


def test_com_regression_and_guess(lt_ctx):
    """A pure linear-ramp CoM field is fully removed by the linear
    regression deskew; guess_corrections finds a sensible rotation."""
    from libertem_tpu.udf.com import (
        CoMUDF, RegressionOptions, guess_corrections,
    )
    nav = (8, 8)
    h = w = 16
    frames = np.zeros(nav + (h, w), dtype=np.float32)
    for i in range(nav[0]):
        for j in range(nav[1]):
            cy = 7.5 + 0.1 * i
            cx = 7.5 + 0.2 * j
            y, x = np.mgrid[0:h, 0:w]
            frames[i, j] = np.exp(
                -((y - cy) ** 2 + (x - cx) ** 2) / 4
            )
    ds = MemoryDataSet(
        data=frames, sig_dims=2, num_partitions=2
    ).initialize()
    udf = CoMUDF.with_params(
        cy=7.5, cx=7.5,
        regression=RegressionOptions.SUBTRACT_LINEAR,
    )
    res = lt_ctx.run_udf(ds, udf)
    # after linear deskew the field is ~zero
    assert np.abs(res["field_y"].data).max() < 1e-2
    assert np.abs(res["field_x"].data).max() < 1e-2
    reg = res["regression"].data
    assert abs(reg[1, 0] - 0.1) < 1e-2  # d(shift_y)/d(row)
    assert abs(reg[2, 1] - 0.2) < 1e-2  # d(shift_x)/d(col)

    udf2 = CoMUDF.with_params(cy=7.5, cx=7.5)
    res2 = lt_ctx.run_udf(ds, udf2)
    guess = guess_corrections(
        res2["raw_com"].data[..., 0], res2["raw_com"].data[..., 1]
    )
    assert "scan_rotation" in guess and "cy" in guess


def test_com_correction_matches_reference_transform():
    """apply_com_correction must equal the reference's matrix form:
    transform = rotate_deg(theta) @ (flip_y | identity), applied to
    the (y, x) shift vector, with R = [[cos, sin], [-sin, cos]]
    (reference com.py:110 + corrections/coordinates.py:11,30)."""
    from libertem_tpu.udf.com import apply_com_correction
    rng = np.random.default_rng(3)
    sy = rng.normal(size=(5, 7))
    sx = rng.normal(size=(5, 7))
    for rot in (0.0, 23.0, -90.0, 180.0, 311.5):
        t = np.deg2rad(rot)
        rot_m = np.array([
            [np.cos(t), np.sin(t)],
            [-np.sin(t), np.cos(t)],
        ])
        for flip in (False, True):
            flip_m = np.array([[-1.0, 0.0], [0.0, 1.0]]) if flip \
                else np.eye(2)
            m = rot_m @ flip_m
            ey, ex = m @ (sy.ravel(), sx.ravel())
            gy, gx = apply_com_correction(sy, sx, rot, flip)
            assert np.allclose(gy.ravel(), ey, atol=1e-12), (rot, flip)
            assert np.allclose(gx.ravel(), ex, atol=1e-12), (rot, flip)


def test_com_curl_sign(lt_ctx):
    """curl = dFy/dx - dFx/dy (reference curl_2d com.py:134): a field
    rotating counter-clockwise in (y, x) frame coordinates, F =
    (y', x') = (col_offset, -row_offset), has positive curl ~= 2."""
    from libertem_tpu.udf.com import CoMUDF
    nav = (8, 8)
    h = w = 32
    frames = np.zeros(nav + (h, w), dtype=np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(nav[0]):
        for j in range(nav[1]):
            # CoM shift: dy = +0.2*(j - 3.5), dx = -0.2*(i - 3.5)
            cy = (h - 1) / 2 + 0.2 * (j - 3.5)
            cx = (w - 1) / 2 - 0.2 * (i - 3.5)
            frames[i, j] = np.exp(
                -((yy - cy) ** 2 + (xx - cx) ** 2) / 6
            )
    ds = MemoryDataSet(
        data=frames, sig_dims=2, num_partitions=2
    ).initialize()
    res = lt_ctx.run_udf(ds, CoMUDF.with_params())
    curl = res["curl"].data
    # interior points: dFy/dx = +0.2, dFx/dy = -0.2 -> curl = +0.4
    interior = curl[2:-2, 2:-2]
    assert np.all(interior > 0.3), interior.min()
    assert np.allclose(interior, 0.4, atol=0.05)
    div = res["divergence"].data[2:-2, 2:-2]
    assert np.allclose(div, 0.0, atol=0.05)


def test_h5_max_io_size_respected(lt_ctx, tmp_path):
    import h5py
    from libertem_tpu.udf.base import UDFRunner
    data = _mk_random((20, 8, 16, 16), dtype="float32")
    path = str(tmp_path / "chunked.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=data, chunks=(1, 2, 16, 16))
    ds = lt_ctx.load("hdf5", path=path)
    assert ds.get_max_io_size() is not None
    runner = UDFRunner([SumUDF()])
    prep = runner._prepare(ds, None, None, None)
    depth_bytes = prep["scheme"].depth * 16 * 16 * 4
    assert depth_bytes <= max(
        ds.get_max_io_size(), 8 * 16 * 16 * 4
    )
    res = lt_ctx.run_udf(ds, SumUDF())
    assert np.allclose(
        res["intensity"].data, data.sum(axis=(0, 1)), rtol=1e-4
    )


def test_many_tiny_partitions(lt_ctx):
    """Partitions smaller than the block depth: heavy padding."""
    data = _mk_random((30, 8, 8), dtype="float32")
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=11
    ).initialize()
    res = lt_ctx.run_udf(ds, [SumUDF(), StdDevUDF()])
    assert np.allclose(
        res[0]["intensity"].data, data.sum(axis=0), rtol=1e-4
    )
    assert float(res[1]["num_frames"].data) == 30
    assert np.allclose(
        res[1]["var"].data, data.var(axis=0), rtol=1e-3, atol=1e-4
    )


def test_with_mask_custom_validity(lt_ctx):
    """UDF.with_mask marks explicit validity on get_results values
    (reference udf/base.py:1611): CoM's regression buffer is invalid
    unless a regression was requested."""
    from libertem_tpu.udf.com import CoMUDF, RegressionOptions
    data = _mk_random((6, 6, 16, 16), dtype="float32")
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=2
    ).initialize()
    res = lt_ctx.run_udf(ds, CoMUDF.with_params())
    assert not res["regression"].valid_mask.any()
    assert res["regression"].masked_data.count() == 0
    res2 = lt_ctx.run_udf(ds, CoMUDF.with_params(
        regression=RegressionOptions.SUBTRACT_LINEAR,
    ))
    assert res2["regression"].valid_mask.all()


def test_apply_masks_complex_factories(lt_ctx, ds, data):
    """Complex mask factories without an explicit mask_dtype must
    yield a COMPLEX result buffer (the reference returns complex for
    complex masks) — not silently drop the imaginary part."""
    h, w = data.shape[-2:]
    yy, xx = np.mgrid[0:h, 0:w]
    phase = np.exp(2j * np.pi * xx / w).astype(np.complex64)
    udf = ApplyMasksUDF(mask_factories=[lambda: phase])
    res = lt_ctx.run_udf(ds, udf)
    got = np.asarray(res["intensity"].data)
    assert np.iscomplexobj(got)
    expected = data.reshape(-1, h * w) @ phase.reshape(-1)
    assert np.allclose(
        got.reshape(-1), expected, rtol=1e-3, atol=1e-2
    )


def test_apply_masks_mask_count_mismatch(lt_ctx, ds):
    udf = ApplyMasksUDF(
        mask_factories=lambda: np.ones((3,) + (24, 24), np.float32),
        mask_count=4,
    )
    with pytest.raises(ValueError, match="mask_count"):
        lt_ctx.run_udf(ds, udf)


def test_apply_masks_shifts_whole_frames_pref():
    udf = ApplyMasksUDF(
        mask_factories=[lambda: np.ones((8, 8), np.float32)],
        shifts=np.zeros((4, 2), np.int32),
    )
    assert udf.get_tiling_preferences().get("whole_frames")
    udf2 = ApplyMasksUDF(
        mask_factories=[lambda: np.ones((8, 8), np.float32)],
    )
    assert not udf2.get_tiling_preferences().get("whole_frames")


def test_auto_udf_monitor(lt_ctx, ds, data):
    from libertem_tpu.udf.auto import AutoUDF

    res = lt_ctx.run_udf(
        ds, AutoUDF(f=lambda fr: fr.sum(), monitor=True)
    )
    flat = data.reshape(-1, 24 * 24).sum(axis=1)
    assert np.allclose(
        np.asarray(res["result"].data).reshape(-1), flat, rtol=1e-4
    )
    mon = float(np.asarray(res["monitor"].data))
    assert np.isclose(mon, flat[-1], rtol=1e-4)


def test_udf_instance_reuse_across_sig_shapes(lt_ctx):
    """A UDF instance reused on a dataset with a different sig shape
    must rebuild its shape-derived caches (flat pixel indices, mask
    stacks) — the runner invalidates via on_params_updated."""
    from libertem_tpu.udf.FEM import FEMUDF

    rng = np.random.default_rng(0)
    udf = FEMUDF(center=(8, 8), rad_in=2, rad_out=6)
    for sig in [(16, 16), (32, 32)]:
        d = rng.random((2, 2) + sig).astype(np.float32)
        mds = MemoryDataSet(
            data=d, sig_dims=2, num_partitions=1
        ).initialize()
        res = lt_ctx.run_udf(mds, udf)
        # oracle: std over the ring pixels per frame
        h, w = sig
        y, x = np.ogrid[0:h, 0:w]
        dist = np.sqrt((y - 8) ** 2 + (x - 8) ** 2)
        sel = (dist > 2) & (dist <= 6)
        expected = d.reshape(4, h, w)[:, sel].std(axis=1)
        got = np.asarray(res["intensity"].data).reshape(-1)
        assert np.allclose(got, expected, rtol=1e-3), sig


def test_record_udf_runs_sharded(lt_ctx, tmp_path):
    """Round-2 gap closed: RecordUDF is a host-backend UDF now and
    records on the sharded executor too (reference records from any
    executor, udf/record.py:9)."""
    import jax

    from libertem_tpu.udf.base import UDFRunner
    from libertem_tpu.udf.record import RecordUDF

    data = np.arange(2 * 2 * 4 * 4, dtype=np.float32).reshape(
        2, 2, 4, 4
    )
    mds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=1
    ).initialize()
    udf = RecordUDF(filename=str(tmp_path / "o.npy"))
    assert udf.get_tiling_preferences()["whole_frames"]
    UDFRunner([udf]).run_for_dataset(mds, devices=jax.devices())
    # the npy header carries the FULL nav dims (reference record.py:49)
    assert np.array_equal(np.load(str(tmp_path / "o.npy")), data)
