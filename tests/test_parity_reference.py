"""Golden-file numeric parity vs the reference implementation.

The goldens in tests/goldens/*.npz were recorded by running the actual
reference (/root/reference/src) on CPU via tests/ref_oracle/
record_goldens.py over fixed-seed synthetic inputs built by
tests/golden_common.py.  These tests run this framework over the SAME
inputs and gate on allclose.

Tolerances: the reference accumulates float32 partials per-tile in C
order on the host; XLA uses different reduction trees (and float32
matmuls may use different FMA grouping), so results agree to relative
~1e-4 for sums/matmuls and ~1e-3 for variance-derived quantities —
documented per-assert below.
"""
import os

import numpy as np
import pytest

import golden_common as gc
from libertem_tpu import masks as mask_lib
from libertem_tpu.io.corrections import CorrectionSet
from libertem_tpu.io.dataset.memory import MemoryDataSet
from libertem_tpu.udf import (
    ApplyMasksUDF, CoMUDF, CrystallinityUDF, FEMUDF, LogsumUDF,
    PickUDF, StdDevUDF, SumSigUDF, SumUDF,
)
from libertem_tpu.udf.com import CoMParams

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not recorded")
    return np.load(path)


@pytest.fixture(scope="module")
def golden_ds():
    data = gc.golden_data()
    return MemoryDataSet(
        data=data, sig_dims=2, num_partitions=4
    ).initialize()


H, W = gc.SIG
MP = gc.MASK_PARAMS


def _dense_factories():
    return [
        lambda: mask_lib.circular(MP["cx"], MP["cy"], W, H,
                                  MP["r_bf"]),
        lambda: mask_lib.ring(MP["cx"], MP["cy"], W, H,
                              MP["ro_adf"], MP["ri_adf"]),
        lambda: mask_lib.ring(MP["cx"], MP["cy"], W, H,
                              MP["ro_haadf"], MP["ri_haadf"]),
        lambda: mask_lib.gradient_x(W, H),
    ]


def test_parity_sum_bf(lt_ctx, golden_ds):
    g = _golden("sum_bf")
    res = lt_ctx.run_udf(golden_ds, [
        SumUDF(),
        ApplyMasksUDF(mask_factories=[
            lambda: mask_lib.circular(MP["cx"], MP["cy"], W, H,
                                      MP["r_bf"]),
        ]),
    ])
    # float32 sum over 256 frames: reduction-order tolerance
    assert np.allclose(
        res[0]["intensity"].data, g["sum_intensity"],
        rtol=1e-4, atol=1e-2,
    )
    assert np.allclose(
        res[1]["intensity"].data, g["bf_intensity"],
        rtol=1e-4, atol=1e-2,
    )


def test_parity_mask_stack_dense(lt_ctx, golden_ds):
    g = _golden("mask_stack_dense")
    res = lt_ctx.run_udf(
        golden_ds, ApplyMasksUDF(mask_factories=_dense_factories())
    )
    # gradient_x mask sums ~64k values of magnitude ~600 -> atol
    assert np.allclose(
        res["intensity"].data, g["intensity"], rtol=1e-4, atol=1.0,
    )


def test_parity_mask_stack_roi(lt_ctx, golden_ds):
    g = _golden("mask_stack_roi")
    roi = gc.golden_roi().reshape(gc.NAV)
    res = lt_ctx.run_udf(
        golden_ds, ApplyMasksUDF(mask_factories=_dense_factories()),
        roi=roi,
    )
    got = res["intensity"].data
    assert got.shape == g["intensity"].shape
    assert np.allclose(
        got[roi], g["intensity"][roi], rtol=1e-4, atol=1.0,
    )


def test_parity_mask_stack_sparse(lt_ctx, golden_ds):
    """Sparse radial-bin stack: the reference runs the sparse.pydata
    kernel path; this framework densifies onto the MXU — results must
    agree regardless."""
    g = _golden("mask_stack_sparse")
    rp = gc.RADIAL_PARAMS

    def factory():
        return mask_lib.radial_bins(
            rp["cx"], rp["cy"], W, H, radius=rp["ro"],
            radius_inner=rp["ri"], n_bins=rp["n_bins"],
        )

    res = lt_ctx.run_udf(
        golden_ds,
        ApplyMasksUDF(mask_factories=factory,
                      mask_count=rp["n_bins"]),
    )
    assert np.allclose(
        res["intensity"].data, g["intensity"], rtol=1e-4, atol=1e-2,
    )


def test_parity_com(lt_ctx, golden_ds):
    g = _golden("com")
    res = lt_ctx.run_udf(
        golden_ds, CoMUDF(CoMParams(**gc.COM_PARAMS))
    )
    assert np.allclose(
        res["raw_com"].data, g["raw_com"], rtol=1e-4, atol=1e-4,
    )
    assert np.allclose(
        res["field"].data, g["field"], rtol=1e-4, atol=1e-4,
    )
    assert np.allclose(
        res["magnitude"].data, g["magnitude"], rtol=1e-4, atol=1e-4,
    )
    # gradients of small differences: slightly looser
    assert np.allclose(
        res["divergence"].data, g["divergence"],
        rtol=1e-3, atol=1e-4,
    )
    assert np.allclose(
        res["curl"].data, g["curl"], rtol=1e-3, atol=1e-4,
    )


def test_parity_radial_fourier(lt_ctx, golden_ds):
    g = _golden("radial_fourier")
    rp = gc.RADIAL_PARAMS
    from libertem_tpu.analysis.radialfourier import (
        radial_fourier_masks,
    )

    def factory():
        return radial_fourier_masks(
            (H, W), rp["cx"], rp["cy"], rp["ri"], rp["ro"],
            rp["n_bins"], rp["max_order"],
        )

    res = lt_ctx.run_udf(golden_ds, ApplyMasksUDF(
        mask_factories=factory,
        mask_count=rp["n_bins"] * (rp["max_order"] + 1),
        mask_dtype=np.complex64,
    ))
    # complex64 matmul: order-dependent rounding on ~4e3 magnitudes
    assert np.allclose(
        res["intensity"].data, g["intensity"], rtol=1e-3, atol=0.1,
    )


def test_parity_stats(lt_ctx, golden_ds):
    g = _golden("stats")
    res = lt_ctx.run_udf(
        golden_ds, [StdDevUDF(), SumSigUDF(), LogsumUDF()]
    )
    # variance: catastrophic-cancellation sensitive -> 1e-3 relative
    assert np.allclose(res[0]["var"].data, g["var"],
                       rtol=1e-3, atol=1e-4)
    assert np.allclose(res[0]["std"].data, g["std"],
                       rtol=1e-3, atol=1e-4)
    assert np.allclose(res[0]["mean"].data, g["mean"],
                       rtol=1e-4, atol=1e-4)
    assert np.allclose(res[1]["intensity"].data, g["sumsig"],
                       rtol=1e-4, atol=1e-2)
    assert np.allclose(res[2]["logsum"].data, g["logsum"],
                       rtol=1e-4, atol=1e-3)


def test_parity_fem_crystallinity(lt_ctx, golden_ds):
    g = _golden("fem_crystal")
    fp = gc.FEM_PARAMS
    kp = gc.CRYSTAL_PARAMS
    res = lt_ctx.run_udf(golden_ds, [
        FEMUDF(center=fp["center"], rad_in=fp["rad_in"],
               rad_out=fp["rad_out"]),
        CrystallinityUDF(
            rad_in=kp["rad_in"], rad_out=kp["rad_out"],
            real_center=kp["real_center"], real_rad=kp["real_rad"],
        ),
    ])
    assert np.allclose(res[0]["intensity"].data, g["fem"],
                       rtol=1e-3, atol=1e-3)
    assert np.allclose(res[1]["intensity"].data, g["crystal"],
                       rtol=1e-3, atol=1e-2)


def test_parity_pick(lt_ctx, golden_ds):
    g = _golden("pick")
    roi = np.zeros(int(np.prod(gc.NAV)), dtype=bool)
    roi[[3, 77, 200]] = True
    res = lt_ctx.run_udf(golden_ds, PickUDF(),
                         roi=roi.reshape(gc.NAV))
    got = np.asarray(res["intensity"].data).reshape(g["intensity"].shape)
    # pure extraction: bit-exact
    assert np.array_equal(got, g["intensity"])


def test_parity_corrections(lt_ctx):
    g = _golden("corrections")
    data = gc.golden_data_u16()
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=4
    ).initialize()
    dark, gain, excluded = gc.golden_corrections_arrays()
    corr = CorrectionSet(dark=dark, gain=gain,
                         excluded_pixels=excluded)
    res = lt_ctx.run_udf(ds, [SumUDF(), StdDevUDF()],
                         corrections=corr)
    assert np.allclose(
        res[0]["intensity"].data, g["sum_intensity"],
        rtol=1e-4, atol=1e-2,
    )
    assert np.allclose(
        res[1]["var"].data, g["var"], rtol=1e-3, atol=1e-3,
    )


def test_parity_mask_shifts(lt_ctx, golden_ds):
    """Per-frame mask shifts: the reference shifts the MASK with
    truncating overlap slicing (masks.py:85); this framework rolls the
    frame the other way and zeroes the wrap — must agree exactly."""
    from libertem_tpu.udf.base import UDF
    g = _golden("mask_shifts")
    shift_vals = g["shift_vals"]
    shifts_aux = UDF.aux_data(
        shift_vals, kind="nav", extra_shape=(2,), dtype=np.int64
    )
    res = lt_ctx.run_udf(golden_ds, ApplyMasksUDF(
        mask_factories=[
            lambda: mask_lib_circular()
        ],
        shifts=shifts_aux,
    ))
    assert np.allclose(
        res["intensity"].data, g["intensity"], rtol=1e-4, atol=1e-2,
    )


def mask_lib_circular():
    return mask_lib.circular(MP["cx"], MP["cy"], W, H, MP["r_bf"])


def test_parity_sync_offset(lt_ctx, tmp_path):
    """sync_offset (positive: skip leading frames; negative: pad)
    must match the reference's bookkeeping (dataset.py:70)."""
    g = _golden("sync_offset")
    data = gc.golden_data()
    path = str(tmp_path / "sync.raw")
    data.astype(np.float32).tofile(path)
    for name, off in (("pos", 3), ("neg", -3)):
        ds = lt_ctx.load(
            "raw", path=path, dtype="float32",
            nav_shape=gc.NAV, sig_shape=gc.SIG, sync_offset=off,
        )
        res = lt_ctx.run_udf(ds, [SumUDF(), SumSigUDF()])
        assert np.allclose(
            res[0]["intensity"].data, g[f"sum_{name}"],
            rtol=1e-4, atol=1e-2,
        ), name
        got = np.nan_to_num(res[1]["intensity"].data)
        want = np.nan_to_num(g[f"sumsig_{name}"])
        assert np.allclose(got, want, rtol=1e-4, atol=1e-2), name


def test_parity_mib_decoders(lt_ctx, tmp_path):
    """Format-decoder parity: the reference's MIB readers decoded
    synthetic r6/r12/r24/u16 files (recorded in the golden); this
    framework's loader must produce identical pixels from the same
    bytes.  r24 is single-frame: the reference's multi-frame r24 byte
    math is internally inconsistent (see record_goldens.py)."""
    from test_mib import _encode_r6, _encode_r12, _encode_r24
    g = _golden("mib_decode")
    hb = 384
    encoders = {
        "r6": ("R64", 6, lambda fr: _encode_r6(
            fr.reshape(fr.shape[0], -1))),
        "r12": ("R64", 12, lambda fr: _encode_r12(
            fr.reshape(fr.shape[0], -1))),
        "r24": ("R64", 24, lambda fr: _encode_r24(
            fr.reshape(fr.shape[0], -1))),
        "u16": ("U16", 12, lambda fr: fr.reshape(
            fr.shape[0], -1).astype(">u2")),
    }
    for name, (dtype_str, bd, enc) in encoders.items():
        frames = g[f"{name}_frames"]
        n_f, hsz, real_w = frames.shape
        wsz = real_w * 2 if bd == 24 else real_w
        case_dir = tmp_path / name
        case_dir.mkdir()
        path = str(case_dir / "acq1.mib")
        with open(path, "wb") as f:
            for i, fr in enumerate(frames):
                head = (
                    f"MQ1,{i+1},{hb},1,{wsz},{hsz},"
                    f"{dtype_str},1x1,2x2,{bd},"
                ).encode("ascii")
                f.write(head.ljust(hb, b"\x00"))
                f.write(enc(fr[None]).tobytes())
        ds = lt_ctx.load("mib", path=path, nav_shape=(n_f,))
        if bd == 24:
            res = lt_ctx.run_udf(ds, SumUDF())
            got = np.asarray(res["intensity"].data, np.float64)
            assert np.allclose(
                got, g[f"{name}_decoded"], rtol=1e-7,
            ), name
        else:
            roi = np.ones(n_f, dtype=bool)
            res = lt_ctx.run_udf(ds, PickUDF(), roi=roi)
            got = np.asarray(res["intensity"].data)
            assert np.array_equal(
                got, g[f"{name}_decoded"].astype(got.dtype)
            ), name
