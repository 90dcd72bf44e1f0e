"""Fused moments op: Pallas (interpret mode) vs XLA fallback parity
+ zero-padding contract."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libertem_tpu.ops.moments import (
    _fused_moments_pallas,
    _fused_moments_xla,
)


@pytest.mark.parametrize("valid", [96, 64, 17])
def test_pallas_interpret_matches_xla(valid):
    rng = np.random.default_rng(0)
    D, P, M = 96, 1024, 5
    x = rng.normal(loc=50, scale=2, size=(D, P)).astype(np.float32)
    x[valid:] = 0  # zero-padding contract
    masks = rng.normal(size=(M, P)).astype(np.float32)
    y1, cs1, cv1 = _fused_moments_pallas(
        jnp.asarray(x), jnp.asarray(masks), jnp.int32(valid),
        interpret=True,
    )
    y2, cs2, cv2 = _fused_moments_xla(
        jnp.asarray(x), jnp.asarray(masks), jnp.int32(valid)
    )
    assert np.allclose(y1, y2, rtol=1e-5, atol=1e-2)
    assert np.allclose(cs1, cs2, rtol=1e-5, atol=1e-2)
    assert np.allclose(cv1, cv2, rtol=1e-4, atol=1e-1)
    # against float64 reference
    xv = x[:valid].astype(np.float64)
    assert np.allclose(cs2, xv.sum(axis=0), rtol=1e-4)
    ref_var = ((xv - xv.mean(axis=0)) ** 2).sum(axis=0)
    assert np.allclose(cv2, ref_var, rtol=1e-3, atol=1e-1)


def test_pallas_interpret_u16():
    """Narrow integer input exercises the VMEM cast chain."""
    rng = np.random.default_rng(1)
    D, P, M = 32, 256, 3
    x = rng.integers(0, 4096, (D, P)).astype(np.uint16)
    masks = rng.normal(size=(M, P)).astype(np.float32)
    y1, cs1, cv1 = _fused_moments_pallas(
        jnp.asarray(x), jnp.asarray(masks), jnp.int32(D),
        interpret=True,
    )
    xv = x.astype(np.float64)
    assert np.allclose(y1, xv @ masks.T, rtol=1e-4, atol=1e-1)
    assert np.allclose(cs1, xv.sum(axis=0), rtol=1e-5)
    ref_cv = ((xv - xv.mean(axis=0)) ** 2).sum(axis=0)
    assert np.allclose(cv1, ref_cv, rtol=1e-3, atol=1e-1)


def test_fused_moments_nd_contraction():
    """(depth, h, w) inputs contract over the trailing dims and
    return sig-shaped colsum/colvar, numerically identical to the
    flat path (the engine feeds flat, but a mid-run patch that flips
    fusion can route native-shaped blocks here)."""
    from libertem_tpu.ops.moments import _fused_moments_xla

    rng = np.random.default_rng(0)
    depth, h, w, M = 32, 8, 16, 3
    x = rng.normal(100, 10, (depth, h, w)).astype(np.float32)
    masks = rng.random((M, h * w)).astype(np.float32)
    valid = jnp.int32(depth - 5)
    x_z = x.copy()
    x_z[depth - 5:] = 0.0  # zero-padding invariant
    y3, cs3, cv3 = _fused_moments_xla(
        jnp.asarray(x_z), jnp.asarray(masks), valid
    )
    y2, cs2, cv2 = _fused_moments_xla(
        jnp.asarray(x_z.reshape(depth, -1)), jnp.asarray(masks),
        valid,
    )
    assert cs3.shape == (h, w) and cv3.shape == (h, w)
    assert np.allclose(y3, y2, rtol=1e-6)
    assert np.allclose(np.asarray(cs3).ravel(), cs2, rtol=1e-6)
    assert np.allclose(np.asarray(cv3).ravel(), cv2, rtol=1e-5)


def test_pallas_split_matmul_parity():
    """The VMEM hi/lo-split matmul (native bf16 MXU passes) matches
    the f32 reference to f32 accuracy for u16 input."""
    rng = np.random.default_rng(3)
    depth, n_pix, M = 64, 1024, 4
    x = rng.integers(0, 65535, (depth, n_pix)).astype(np.uint16)
    x[depth - 7:] = 0
    masks = rng.random((M, n_pix)).astype(np.float32)
    valid = jnp.int32(depth - 7)
    y, cs, cv = _fused_moments_pallas(
        jnp.asarray(x), jnp.asarray(masks), valid,
        interpret=True, split_matmul=True,
    )
    exp_y = x.astype(np.float64) @ masks.astype(np.float64).T
    rel = np.abs(
        (np.asarray(y, np.float64) - exp_y)
        / np.maximum(np.abs(exp_y), 1.0)
    ).max()
    assert rel < 1e-5, rel
    yr, csr, cvr = _fused_moments_xla(
        jnp.asarray(x), jnp.asarray(masks), valid
    )
    assert np.allclose(cs, csr, rtol=1e-6)
    assert np.allclose(cv, cvr, rtol=1e-4, atol=1e-2)


def test_pallas_split_matmul_u8():
    """u8 input (MIB r1/r6 decode dtype) through the split kernel:
    hi byte is zero, products still exact."""
    rng = np.random.default_rng(4)
    depth, n_pix, M = 32, 512, 3
    x = rng.integers(0, 255, (depth, n_pix)).astype(np.uint8)
    masks = rng.random((M, n_pix)).astype(np.float32)
    valid = jnp.int32(depth)
    y, cs, cv = _fused_moments_pallas(
        jnp.asarray(x), jnp.asarray(masks), valid,
        interpret=True, split_matmul=True,
    )
    exp = x.astype(np.float64) @ masks.astype(np.float64).T
    assert np.allclose(np.asarray(y), exp, rtol=1e-5)


def _split_rel_err(x, masks, signed_masks=True):
    """Worst-case relative error of the split kernel's projections
    vs a float64 oracle, normalized per element against the mask's
    absolute-value projection (so sign cancellation in the result
    doesn't manufacture huge relative errors out of a tiny
    denominator — the scale of the computation is |x| @ |m|)."""
    valid = jnp.int32(x.shape[0])
    y, _, _ = _fused_moments_pallas(
        jnp.asarray(x), jnp.asarray(masks), valid,
        interpret=True, split_matmul=True,
    )
    exp = x.astype(np.float64) @ masks.astype(np.float64).T
    scale = np.abs(x.astype(np.float64)) @ np.abs(
        masks.astype(np.float64)
    ).T
    return np.abs(np.asarray(y, np.float64) - exp) / np.maximum(
        scale, 1e-30
    )


@pytest.mark.parametrize("dtype", [
    np.uint8, np.uint16, np.int8, np.int16, np.float32,
])
def test_split_matmul_accuracy_sweep(dtype):
    """Asserted accuracy contract for the VMEM split-matmul on every
    dispatched input dtype: worst-case rel err <= 1e-5 (observed
    ~1e-7 — three-term bf16 mask split covers f32's significand).
    Signed dtypes exercise the arithmetic-shift hi term: a logical
    (xi & 0xFF)-only decode would turn -5 into 251 and fail by ~1e4.
    """
    rng = np.random.default_rng(11)
    depth, n_pix, M = 64, 512, 4
    info = np.iinfo(dtype) if np.issubdtype(dtype, np.integer) else None
    if info is not None:
        x = rng.integers(
            info.min, info.max + 1, (depth, n_pix)
        ).astype(dtype)
    else:
        x = (rng.normal(0, 100, (depth, n_pix))).astype(dtype)
    # signed masks force cancellation in the accumulation
    masks = rng.normal(0, 1, (M, n_pix)).astype(np.float32)
    rel = _split_rel_err(x, masks)
    assert rel.max() < 1e-5, rel.max()


def test_split_matmul_corrected_f32():
    """Corrected (gain/dark applied) data arrives as f32 — the split
    path must hold parity there too, not only on raw integer blocks
    (round-2 gap: f32 fell back to multi-pass XLA)."""
    rng = np.random.default_rng(12)
    depth, n_pix, M = 48, 640, 5
    raw = rng.integers(0, 4096, (depth, n_pix)).astype(np.uint16)
    gain = rng.normal(1.0, 0.05, (n_pix,)).astype(np.float32)
    dark = rng.normal(10.0, 1.0, (n_pix,)).astype(np.float32)
    x = ((raw.astype(np.float32) - dark) * gain).astype(np.float32)
    masks = rng.random((M, n_pix)).astype(np.float32)
    rel = _split_rel_err(x, masks)
    assert rel.max() < 1e-5, rel.max()
    # moments stay bit-comparable to the XLA fallback
    valid = jnp.int32(depth)
    _, cs, cv = _fused_moments_pallas(
        jnp.asarray(x), jnp.asarray(masks), valid,
        interpret=True, split_matmul=True,
    )
    _, csr, cvr = _fused_moments_xla(
        jnp.asarray(x), jnp.asarray(masks), valid
    )
    # colsum rides the MXU in the split kernel (per-term ones-row
    # contraction, sequential f32 accumulate) while XLA uses a tree
    # reduce — both are f32-accumulation-grade, but association
    # differs: ~depth*eps/2 relative spread (measured 1.6e-6 at
    # depth 48; the reference's own sequential f32 accumulation has
    # the same class of error)
    assert np.allclose(cs, csr, rtol=1e-5)
    assert np.allclose(cv, cvr, rtol=1e-4, atol=1e-2)


def test_split_matmul_data_terms_bit_identical():
    """The value-specialized one-term path (u16 counting data with
    values <= 256 — every element exactly bf16-representable) must
    produce BIT-IDENTICAL projections and colsum vs the two-term
    dtype-derived path: the dropped residual term is exactly zero.
    The variance switches to the exact-integer raw-moment form —
    different association, same f32 grade (checked vs float64)."""
    rng = np.random.default_rng(21)
    depth, n_pix, M = 64, 512, 4
    x = rng.poisson(8.0, (depth, n_pix)).astype(np.uint16)
    assert x.max() <= 256
    masks = rng.normal(0, 1, (M, n_pix)).astype(np.float32)
    valid = jnp.int32(depth - 3)
    xz = x.copy()
    xz[depth - 3:] = 0
    out2 = _fused_moments_pallas(
        jnp.asarray(xz), jnp.asarray(masks), valid,
        interpret=True, split_matmul=True,
    )
    out1 = _fused_moments_pallas(
        jnp.asarray(xz), jnp.asarray(masks), valid,
        interpret=True, split_matmul=True, data_terms=1,
    )
    assert np.array_equal(np.asarray(out1[0]), np.asarray(out2[0]))
    assert np.array_equal(np.asarray(out1[1]), np.asarray(out2[1]))
    # and all outputs f32-exact vs float64
    exp = xz.astype(np.float64) @ masks.astype(np.float64).T
    assert np.allclose(np.asarray(out1[0], np.float64), exp,
                       rtol=1e-6, atol=1e-4)
    xv = xz[:depth - 3].astype(np.float64)
    ref_var = ((xv - xv.mean(axis=0)) ** 2).sum(axis=0)
    assert np.allclose(np.asarray(out1[2], np.float64), ref_var,
                       rtol=1e-5, atol=1e-3)


def test_raw_moment_var_constant_data_exact():
    """The raw-moment variance path is EXACT for constant blocks
    (mean is exact, x^2 exact, the subtraction cancels to 0) — the
    pathological case where global raw-moment variance catastrophically
    cancels; the per-tile + Chan form must return exactly 0."""
    depth, n_pix, M = 64, 512, 2
    x = np.full((depth, n_pix), 256, np.uint16)
    masks = np.ones((M, n_pix), np.float32)
    _, _, cv = _fused_moments_pallas(
        jnp.asarray(x), jnp.asarray(masks), jnp.int32(depth),
        interpret=True, split_matmul=True, data_terms=1,
    )
    assert np.all(np.asarray(cv) == 0.0)
    # u8 input takes the raw-moment path by dtype (native or split)
    xu8 = np.full((depth, n_pix), 200, np.uint8)
    _, _, cv8 = _fused_moments_pallas(
        jnp.asarray(xu8), jnp.asarray(masks), jnp.int32(depth),
        interpret=True,
    )
    assert np.all(np.asarray(cv8) == 0.0)


def test_raw_moment_var_multi_tile_boundary(monkeypatch):
    """Raw-moment variance across MULTIPLE row tiles (Chan combine)
    with the valid boundary inside a tile: padded zero rows must
    contribute exactly nothing without any mask."""
    monkeypatch.setenv("LIBERTEM_TPU_MOMENTS_TILE_MB", "1")
    rng = np.random.default_rng(23)
    depth, n_pix, M = 256, 4096, 3
    valid = 173  # boundary mid-tile (td=64 at this shape/budget)
    x = rng.poisson(40.0, (depth, n_pix)).astype(np.uint16)
    assert x.max() <= 256
    x[valid:] = 0
    masks = rng.random((M, n_pix)).astype(np.float32)
    _, cs, cv = _fused_moments_pallas(
        jnp.asarray(x), jnp.asarray(masks), jnp.int32(valid),
        interpret=True, split_matmul=True, data_terms=1,
    )
    xv = x[:valid].astype(np.float64)
    assert np.allclose(np.asarray(cs), xv.sum(axis=0), rtol=1e-6)
    ref_var = ((xv - xv.mean(axis=0)) ** 2).sum(axis=0)
    assert np.allclose(np.asarray(cv, np.float64), ref_var,
                       rtol=1e-5, atol=1e-2)


def test_block_data_terms_probe():
    """Host-feed value probe: 16-bit integer blocks with |x| <= 256
    certify 1 term; 32-bit integer / integer-valued f32 blocks (the
    post-corrected counting-data case) certify 1 or 2 terms by value
    range, on the active fused split path only."""
    from libertem_tpu.udf.base import UDFRunner

    prep = {
        "fused": object(), "corr_plan": None,
        "matmul_precision": jax.lax.Precision.HIGHEST,
    }
    small_u16 = np.full((4, 8), 200, np.uint16)
    big_u16 = np.full((4, 8), 257, np.uint16)
    small_i16 = np.full((4, 8), -200, np.int16)
    deep_i16 = np.full((4, 8), -300, np.int16)
    u8 = np.full((4, 8), 5, np.uint8)
    t = UDFRunner._block_data_terms
    assert t(prep, small_u16) == 1
    assert t(prep, big_u16) is None
    assert t(prep, small_i16) == 1
    assert t(prep, deep_i16) is None
    assert t(prep, u8) is None       # already one term by dtype
    # 32-bit integers: 1 term <= 256, 2 terms <= 65536, else None
    assert t(prep, np.full((4, 8), 200, np.int32)) == 1
    assert t(prep, np.full((4, 8), -200, np.int32)) == 1
    assert t(prep, np.full((4, 8), 60000, np.uint32)) == 2
    assert t(prep, np.full((4, 8), -60000, np.int32)) == 2
    assert t(prep, np.full((4, 8), 65536, np.int32)) == 2
    assert t(prep, np.full((4, 8), 65537, np.uint32)) is None
    # f32 holding exact integers — corrected counting data
    assert t(prep, np.full((4, 8), 200.0, np.float32)) == 1
    assert t(prep, np.full((4, 8), 60000.0, np.float32)) == 2
    f = np.full((4, 8), 200.0, np.float32)
    f[0, 0] = 1.5                    # one non-integer defeats it
    assert t(prep, f) is None
    f = np.full((4, 8), 200.0, np.float32)
    f[1, 1] = np.nan                 # NaN rejected by range check
    assert t(prep, f) is None
    f[1, 1] = np.inf
    assert t(prep, f) is None
    assert t(prep, np.full((4, 8), 70000.0, np.float32)) is None
    # endpoint-integrality early-out: integer min/max but fractional
    # interior must still be rejected by the element-wise round-trip
    f = np.full((4, 8), 100.0, np.float32)
    f[0, 0], f[3, 7] = 0.0, 256.0
    f[2, 3] = 0.25
    assert t(prep, f) is None
    # gates: corrections change values on device; native precision
    # runs single-pass anyway; non-fused path has no split kernel
    assert t({**prep, "corr_plan": object()}, small_u16) is None
    assert t({**prep, "matmul_precision": None}, small_u16) is None
    assert t({**prep, "fused": None}, small_u16) is None


def test_split_matmul_f32_certified_bit_identical():
    """f32 storage holding integer counts: the value certificate
    drops the three-term dtype-derived decomposition to 2 (|x| <=
    65536) or 1 (|x| <= 256) MXU passes with BIT-IDENTICAL
    projections and colsum — the dropped residual terms are exactly
    zero for such values."""
    rng = np.random.default_rng(31)
    depth, n_pix, M = 64, 512, 4
    base = rng.poisson(900.0, (depth, n_pix))
    x = base.astype(np.float32)      # integers to ~1100 in f32
    assert float(x.max()) <= 65536
    masks = rng.normal(0, 1, (M, n_pix)).astype(np.float32)
    valid = jnp.int32(depth - 5)
    x[depth - 5:] = 0
    out3 = _fused_moments_pallas(
        jnp.asarray(x), jnp.asarray(masks), valid,
        interpret=True, split_matmul=True,
    )
    out2 = _fused_moments_pallas(
        jnp.asarray(x), jnp.asarray(masks), valid,
        interpret=True, split_matmul=True, data_terms=2,
    )
    assert np.array_equal(np.asarray(out2[0]), np.asarray(out3[0]))
    assert np.array_equal(np.asarray(out2[1]), np.asarray(out3[1]))
    assert np.array_equal(np.asarray(out2[2]), np.asarray(out3[2]))
    # f64 oracle on the projections
    exp = x.astype(np.float64) @ masks.astype(np.float64).T
    assert np.allclose(np.asarray(out2[0], np.float64), exp,
                       rtol=1e-6, atol=1e-3)
    # small integer values: one pass, raw-moment variance engages
    xs = np.minimum(base, 256).astype(np.float32)
    xs[depth - 5:] = 0
    o3 = _fused_moments_pallas(
        jnp.asarray(xs), jnp.asarray(masks), valid,
        interpret=True, split_matmul=True,
    )
    o1 = _fused_moments_pallas(
        jnp.asarray(xs), jnp.asarray(masks), valid,
        interpret=True, split_matmul=True, data_terms=1,
    )
    assert np.array_equal(np.asarray(o1[0]), np.asarray(o3[0]))
    assert np.array_equal(np.asarray(o1[1]), np.asarray(o3[1]))
    xv = xs[:depth - 5].astype(np.float64)
    ref_var = ((xv - xv.mean(axis=0)) ** 2).sum(axis=0)
    assert np.allclose(np.asarray(o1[2], np.float64), ref_var,
                       rtol=1e-5, atol=1e-2)


def test_split_matmul_i32_certified():
    """Certified 32-bit integer storage takes the split path (cast
    via i32 in VMEM — exact for |x| <= 65536) and matches a float64
    oracle at f32 grade."""
    rng = np.random.default_rng(33)
    depth, n_pix, M = 32, 256, 3
    masks = rng.normal(0, 1, (M, n_pix)).astype(np.float32)
    for dt, terms in ((np.int32, 2), (np.uint32, 2),
                      (np.int32, 1), (np.uint32, 1)):
        hi = 256 if terms == 1 else 60000
        x = rng.integers(0, hi, (depth, n_pix)).astype(dt)
        if np.dtype(dt).kind == "i":
            x[1] = -x[1]
        out = _fused_moments_pallas(
            jnp.asarray(x), jnp.asarray(masks), jnp.int32(depth),
            interpret=True, split_matmul=True, data_terms=terms,
        )
        exp = x.astype(np.float64) @ masks.astype(np.float64).T
        rel = np.abs(np.asarray(out[0], np.float64) - exp) / (
            np.maximum(np.abs(exp), 1.0)
        )
        assert rel.max() < 1e-5, (dt, rel.max())
        assert np.allclose(
            np.asarray(out[1], np.float64),
            x.astype(np.float64).sum(axis=0), rtol=1e-6,
        )


def test_split_mask_terms_fold_proof():
    """The hoisted mask decomposition must survive XLA optimization
    UNDER JIT: with --xla_allow_excess_precision=true XLA folds a
    bf16 convert round-trip into the identity, which silently
    degenerated the split to [m, 0, 0] on hardware (round-5 fix:
    integer bit-masking, which cannot fold).  Each term must be
    exactly bf16-representable BY VALUE and the three must
    reconstruct m exactly."""
    from libertem_tpu.ops.moments import _split_mask_terms

    rng = np.random.default_rng(41)
    m = rng.normal(0, 1, (4, 256)).astype(np.float32)
    m0, m1, m2 = [
        np.asarray(t) for t in jax.jit(_split_mask_terms)(
            jnp.asarray(m)
        )
    ]
    # exact reconstruction
    assert np.array_equal(m0 + m1 + m2, m)
    # genuine decomposition — a folded round-trip gives m1 == 0
    assert np.count_nonzero(m1) > m.size * 0.9
    assert np.count_nonzero(m2) > m.size * 0.5
    # every term bf16-representable by VALUE (numpy round-trip is
    # ground truth — no XLA involved)
    import ml_dtypes
    for t in (m0, m1, m2):
        rt = t.astype(ml_dtypes.bfloat16).astype(np.float32)
        assert np.array_equal(rt, t)


def test_fused_dispatch_certified_routes_split(monkeypatch):
    """Dispatch contract: a value certificate makes ANY storage
    dtype split-eligible — i32 blocks (not _splittable) route to the
    Pallas split kernel when certified, and to XLA when not."""
    import libertem_tpu.ops.moments as moments

    calls = []

    def fake_pallas(x, m, v, **kw):
        calls.append(kw)
        return moments._fused_moments_xla(
            x, m, v, kw.get("compute_var", True), precision=None
        )

    monkeypatch.setattr(
        moments, "_fused_moments_pallas", fake_pallas
    )
    monkeypatch.setattr(
        moments.jax, "default_backend", lambda: "tpu"
    )
    x = np.ones((64, 256), np.int32)
    masks = np.ones((2, 256), np.float32)
    valid = jnp.int32(64)
    moments.fused_moments(
        x, masks, valid, precision=jax.lax.Precision.HIGHEST,
        data_terms=2,
    )
    assert calls and calls[-1]["split_matmul"] is True
    assert calls[-1]["data_terms"] == 2
    calls.clear()
    # uncertified i32 at HIGHEST: not splittable -> XLA fallback
    moments.fused_moments(
        x, masks, valid, precision=jax.lax.Precision.HIGHEST,
    )
    assert calls == []


def test_engine_value_specialized_run(lt_ctx):
    """End-to-end: the single-device loop threads the per-block
    certificate through the jitted step (static arg) — results match
    a run on data that defeats the certificate."""
    from libertem_tpu import masks as mask_lib
    from libertem_tpu.io.dataset.memory import MemoryDataSet
    from libertem_tpu.udf import ApplyMasksUDF, SumUDF

    ctx = lt_ctx
    rng = np.random.default_rng(22)
    small = rng.poisson(5.0, (4, 4, 16, 16)).astype(np.uint16)
    mixed = small.copy()
    mixed[0, 0, 0, 0] = 40000  # one hot pixel defeats the certificate
    for data in (small, mixed):
        ds = MemoryDataSet(data=data, sig_dims=2).initialize()
        udfs = [
            ApplyMasksUDF(mask_factories=[
                lambda: mask_lib.circular(8, 8, 16, 16, 5),
            ]),
            SumUDF(),
        ]
        res = ctx.run_udf(ds, udfs)
        exp_int = (
            data.reshape(-1, 256).astype(np.float64)
            @ mask_lib.circular(8, 8, 16, 16, 5).reshape(-1)
        )
        got = np.asarray(
            res[0]["intensity"].data
        ).reshape(-1)
        assert np.allclose(got, exp_int, rtol=1e-5)
        assert np.allclose(
            np.asarray(res[1]["intensity"].data),
            data.reshape(-1, 16, 16).sum(axis=0), rtol=1e-5,
        )


def test_fused_dispatch_split_eligibility():
    """Dispatch contract: at Precision.HIGHEST the split path covers
    narrow ints AND f32; i32/f64 stay on XLA (would need 4 byte
    terms / f64 splits)."""
    from libertem_tpu.ops.moments import _splittable

    mk = lambda dt: np.zeros((8, 128), dtype=dt)
    assert _splittable(mk(np.uint8))
    assert _splittable(mk(np.int8))
    assert _splittable(mk(np.uint16))
    assert _splittable(mk(np.int16))
    assert _splittable(mk(np.float32))
    assert not _splittable(mk(np.int32))
    assert not _splittable(mk(np.float64))


def test_precision_env_flips_between_runs(lt_ctx, monkeypatch):
    """LIBERTEM_TPU_MATMUL_PRECISION is latched per RUN, not per
    process (round-2/3 advisor): _prepare re-reads the env, so a
    mid-process flip changes the precision threaded into the fused
    kernel on the very next run — no stale cached executable.

    CPU ignores lax.Precision numerically, so assert on the value the
    engine actually hands to the op instead of on result bits."""
    import jax
    import libertem_tpu.ops.moments as moments
    from libertem_tpu.udf.masks import ApplyMasksUDF
    from libertem_tpu.io.dataset.memory import MemoryDataSet

    data = np.random.default_rng(7).random(
        (4, 4, 16, 16)
    ).astype(np.float32)
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=2
    ).initialize()
    udf = ApplyMasksUDF(
        mask_factories=[lambda: np.ones((16, 16), np.float32)],
    )
    seen = []
    real = moments.fused_moments

    def spy(*a, **kw):
        seen.append(kw.get("precision", "MISSING"))
        return real(*a, **kw)

    monkeypatch.setattr(moments, "fused_moments", spy)

    monkeypatch.setenv("LIBERTEM_TPU_MATMUL_PRECISION", "highest")
    lt_ctx.run_udf(ds, udf)
    assert seen and all(
        p is jax.lax.Precision.HIGHEST for p in seen
    ), seen

    seen.clear()
    monkeypatch.setenv("LIBERTEM_TPU_MATMUL_PRECISION", "default")
    lt_ctx.run_udf(ds, udf)
    assert seen and all(p is None for p in seen), seen
