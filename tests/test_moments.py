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
