"""Block-compacted sparse mask stacks
(ops/sparse_masks.py — TPU counterpart of the reference's
scipy.sparse/pydata mask kernels, common/numba/__init__.py:90)."""
import numpy as np
import pytest

from libertem_tpu import masks as mask_lib
from libertem_tpu.io.dataset.memory import MemoryDataSet
from libertem_tpu.ops.sparse_masks import (
    block_support, compact_operand, gather_blocks, plan_compaction,
)
from libertem_tpu.udf import ApplyMasksUDF, SumUDF
from libertem_tpu.udf.base import UDFRunner

from conftest import _mk_random


def test_block_support_and_compact():
    rng = np.random.default_rng(0)
    m, p = 5, 1000  # not a multiple of 128 -> tail block
    stack = np.zeros((m, p), dtype=np.float32)
    # nonzeros confined to blocks 1 and 7 (tail, 1000//128=7 blocks+tail)
    stack[0, 130:140] = rng.random(10)
    stack[3, 900:950] = rng.random(50)
    support, nb = block_support(stack)
    assert nb == 8
    assert support.tolist() == [1, 7]
    op = compact_operand(stack, support)
    assert op.shape == (2 * 128, m)
    # matmul equality vs dense
    x = rng.random((16, p)).astype(np.float32)
    import jax.numpy as jnp
    g = np.asarray(gather_blocks(jnp.asarray(x), support))
    y_sparse = g @ op
    pad = np.zeros((16, 8 * 128 - p), dtype=np.float32)
    y_dense = np.concatenate([x, pad], 1) @ np.concatenate(
        [stack, np.zeros((m, 8 * 128 - p), np.float32)], 1
    ).T
    assert np.allclose(y_sparse, y_dense, rtol=1e-5)


def test_plan_compaction_threshold():
    # dense ring stack: support nearly full -> no compaction
    h = w = 64
    rings = mask_lib.radial_bins(31.5, 31.5, w, h, radius=30,
                                 n_bins=4)
    plan = plan_compaction(rings.reshape(4, -1))
    assert plan is None
    # center-clustered template stack (diffraction peaks cluster near
    # the pattern center) -> compaction pays.  Note the 128-px block
    # granularity: support must be row-clustered to compact.
    rng = np.random.default_rng(2)
    temps = mask_lib.sparse_template_multi_stack(
        mask_index=np.arange(16),
        offsetY=rng.integers(26, 36, 16),
        offsetX=rng.integers(20, 40, 16),
        template=np.ones((3, 3), np.float32),
        imageSizeY=h, imageSizeX=w,
    )
    dense = np.asarray(temps if isinstance(temps, np.ndarray)
                       else temps.todense() if hasattr(temps, "todense")
                       else temps)
    plan = plan_compaction(dense.reshape(16, -1))
    assert plan is not None
    assert plan["fill"] < 0.5


def test_apply_masks_compacted_matches_dense(lt_ctx):
    """ApplyMasksUDF auto-compacts tiny-template stacks; results are
    identical to the dense path."""
    h = w = 64
    data = _mk_random((4, 5, h, w), dtype="float32")
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=2
    ).initialize()
    n_peaks = 24
    rng = np.random.default_rng(1)
    # peaks clustered near the pattern center (rows 24..40) so the
    # union support is block-compactable
    py = rng.integers(24, 40, n_peaks)
    px = rng.integers(4, w - 4, n_peaks)

    def factory():
        return mask_lib.sparse_template_multi_stack(
            mask_index=np.arange(n_peaks),
            offsetY=py - 2, offsetX=px - 2,
            template=np.ones((5, 5), np.float32),
            imageSizeY=h, imageSizeX=w,
        )

    udf = ApplyMasksUDF(mask_factories=factory, mask_count=n_peaks)
    # the compaction plan is active
    runner = UDFRunner([udf])
    prep = runner._prepare(ds, None, None, None)
    assert prep["fused"] is not None
    assert prep["fused"]["compaction"] is not None
    assert prep["fused"]["compaction"]["fill"] < 0.5
    res = runner.run_for_dataset(ds)
    # naive dense reference
    stack = np.asarray(factory())
    if stack.ndim != 3:
        stack = stack.reshape(n_peaks, h, w)
    flat = data.reshape(-1, h * w).astype(np.float64)
    expected = flat @ stack.reshape(n_peaks, -1).T.astype(np.float64)
    got = res.buffers[0]["intensity"].data.reshape(-1, n_peaks)
    assert np.allclose(got, expected, rtol=1e-4, atol=1e-3)


def test_compaction_disabled_with_stats_pass(lt_ctx):
    """A fused pass that also needs per-pixel colsum (SumUDF) cannot
    compact — correctness of the full-frame reductions wins."""
    h = w = 64
    data = _mk_random((3, 4, h, w), dtype="float32")
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=2
    ).initialize()

    def factory():
        return mask_lib.sparse_template_multi_stack(
            mask_index=np.arange(4),
            offsetY=np.arange(4) * 5, offsetX=np.arange(4) * 5,
            template=np.ones((3, 3), np.float32),
            imageSizeY=h, imageSizeX=w,
        )

    udfs = [
        ApplyMasksUDF(mask_factories=factory, mask_count=4),
        SumUDF(),
    ]
    runner = UDFRunner(udfs)
    prep = runner._prepare(ds, None, None, None)
    assert prep["fused"] is not None
    assert prep["fused"]["compaction"] is None
    res = runner.run_for_dataset(ds)
    assert np.allclose(
        res.buffers[1]["intensity"].data,
        data.sum(axis=(0, 1)), rtol=1e-4, atol=1e-3,
    )


def test_compacted_generic_path_with_pydata_style_masks(lt_ctx):
    """Sparse (scipy) mask objects flow through the compacted generic
    process_tile path (non-fused: complex masks force it)."""
    import scipy.sparse as sp
    h = w = 64
    data = _mk_random((3, 3, h, w), dtype="float32")
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=1
    ).initialize()
    dense_mask = np.zeros((h, w), np.float32)
    dense_mask[10:13, 20:23] = 1.5

    def factory():
        return sp.csr_matrix(dense_mask)

    res = lt_ctx.run_udf(
        ds, ApplyMasksUDF(mask_factories=[factory])
    )
    flat = data.reshape(-1, h * w).astype(np.float64)
    expected = flat @ dense_mask.reshape(-1).astype(np.float64)
    assert np.allclose(
        res["intensity"].data.reshape(-1), expected, rtol=1e-4,
    )


def test_implicit_f64_masks_stay_on_device(lt_ctx):
    """Implicit float64 factory output — numpy's DEFAULT dtype — is
    NOT a precision demand: the run stays on the fused/compacted
    device path with f32 operands (round-4 regression pin: reading
    the implicit dtype as a demand silently evicted whole runs to
    the single-threaded host engine).  Reference dtype algebra:
    udf/masks.py:311 — but the device-residency decision is this
    framework's own."""
    h = w = 64
    data = _mk_random((3, 4, h, w), dtype="float32")
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=2
    ).initialize()

    def f64_factory():
        # np.ones defaults to float64 — the common user factory
        return np.ones((h, w)) * 0.5

    udf = ApplyMasksUDF(mask_factories=[f64_factory])
    runner = UDFRunner([udf])
    prep = runner._prepare(ds, None, None, None)
    assert udf.get_backends() == (udf.BACKEND_JAX,)
    assert prep["fused"] is not None, (
        "implicit-f64 masks must not evict the fused device path"
    )
    res = runner.run_for_dataset(ds)
    got = np.asarray(res.buffers[0]["intensity"].data).reshape(-1)
    expected = data.reshape(-1, h * w).astype(np.float64).sum(1) * 0.5
    assert np.allclose(got, expected, rtol=1e-4)
    # the repo's own sparse factory builds f64 too — the compacted
    # MXU path must trigger for it (the round-4 failure mode)
    def sparse_factory():
        return mask_lib.sparse_template_multi_stack(
            mask_index=np.arange(4),
            offsetY=np.full(4, 28), offsetX=np.arange(4) * 8 + 10,
            template=np.ones((5, 5)),  # implicit float64
            imageSizeY=h, imageSizeX=w,
        )
    udf2 = ApplyMasksUDF(mask_factories=sparse_factory, mask_count=4)
    prep2 = UDFRunner([udf2])._prepare(ds, None, None, None)
    assert prep2["fused"] is not None
    assert prep2["fused"]["compaction"] is not None


def test_explicit_64bit_routes_host(lt_ctx):
    """An EXPLICIT 64-bit request — mask_dtype=/dtype= kwarg or a
    64-bit dataset dtype — is a precision demand and routes to the
    host engine with real numpy f64 accumulation (reference numerics
    contract, test_numerics_succeed)."""
    h = w = 32
    data = _mk_random((2, 3, h, w), dtype="float32")
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=1
    ).initialize()

    def factory():
        return np.ones((h, w))

    # explicit mask_dtype=np.float64 -> host (no meta needed: the
    # kwarg check is static)
    udf = ApplyMasksUDF(mask_factories=[factory],
                        mask_dtype=np.float64)
    assert udf.get_backends() == (udf.BACKEND_NUMPY,)
    # explicit preferred dtype=np.float64 -> host
    udf = ApplyMasksUDF(mask_factories=[factory], dtype=np.float64)
    assert udf.get_backends() == (udf.BACKEND_NUMPY,)
    # float64 DATASET -> host (the data itself carries >f32 precision)
    ds64 = MemoryDataSet(
        data=data.astype(np.float64), sig_dims=2, num_partitions=1
    ).initialize()
    udf = ApplyMasksUDF(mask_factories=[factory])
    runner = UDFRunner([udf])
    runner._prepare(ds64, None, None, None)
    assert udf.get_backends() == (udf.BACKEND_NUMPY,)
    res = runner.run_for_dataset(ds64)
    got = np.asarray(res.buffers[0]["intensity"].data).reshape(-1)
    expected = data.reshape(-1, h * w).astype(np.float64).sum(1)
    assert got.dtype == np.float64
    assert np.allclose(got, expected, rtol=1e-12)


def test_apply_masks_bf16_optin(lt_ctx):
    """use_bf16=True: matmul inputs in bfloat16, f32 accumulation —
    results within the documented ~0.4% precision contract."""
    h = w = 32
    data = _mk_random((4, 4, h, w), dtype="float32")
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=2
    ).initialize()
    mask = np.random.default_rng(0).random((h, w)).astype(np.float32)
    res16 = lt_ctx.run_udf(ds, ApplyMasksUDF(
        mask_factories=[lambda: mask], use_bf16=True,
    ))
    res32 = lt_ctx.run_udf(ds, ApplyMasksUDF(
        mask_factories=[lambda: mask],
    ))
    a = np.asarray(res16["intensity"].data, np.float64).reshape(-1)
    b = np.asarray(res32["intensity"].data, np.float64).reshape(-1)
    assert np.allclose(a, b, rtol=1e-2)
    assert not np.allclose(a, b, rtol=1e-7)  # really ran in bf16
