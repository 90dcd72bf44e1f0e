"""Format x sharded-executor matrix: every file-backed format runs
under the mesh executor on the virtual 8-device CPU mesh, validated
with the tile-stream oracle.

The reference runs its canonical UDF set over ALL executor kinds x
~19 formats (tests/executor/test_functional.py:40); the inline half
of that matrix lives in test_matrix.py — this file is the sharded
half, exercising the per-device host feed (chunk assembly, reader
pool, zero-padding) for each format's real reader.
"""
import numpy as np
import pytest

from test_matrix import MAKERS, built  # noqa: F401  (fixture)
from utils import ValidationUDF

from libertem_tpu.api import Context
from libertem_tpu.executor.sharded import ShardedJobExecutor
from libertem_tpu.io.corrections import CorrectionSet
from libertem_tpu.udf import SumSigUDF, SumUDF


@pytest.fixture(scope="module")
def sharded_ctx():
    return Context(executor=ShardedJobExecutor())


@pytest.mark.parametrize("fmt", sorted(MAKERS))
def test_sharded_format_validation(sharded_ctx, built, fmt):  # noqa: F811
    """Tile-stream oracle under the mesh: each device shard must see
    exactly the file's frames, in global order, zero semantics at
    shard tails included."""
    loader, kwargs, flat = built(fmt)
    ds = sharded_ctx.load(loader, **kwargs)
    udf = ValidationUDF(ref_flat=flat.astype(np.float64), rtol=1e-6)
    res = sharded_ctx.run_udf(ds, udf)
    assert (res["seen"].raw_data == 1.0).all(), f"{fmt}: unvalidated"


@pytest.mark.parametrize("fmt", sorted(MAKERS))
def test_sharded_format_sums(sharded_ctx, built, fmt):  # noqa: F811
    """Numeric spot-check on the device path (fused reductions +
    cross-shard fold) against plain numpy."""
    loader, kwargs, flat = built(fmt)
    ds = sharded_ctx.load(loader, **kwargs)
    res = sharded_ctx.run_udf(ds, [SumUDF(), SumSigUDF()])
    ref = flat.astype(np.float64)
    # atol: f32 accumulation differs between the shard fold and
    # numpy's pairwise sum — near-zero pixel sums (float formats)
    # carry ~1e-5 absolute noise at rel ~1e-6 of the data scale
    scale = max(1.0, float(np.abs(ref).max()))
    assert np.allclose(
        res[0]["intensity"].data, ref.sum(axis=0),
        rtol=1e-4, atol=1e-5 * scale * len(ref),
    ), fmt
    assert np.allclose(
        res[1]["intensity"].data.reshape(-1),
        ref.sum(axis=(1, 2)), rtol=1e-4,
    ), fmt


@pytest.mark.parametrize("fmt", ["raw", "mib", "hdf5"])
def test_sharded_kitchen_sink(sharded_ctx, built, fmt):  # noqa: F811
    """sync_offset + sparse roi + corrections, all at once, on the
    mesh (the inline twin is test_matrix.py 'kitchen')."""
    loader, kwargs, flat = built(fmt)
    kwargs = dict(kwargs)
    sync = 2
    kwargs["sync_offset"] = sync
    ds = sharded_ctx.load(loader, **kwargs)

    n = len(flat)
    sig = flat.shape[1:]
    expected = np.zeros_like(flat, dtype=np.float64)
    expected[:n - sync] = flat[sync:]

    roi = np.zeros(n, dtype=bool)
    roi[[1, n // 2, n - 2]] = True
    expected = expected[roi]

    rng = np.random.default_rng(4)
    dark = rng.normal(2.0, 0.5, sig).astype(np.float32)
    gain = (1 + 0.1 * rng.random(sig)).astype(np.float32)
    corrections = CorrectionSet(dark=dark, gain=gain)
    expected = (expected - dark) * gain

    udf = ValidationUDF(ref_flat=expected, rtol=1e-4)
    res = sharded_ctx.run_udf(
        ds, udf, roi=roi, corrections=corrections
    )
    assert (res["seen"].raw_data == 1.0).all(), fmt
