"""StdDevUDF: single-pass parallel variance.

Counterpart of the reference's ``libertem/udf/stddev.py`` (tile kernel
:124, pairwise merge :12–122, results :455, run_stddev :501) using the
Chan/Golub/LeVeque parallel-variance combine — the same algebra, but as
a traced jnp update fused into the tile step instead of a numba kernel.

Padding-aware: uses ``self.meta.valid_frames`` so zero-padded tail rows
don't pollute the statistics.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .base import UDF


def _abs2(x):
    """|x|^2, real-valued for complex inputs without the sqrt
    round-trip of abs()**2; delta*delta unchanged for real data."""
    if jnp.iscomplexobj(x):
        return (x * jnp.conj(x)).real
    return x * x


def _combine(n0, sum0, varsum0, n1, sum1, varsum1):
    """Combine two (count, sum, varsum) variance states."""
    n = n0 + n1
    safe_n = jnp.maximum(n, 1)
    safe_n0 = jnp.maximum(n0, 1)
    safe_n1 = jnp.maximum(n1, 1)
    mean0 = sum0 / safe_n0
    mean1 = sum1 / safe_n1
    delta = mean1 - mean0
    # |delta|^2 keeps the variance REAL for complex data (reference
    # stddev.py:70 takes the absolute for the same reason)
    corr = _abs2(delta) * (n0 * n1 / safe_n)
    varsum = jnp.where(
        n0 == 0, varsum1,
        jnp.where(n1 == 0, varsum0, varsum0 + varsum1 + corr),
    )
    return n, sum0 + sum1, varsum


class StdDevUDF(UDF):
    """Per-pixel mean / variance / std over all frames in one pass."""

    def get_result_buffers(self):
        # complex data keeps complex sums/means; the variance of a
        # complex variable is REAL (E|x - mean|^2) — reference
        # stddev.py:70 takes the absolute for the same reason
        sum_dtype = np.result_type(self.meta.input_dtype, np.float32)
        if sum_dtype.kind == "c":
            sum_dtype = np.dtype(np.complex64)
        else:
            sum_dtype = np.dtype(np.float32)
        return {
            "num_frames": self.buffer(kind="single", dtype="float32"),
            "sum": self.buffer(kind="sig", dtype=sum_dtype),
            "varsum": self.buffer(kind="sig", dtype="float32"),
            "var": self.buffer(kind="sig", dtype="float32",
                               use="result_only"),
            "std": self.buffer(kind="sig", dtype="float32",
                               use="result_only"),
            "mean": self.buffer(kind="sig", dtype=sum_dtype,
                                use="result_only"),
        }

    def process_tile(self, tile):
        n1 = self.meta.valid_frames.astype(jnp.float32)
        safe_n1 = jnp.maximum(n1, 1.0)
        sum1 = tile.sum(axis=0)
        mean1 = sum1 / safe_n1
        vmask = self.meta.tile_valid.reshape(
            (-1,) + (1,) * (tile.ndim - 1)
        )
        diff = (tile - mean1) * vmask
        varsum1 = _abs2(diff).sum(axis=0)
        n, s, v = _combine(
            self.results.num_frames, self.results.sum,
            self.results.varsum, n1, sum1, varsum1,
        )
        # with a sig-tiled scheme every sig slice sees the same frames:
        # update the (single-kind) frame count only once per tile, on
        # the *last* slice so earlier slices still read the old count
        if (
            self.meta.tiling_scheme is None
            or self.meta.tiling_scheme_idx
            == len(self.meta.tiling_scheme) - 1
        ):
            self.results.num_frames = n
        self.results.sum = s
        self.results.varsum = v

    def fused_moments_spec(self):
        """Fused pass: consumes the shared colsum/colvar moments."""
        return {"mode": "stats"}

    def merge(self, dest, src):
        n, s, v = _combine(
            dest.num_frames, dest.sum, dest.varsum,
            src.num_frames, src.sum, src.varsum,
        )
        dest.num_frames = n
        dest.sum = s
        dest.varsum = v

    def get_results(self):
        n = max(float(np.asarray(self.results.num_frames).reshape(())), 1.0)
        var = self.results.varsum / n
        return {
            "var": var,
            "std": np.sqrt(var),
            "mean": self.results.sum / n,
        }


def run_stddev(ctx, dataset, roi=None, progress=False,
               use_numba=True):
    """Convenience wrapper (reference stddev.py:501); ``use_numba``
    picks the reference's CPU kernel flavor — meaningless on the
    device path, accepted for signature parity."""
    res = ctx.run_udf(
        dataset, StdDevUDF(), roi=roi, progress=progress
    )
    return {
        k: res[k].data
        for k in ("num_frames", "sum", "varsum", "var", "std", "mean")
    }


# -- reference-named numeric primitives ---------------------------------
# (reference stddev.py:12/75/124 — numba kernels there; vectorized
# numpy here.  The same Schubert & Gertz 2018 one-pass combine the
# device kernel uses, exposed for host-side code ported from the
# reference.)

def merge_single(n, n_0, sum_0, varsum_0, n_1, sum_1, varsum_1,
                 mean_1):
    """Numerically stable combine of (sum, varsum) aggregates
    (reference stddev.py:12); works elementwise on arrays.  The
    abs() makes the cross term real/positive for complex data."""
    mean_0 = sum_0 / n_0
    delta = mean_1 - mean_0
    mean = mean_0 + (n_1 * delta) / n
    partial_delta = mean_1 - mean
    varsum = varsum_0 + varsum_1 + (
        n_1 * np.abs(delta) * np.abs(partial_delta)
    )
    return sum_0 + sum_1, varsum


def merge(dest_n, dest_sum, dest_varsum, src_n, src_sum, src_varsum,
          src_mean):
    """Merge src aggregation buffers into dest IN PLACE; returns the
    new frame count (reference stddev.py:75)."""
    if dest_n == 0:
        dest_sum[:] = src_sum
        dest_varsum[:] = src_varsum
        return src_n
    if src_n == 0:
        # empty partitions happen with sync offsets
        return dest_n
    n = dest_n + src_n
    s, v = merge_single(
        n, dest_n, dest_sum, dest_varsum,
        src_n, src_sum, src_varsum, src_mean,
    )
    dest_sum[:] = s
    dest_varsum[:] = v
    return n


def process_tile(tile, n_0, sum_inout, varsum_inout):
    """Fold a (frames, pixels) tile into the aggregation buffers IN
    PLACE; returns the new frame count (reference stddev.py:124)."""
    n_frames = tile.shape[0]
    if n_frames == 0:
        return n_0
    tile_sum = tile.sum(axis=0)
    mean = tile_sum / n_frames
    tile_varsum = (np.abs(tile - mean) ** 2).sum(axis=0)
    return merge(
        n_0, sum_inout, varsum_inout,
        n_frames, tile_sum, tile_varsum, mean,
    )
