"""LogsumUDF: sum of log-scaled frames
(reference: libertem/udf/logsum.py:6).

Each frame is shifted by its minimum before log1p, then summed over
nav.  Zero-padded tail rows contribute log1p(0) == 0 and are masked
out anyway.
"""
from __future__ import annotations

import jax.numpy as jnp

from .base import UDF


class LogsumUDF(UDF):
    def get_result_buffers(self):
        return {
            "logsum": self.buffer(kind="sig", dtype="float32"),
        }

    def get_tiling_preferences(self):
        # needs whole frames for the per-frame minimum
        return {
            "whole_frames": True,
            "depth": self.TILE_DEPTH_DEFAULT,
            "total_size": self.TILE_SIZE_MAX,
        }

    def process_tile(self, tile):
        sig_axes = tuple(range(1, tile.ndim))
        mn = tile.min(axis=sig_axes, keepdims=True)
        contrib = jnp.log1p(tile - mn)
        vmask = self.meta.tile_valid.reshape(
            (-1,) + (1,) * (tile.ndim - 1)
        )
        self.results.logsum += (contrib * vmask).sum(axis=0)

    def merge(self, dest, src):
        dest.logsum = dest.logsum + src.logsum


def run_logsum(ctx, dataset, roi=None, progress=False):
    res = ctx.run_udf(dataset, LogsumUDF(), roi=roi, progress=progress)
    return res
