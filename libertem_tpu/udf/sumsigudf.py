"""SumSigUDF: per-frame sum over the signal axes
(reference: libertem/udf/sumsigudf.py:6)."""
from __future__ import annotations

from .base import UDF


class SumSigUDF(UDF):
    """Sum over the signal axes → one value per navigation position."""

    def get_result_buffers(self):
        return {
            "intensity": self.buffer(
                kind="nav", dtype=self.meta.input_dtype
            ),
        }

    def process_tile(self, tile):
        sig_axes = tuple(range(1, tile.ndim))
        self.results.intensity += tile.sum(axis=sig_axes)

    def fused_moments_spec(self):
        """Fused pass: per-frame sig sum == a ones mask column."""
        import numpy as np
        if np.dtype(self.meta.input_dtype) != np.float32:
            return None
        return {"mode": "sumsig", "name": "intensity"}
