"""SumUDF: sum all frames (reference: libertem/udf/sum.py:6)."""
from __future__ import annotations

import numpy as np

from .base import UDF


class SumUDF(UDF):
    """Sum over the navigation axis → one (*sig) image."""

    def __init__(self, dtype="float32"):
        super().__init__(dtype=dtype)

    def get_result_buffers(self):
        dtype = np.result_type(self.params.dtype, self.meta.input_dtype)
        # keep the declaration honest: without jax x64, device state
        # canonicalizes f64->f32 / c128->c64, so a f64 declaration
        # would silently accumulate in f32 (same downgrade as
        # ApplyMasksUDF)
        if dtype == np.float64:
            dtype = np.dtype(np.float32)
        if dtype == np.complex128:
            dtype = np.dtype(np.complex64)
        return {
            "intensity": self.buffer(kind="sig", dtype=dtype),
        }

    def process_tile(self, tile):
        self.results.intensity += tile.sum(axis=0)

    def merge(self, dest, src):
        dest.intensity = dest.intensity + src.intensity

    def fused_moments_spec(self):
        """Join the cross-UDF fused moments pass (udf/base.py
        _build_fused_plan): consumes the shared per-pixel column sum."""
        dtype = np.result_type(self.params.dtype, self.meta.input_dtype)
        # apply the same device downgrade as get_result_buffers:
        # f64 runs accumulate in f32 either way, so fusion stays on
        if dtype == np.float64:
            dtype = np.dtype(np.float32)
        if np.dtype(dtype) != np.float32:
            return None
        return {"mode": "colsum", "name": "intensity"}
