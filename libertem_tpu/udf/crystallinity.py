"""CrystallinityUDF: per-frame FFT ring integration
(reference: libertem/udf/crystallinity.py:7).

Device path: batched 2D FFT over the tile (XLA-native), |.|, multiply
by a static fftshifted ring mask, reduce over sig → one value per
frame.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import UDF


class CrystallinityUDF(UDF):
    def __init__(self, rad_in=None, rad_out=None, **kwargs):
        super().__init__(rad_in=rad_in, rad_out=rad_out, **kwargs)
        self._mask = None

    def get_result_buffers(self):
        return {
            "intensity": self.buffer(kind="nav", dtype="float32"),
        }

    def get_tiling_preferences(self):
        # FFT needs whole frames
        return {
            "depth": self.TILE_DEPTH_DEFAULT,
            "total_size": self.TILE_SIZE_MAX,
        }

    def _get_mask(self):
        if self._mask is not None:
            return self._mask
        h, w = self.meta.sig_shape
        cy, cx = h // 2, w // 2
        y, x = np.ogrid[0:h, 0:w]
        d = np.sqrt((y - cy) ** 2 + (x - cx) ** 2)
        sel = (d >= self.params.rad_in) & (d < self.params.rad_out)
        # pre-apply ifftshift so we skip the shift on the FFT output
        # (numpy cache — tracer-safe)
        self._mask = np.fft.ifftshift(sel).astype(np.float32)
        return self._mask

    def process_tile(self, tile):
        mask = jnp.asarray(self._get_mask())
        spec = jnp.abs(jnp.fft.fft2(tile.astype(jnp.float32)))
        self.results.intensity += (spec * mask).sum(axis=(1, 2))


def run_analysis_crystall(ctx, dataset, rad_in, rad_out, roi=None):
    return ctx.run_udf(
        dataset, CrystallinityUDF(rad_in=rad_in, rad_out=rad_out),
        roi=roi,
    )
