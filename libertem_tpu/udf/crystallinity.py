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
    def __init__(self, rad_in=None, rad_out=None, real_center=None,
                 real_rad=None, **kwargs):
        super().__init__(
            rad_in=rad_in, rad_out=rad_out, real_center=real_center,
            real_rad=real_rad, **kwargs
        )
        self._mask = None
        self._real_mask = None
        self._mask_key = None

    def on_params_updated(self):
        self._mask = None
        self._real_mask = None
        self._mask_key = None

    def get_result_buffers(self):
        return {
            "intensity": self.buffer(kind="nav", dtype="float32"),
        }

    def get_tiling_preferences(self):
        # FFT needs whole frames
        return {
            "whole_frames": True,
            "depth": self.TILE_DEPTH_DEFAULT,
            "total_size": self.TILE_SIZE_MAX,
        }

    def _get_masks(self):
        """Reference semantics (crystallinity.py:47-74): the Fourier
        ring is disk(rad_out) - disk(rad_in) centered at
        (h*0.5, w*0.5), fftshifted, restricted to the rfft2 half-plane
        (columns 0..w//2); the optional real-space mask blanks a
        central disk before the FFT."""
        key = tuple(self.meta.sig_shape)
        if self._mask is not None and self._mask_key == key:
            return self._mask, self._real_mask
        from ..masks import circular

        h, w = key
        out = circular(w * 0.5, h * 0.5, w, h,
                       self.params.rad_out).astype(np.float32)
        inn = circular(w * 0.5, h * 0.5, w, h,
                       self.params.rad_in).astype(np.float32)
        fmask = np.fft.fftshift(out - inn)
        # full-plane fft2 equals rfft2 on columns 0..w//2; zero the
        # redundant conjugate columns so the half-plane sum matches
        fmask[:, w // 2 + 1:] = 0.0
        self._mask = fmask
        self._mask_key = key
        self._real_mask = None
        rc, rr = self.params.real_center, self.params.real_rad
        if rc is not None and rr is not None:
            self._real_mask = 1.0 - circular(
                rc[1], rc[0], w, h, rr
            ).astype(np.float32)
        return self._mask, self._real_mask

    def process_tile(self, tile):
        fmask, real_mask = self._get_masks()
        frames = tile.astype(jnp.float32)
        if real_mask is not None:
            frames = frames * jnp.asarray(real_mask)
        spec = jnp.abs(jnp.fft.fft2(frames))
        self.results.intensity += (
            spec * jnp.asarray(fmask)
        ).sum(axis=(1, 2))


def run_analysis_crystall(ctx, dataset, rad_in, rad_out,
                          real_center=None, real_rad=None, roi=None,
                          progress=False):
    """Convenience wrapper (reference crystallinity.py:82)."""
    return ctx.run_udf(
        dataset,
        CrystallinityUDF(
            rad_in=rad_in, rad_out=rad_out,
            real_center=real_center, real_rad=real_rad,
        ),
        roi=roi, progress=progress,
    )
