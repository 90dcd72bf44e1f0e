"""FEMUDF: fluctuation electron microscopy — per-frame standard
deviation over a ring of detector pixels
(reference: libertem/udf/FEM.py:7).

Device path: a static gather of the ring pixels + per-frame moment
reduction, vectorized over the tile depth (no per-frame Python loop).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import UDF


class FEMUDF(UDF):
    def __init__(self, center=None, rad_in=None, rad_out=None, **kwargs):
        super().__init__(
            center=center, rad_in=rad_in, rad_out=rad_out, **kwargs
        )
        self._ring_idx = None
        self._ring_key = None

    def on_params_updated(self):
        self._ring_idx = None
        self._ring_key = None

    def get_tiling_preferences(self):
        # the ring gather indexes into the flattened WHOLE frame;
        # a sig-split tile would clamp the gather silently
        return {"whole_frames": True,
                "depth": self.TILE_DEPTH_DEFAULT,
                "total_size": self.TILE_SIZE_MAX}

    @classmethod
    def with_params(cls, cy=None, cx=None, ri=None, ro=None):
        return cls(center=(cy, cx), rad_in=ri, rad_out=ro)

    def get_result_buffers(self):
        return {
            "intensity": self.buffer(kind="nav", dtype="float32"),
        }

    def _get_ring_idx(self):
        key = tuple(self.meta.sig_shape)
        if self._ring_idx is not None and self._ring_key == key:
            return self._ring_idx
        h, w = key
        cy, cx = self.params.center
        y, x = np.ogrid[0:h, 0:w]
        d = np.sqrt((y - cy) ** 2 + (x - cx) ** 2)
        # reference ring semantics (FEM.py:48: disk(out) - disk(in)
        # with d <= r disks): rad_in < d <= rad_out
        sel = (d > self.params.rad_in) & (d <= self.params.rad_out)
        idx = np.flatnonzero(sel.reshape(-1))
        if len(idx) == 0:
            raise ValueError("FEM ring selects no pixels")
        # numpy cache (tracer-safe), keyed by sig shape — a UDF
        # instance reused on a second dataset must not apply the
        # first dataset's flat pixel indices
        self._ring_idx = idx.astype(np.int32)
        self._ring_key = key
        return self._ring_idx

    def process_tile(self, tile):
        idx = jnp.asarray(self._get_ring_idx())
        flat = tile.reshape(tile.shape[0], -1)
        vals = flat[:, idx].astype(jnp.float32)  # (depth, ring)
        self.results.intensity += jnp.std(vals, axis=1)


def run_fem(ctx, dataset, center, rad_in, rad_out, roi=None):
    """Convenience wrapper (reference FEM.py:run_fem)."""
    return ctx.run_udf(
        dataset,
        FEMUDF(center=center, rad_in=rad_in, rad_out=rad_out),
        roi=roi,
    )
