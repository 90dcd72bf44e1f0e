"""PickUDF: extract raw frames under a (small) ROI
(reference: libertem/udf/raw.py:12).

TPU-native storage: a single-kind buffer of shape (n_selected, *sig)
filled by masked scatter at each tile's global offset; partition states
are disjoint so merge is a plain add.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import UDF


class PickUDF(UDF):
    def get_preferred_input_dtype(self):
        return self.USE_NATIVE_DTYPE  # keep raw dtype

    def _n_selected(self) -> int:
        if self.meta.roi is not None:
            return int(np.count_nonzero(self.meta.roi))
        return self.meta.dataset_shape.nav.size

    def get_result_buffers(self):
        return {
            "intensity": self.buffer(
                kind="single",
                extra_shape=(self._n_selected(),)
                + tuple(self.meta.dataset_shape.sig),
                dtype=self.meta.input_dtype,
            ),
        }

    def process_tile(self, tile):
        depth = tile.shape[0]
        ids = self.meta.global_offset + jnp.arange(depth, dtype=jnp.int32)
        # padded rows → OOB index → dropped by scatter
        n = self.results.intensity.shape[0]
        ids = jnp.where(self.meta.tile_valid, ids, n)
        if len(self.meta.tiling_scheme) == 1:
            self.results.intensity = self.results.intensity.at[ids].set(
                tile.astype(self.results.intensity.dtype), mode="drop"
            )
        else:
            idx = (ids,) + self.meta.sig_slice.get()
            self.results.intensity = self.results.intensity.at[idx].set(
                tile.astype(self.results.intensity.dtype), mode="drop"
            )

    def merge(self, dest, src):
        dest.intensity = dest.intensity + src.intensity
