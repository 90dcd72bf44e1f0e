"""RecordUDF: stream the dataset to a .npy file on disk
(reference: libertem/udf/record.py:9 — preprocess writes the npy
header:39, process_tile memmaps:68).

TPU-native path: tiles live on device, so recording is an ordered
``io_callback`` from inside the jit-compiled step — the D2H transfer
is inherent to writing disk files and overlaps with the next block's
compute.
"""
from __future__ import annotations

import numpy as np
from jax.experimental import io_callback

from .base import UDF


class RecordUDF(UDF):
    # the ordered io_callback can't run inside shard_map; the runner
    # rejects sharded runs with a clear message
    SUPPORTS_SHARDED = False

    def __init__(self, filename: str, _dtype=None):
        super().__init__(filename=filename, _dtype=_dtype)
        self._mmap = None

    def on_params_updated(self):
        # a patched filename must open a new file, not keep writing
        # into the old mmap
        if self._mmap is not None:
            self._mmap.flush()
        self._mmap = None

    def get_result_buffers(self):
        return {}

    def get_tiling_preferences(self):
        # _write assigns whole frames into the (n, *sig) mmap — a
        # sig-split tile would write a sub-rectangle into a full slot
        return {"whole_frames": True,
                "depth": self.TILE_DEPTH_DEFAULT,
                "total_size": self.TILE_SIZE_MAX}

    def get_preferred_input_dtype(self):
        if self._kwargs.get("_dtype") is not None:
            return np.dtype(self._kwargs["_dtype"])
        return self.USE_NATIVE_DTYPE

    @property
    def _out_shape(self):
        n = (
            int(np.count_nonzero(self.meta.roi))
            if self.meta.roi is not None
            else self.meta.dataset_shape.nav.size
        )
        return (n,) + tuple(self.meta.dataset_shape.sig)

    def _ensure_mmap(self):
        if self._mmap is None:
            self._mmap = np.lib.format.open_memmap(
                self.params.filename,
                mode="w+",
                dtype=self.meta.input_dtype,
                shape=self._out_shape,
            )
        return self._mmap

    def preprocess(self):
        self._ensure_mmap()

    def _write(self, tile, goff, valid):
        mm = self._ensure_mmap()
        goff = int(goff)
        valid = int(valid)
        mm[goff:goff + valid] = np.asarray(tile)[:valid]
        return np.int32(0)

    def process_tile(self, tile):
        io_callback(
            self._write,
            np.int32(0),
            tile,
            self.meta.global_offset,
            self.meta.valid_frames,
            ordered=True,
        )

    def postprocess(self):
        if self._mmap is not None:
            self._mmap.flush()
