"""RecordUDF: stream the dataset to a .npy file on disk
(reference: libertem/udf/record.py:9 — preprocess writes the npy
header:39, process_tile memmaps:68).

TPU-native path: recording is fundamentally a HOST side effect, and
the host already holds every block (it assembles and uploads them),
so RecordUDF runs as a numpy-backend host UDF (udf/host.py): blocks
are written to the memmap straight from the host feed with no
device round-trip, overlapping with the device UDFs' compute.  This
works on BOTH the single-device loop and the sharded mesh loop (the
mesh assembly is host-side too) — parity with the reference, which
records from any executor (udf/record.py:9).
"""
from __future__ import annotations

import numpy as np

from .base import UDF


class RecordUDF(UDF):
    def __init__(self, filename: str, _dtype=None):
        super().__init__(filename=filename, _dtype=_dtype)
        self._mmap = None
        self._mmap_base = None

    def get_backends(self):
        # host-side effect: write from the host block feed (no
        # device round-trip; sharded-loop capable)
        return (self.BACKEND_NUMPY,)

    def on_params_updated(self):
        # a patched filename must open a new file, not keep writing
        # into the old mmap
        if self._mmap_base is not None:
            self._mmap_base.flush()
        self._mmap = None
        self._mmap_base = None

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
        # no roi: the npy header carries the dataset's FULL nav
        # dims (reference record.py:49 writes tuple(ds_shape)); with
        # a roi (an extension over the reference, which refuses rois)
        # nav compresses to the roi's flat count
        if self.meta.roi is not None:
            n = int(np.count_nonzero(self.meta.roi))
            return (n,) + tuple(self.meta.dataset_shape.sig)
        return tuple(self.meta.dataset_shape)

    def _ensure_mmap(self):
        if self._mmap is None:
            self._mmap_base = np.lib.format.open_memmap(
                self.params.filename,
                mode="w+",
                dtype=self.meta.input_dtype,
                shape=self._out_shape,
            )
            # writes index by global FLAT frame offset
            self._mmap = self._mmap_base.reshape(
                (-1,) + tuple(self.meta.dataset_shape.sig)
            )
        return self._mmap

    def preprocess(self):
        self._ensure_mmap()

    def process_tile(self, tile):
        # host mode: ``tile`` holds only the valid rows and
        # meta.global_offset is this block's position in the
        # roi-compressed nav ordering
        mm = self._ensure_mmap()
        goff = int(self.meta.global_offset)
        mm[goff:goff + len(tile)] = tile

    def postprocess(self):
        if self._mmap_base is not None:
            self._mmap_base.flush()
