"""MRC / MRC2014 dataset (reference: libertem/io/dataset/mrc.py:90,
which delegates to ncempy; here the standard MRC2014 header is parsed
directly — public spec: 1024-byte header of little-endian i32 words,
nx/ny/nz at words 0-2, mode at word 3, NSYMBT extended-header size at
byte offset 92; data follows at 1024 + NSYMBT).
"""
from __future__ import annotations

import os
import struct
from typing import Iterator, Optional, Sequence

import numpy as np

from ...common.shape import Shape
from .base import (
    DataSet,
    DataSetException,
    DataSetMeta,
    Partition,
    resolve_sig_override,
)

MRC_MODES = {
    0: np.int8,
    1: np.int16,
    2: np.float32,
    6: np.uint16,
    12: np.float16,
}


def read_mrc_header(path: str) -> dict:
    with open(path, "rb") as f:
        head = f.read(1024)
    if len(head) < 1024:
        raise DataSetException("file too small for an MRC header")
    nx, ny, nz, mode = struct.unpack("<4i", head[:16])
    nsymbt = struct.unpack("<i", head[92:96])[0]
    # MRC2014 exttyp/machine stamp checks omitted; assume LE
    if mode not in MRC_MODES:
        raise DataSetException(f"unsupported MRC mode {mode}")
    return {
        "nx": nx, "ny": ny, "nz": nz,
        "dtype": np.dtype(MRC_MODES[mode]),
        "data_offset": 1024 + max(0, nsymbt),
    }


class MRCPartition(Partition):
    def __init__(self, path, offset, dtype, sig_shape, *args, **kw):
        super().__init__(*args, **kw)
        self._path = path
        self._offset = offset
        self._dtype = np.dtype(dtype)
        self._sig_shape = tuple(sig_shape)
        # eager: the sharded reader pool may hit one partition from
        # several threads; construction is cheap (fd opens lazily,
        # guarded per instance)
        from .base import RangeReader
        self._reader = RangeReader(self._path, self.io_backend)

    def _read_raw_frames(self, start: int, stop: int) -> np.ndarray:
        px = int(np.prod(self._sig_shape))
        item = self._dtype.itemsize
        buf = self._reader.read(
            self._offset + start * px * item,
            (stop - start) * px * item,
        )
        return np.frombuffer(buf, dtype=self._dtype).reshape(
            (stop - start,) + self._sig_shape
        )


class MRCDataSet(DataSet):
    def __init__(
        self,
        path: str,
        nav_shape: Optional[Sequence[int]] = None,
        sig_shape: Optional[Sequence[int]] = None,
        sync_offset: int = 0,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self._path = path
        self._nav_shape = tuple(nav_shape) if nav_shape else None
        self._sig_shape = tuple(sig_shape) if sig_shape else None
        self._sync_offset = int(sync_offset)

    def initialize(self, executor=None) -> "MRCDataSet":
        h = read_mrc_header(self._path)
        sig = resolve_sig_override(
            self._sig_shape, (h["ny"], h["nx"])
        )
        nav_shape = self._nav_shape or (h["nz"],)
        self._h = h
        self._meta = DataSetMeta(
            shape=Shape(
                tuple(nav_shape) + sig, sig_dims=len(sig)
            ),
            raw_dtype=h["dtype"],
            sync_offset=self._sync_offset,
            # clamp the header's nz to what the file actually holds —
            # a truncated stack must zero-fill, not short-read-error
            # mid-run (same clamp as SEQ/BLO/EMPAD/DM)
            image_count=min(
                int(h["nz"]),
                max(0, (
                    os.path.getsize(self._path) - h["data_offset"]
                ) // (
                    h["ny"] * h["nx"] * h["dtype"].itemsize
                )),
            ),
        )
        return self

    def get_partitions(self) -> Iterator[MRCPartition]:
        h = self._h
        for idx, (start, stop) in enumerate(self.get_partition_ranges()):
            yield MRCPartition(
                self._path, h["data_offset"], h["dtype"],
                (h["ny"], h["nx"]),
                self.meta, start, stop - start, idx=idx,
                io_backend=self._io_backend,
            )

    @classmethod
    def detect_params(cls, path: str, executor=None):
        if not path.lower().endswith(
            (".mrc", ".mrcs", ".rec", ".ali", ".st")
        ):
            return False
        try:
            read_mrc_header(path)
        except Exception:
            return False
        return {"path": path}

    @classmethod
    def get_supported_extensions(cls) -> set:
        return {"mrc", "mrcs", "rec", "ali", "st"}
