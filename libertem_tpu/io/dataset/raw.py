"""RAW binary dataset: plain uncompressed frames on disk
(reference: libertem/io/dataset/raw.py:62 RawFileDataSet).

Host-side reads go through a persistent np.memmap (the page cache does
the heavy lifting, like the reference's MMapBackend backend_mmap.py:68);
dtype conversion happens on-device after the H2D copy, which moves
fewer bytes for narrow integer data than the reference's host decode.
"""
from __future__ import annotations

import os
from typing import Iterator, Optional, Sequence

import numpy as np

from ...common.math import prod
from ...common.shape import Shape
from .base import (
    DataSet,
    DataSetException,
    DataSetMeta,
    Partition,
)


class RawPartition(Partition):
    def __init__(self, path, frame_size_bytes, dtype, sig_shape,
                 io_backend=None, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._path = path
        self._dtype = np.dtype(dtype)
        self._sig_shape = tuple(sig_shape)
        self._io_backend = io_backend
        self._mmap = None
        self._file = None

    def _get_mmap(self):
        if self._mmap is None:
            self._mmap = np.memmap(
                self._path, dtype=self._dtype, mode="r",
            )
        return self._mmap

    def _read_buffered(self, start: int, stop: int) -> np.ndarray:
        """Explicit read (readinto) instead of page-cache mmap —
        better for cold-cache / spinning storage (reference
        backend_buffered.py:208)."""
        import os
        frame_px = prod(self._sig_shape)
        itemsize = self._dtype.itemsize
        if self._file is None:
            flags = os.O_RDONLY
            from .base import DirectBackend
            if isinstance(self._io_backend, DirectBackend) and hasattr(
                os, "O_DIRECT"
            ):
                try:
                    self._file = os.open(
                        self._path, flags | os.O_DIRECT
                    )
                except OSError:
                    self._file = os.open(self._path, flags)
            else:
                self._file = os.open(self._path, flags)
        n = stop - start
        start_byte = start * frame_px * itemsize
        end_byte = stop * frame_px * itemsize
        # O_DIRECT requires 4096-aligned offset, length and buffer;
        # read the aligned covering range and slice
        ALIGN = 4096
        a0 = start_byte // ALIGN * ALIGN
        a1 = -(-end_byte // ALIGN) * ALIGN
        raw = np.empty(a1 - a0 + ALIGN, dtype=np.uint8)
        shift = (-raw.ctypes.data) % ALIGN
        view = raw[shift:shift + (a1 - a0)]
        got = os.preadv(self._file, [view], a0)
        if got < end_byte - a0:
            raise IOError(
                f"short read: {got} bytes at aligned offset {a0}, "
                f"needed {end_byte - a0}"
            )
        data = view[start_byte - a0:end_byte - a0]
        return np.frombuffer(
            data.tobytes(), dtype=self._dtype
        ).reshape((n,) + self._sig_shape)

    def _read_raw_frames(self, start: int, stop: int) -> np.ndarray:
        from .base import BufferedBackend, DirectBackend
        if isinstance(self._io_backend,
                      (BufferedBackend, DirectBackend)):
            return self._read_buffered(start, stop)
        frame_px = prod(self._sig_shape)
        flat = self._get_mmap()
        out = flat[start * frame_px:stop * frame_px]
        return out.reshape((stop - start,) + self._sig_shape)


class RawFileDataSet(DataSet):
    def __init__(
        self,
        path: str,
        dtype,
        nav_shape: Optional[Sequence[int]] = None,
        sig_shape: Optional[Sequence[int]] = None,
        sync_offset: int = 0,
        # reference-compat aliases:
        scan_size=None,
        detector_size=None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self._path = path
        self._dtype = np.dtype(dtype)
        self._nav_shape = tuple(nav_shape or scan_size or ())
        self._sig_shape = tuple(sig_shape or detector_size or ())
        self._sync_offset = int(sync_offset)

    def initialize(self, executor=None) -> "RawFileDataSet":
        if not self._sig_shape:
            raise DataSetException("sig_shape is required for raw")
        filesize = os.path.getsize(self._path)
        frame_bytes = prod(self._sig_shape) * self._dtype.itemsize
        if filesize % frame_bytes != 0:
            raise DataSetException(
                f"file size {filesize} is not a multiple of the frame "
                f"size {frame_bytes}"
            )
        image_count = filesize // frame_bytes
        if not self._nav_shape:
            self._nav_shape = (image_count,)
        shape = Shape(
            self._nav_shape + self._sig_shape,
            sig_dims=len(self._sig_shape),
        )
        self._meta = DataSetMeta(
            shape=shape,
            raw_dtype=self._dtype,
            sync_offset=self._sync_offset,
            image_count=image_count,
        )
        return self

    def check_valid(self) -> bool:
        nav_size = prod(self._nav_shape)
        if self.meta.image_count < nav_size + self._sync_offset:
            pass  # partial data is allowed; missing frames zero-filled
        return True

    def get_partitions(self) -> Iterator[RawPartition]:
        for idx, (start, stop) in enumerate(self.get_partition_ranges()):
            yield RawPartition(
                self._path,
                prod(self._sig_shape) * self._dtype.itemsize,
                self._dtype,
                self._sig_shape,
                self._io_backend,
                self.meta, start, stop - start, idx=idx,
            )

    @classmethod
    def get_supported_extensions(cls) -> set:
        return {"raw", "bin"}
