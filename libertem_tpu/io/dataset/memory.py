"""In-memory dataset — the universal test fixture.

Counterpart of the reference's ``libertem/io/dataset/memory.py``
(MemoryDataSet:202): wraps a numpy array, with controllable partition
count for exercising the tiling/merge machinery.
"""
from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np

from ...common.shape import Shape
from .base import DataSet, DataSetException, DataSetMeta, Partition


class MemPartition(Partition):
    def __init__(self, data_flat: np.ndarray, tiledelay=None,
                 *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._data = data_flat  # (n_frames, *sig)
        self._tiledelay = tiledelay

    def _read_raw_frames(self, start: int, stop: int) -> np.ndarray:
        if self._tiledelay:
            # simulate slow I/O for live-plot / pipelining tests
            # (reference memory.py tiledelay)
            import time
            time.sleep(self._tiledelay)
        return self._data[start:stop]


class MemoryDataSet(DataSet):
    def __init__(
        self,
        data: Optional[np.ndarray] = None,
        sig_dims: Optional[int] = None,
        nav_shape: Optional[Sequence[int]] = None,
        sig_shape: Optional[Sequence[int]] = None,
        num_partitions: Optional[int] = None,
        tileshape=None,  # forced verbatim (reference memory.py:365)
        tiledelay=None,  # artificial per-read delay (tests)
        sync_offset: int = 0,
        datashape=None,  # zero-filled dataset of this shape
        **kwargs,  # accept remaining reference-API knobs
    ):
        super().__init__(num_partitions=num_partitions)
        if data is None:
            # reference memory.py:222: an empty (zeros) dataset from
            # just a shape, for API/GUI testing
            if datashape is None:
                raise DataSetException(
                    "MemoryDataSet needs either data or datashape"
                )
            data = np.zeros(
                tuple(int(s) for s in tuple(datashape)), np.float32
            )
        data = np.asarray(data)
        # shape-inference algebra (reference memory.py MemoryDataSet
        # + tests/io/datasets/test_mem.py test_sig_nav_dims_sync):
        # an explicit sig_shape/sig_dims pair must AGREE; with only
        # nav_shape given, sig is whatever trails the nav dims
        if sig_shape is not None:
            sig_shape = tuple(int(s) for s in sig_shape)
            if sig_dims is not None and len(sig_shape) != sig_dims:
                raise ValueError(
                    f"sig_shape {sig_shape} and sig_dims {sig_dims} "
                    "disagree"
                )
        elif sig_dims is not None:
            sig_shape = data.shape[data.ndim - sig_dims:]
        elif nav_shape is not None:
            sig_shape = data.shape[len(tuple(nav_shape)):]
        else:
            sig_shape = data.shape[data.ndim - 2:]
        sig_shape = tuple(int(s) for s in sig_shape)
        sig_dims = len(sig_shape)
        if nav_shape is not None:
            nav_shape = tuple(int(s) for s in nav_shape)
        else:
            nav_shape = data.shape[:data.ndim - sig_dims]
        shape = Shape(nav_shape + sig_shape, sig_dims=sig_dims)
        self._data = data.reshape((-1,) + tuple(sig_shape))
        self._meta = DataSetMeta(
            shape=shape,
            raw_dtype=data.dtype,
            sync_offset=sync_offset,
            image_count=self._data.shape[0],
        )
        self._tileshape = tileshape
        self._tiledelay = tiledelay

    @property
    def data(self) -> np.ndarray:
        return self._data.reshape(self.shape.to_tuple())

    def initialize(self, executor=None) -> "MemoryDataSet":
        return self

    @classmethod
    def get_supported_io_backends(cls) -> list:
        return []  # in-memory: no file IO backend applies

    @property
    def tileshape(self):
        """The forced tile shape, if one was given (reference
        memory.py:356)."""
        if self._tileshape is None:
            return None
        return Shape(
            tuple(int(s) for s in self._tileshape),
            sig_dims=self.shape.sig.dims,
        )

    def adjust_tileshape(self, tileshape, roi):
        """Honor an explicit ``tileshape`` verbatim (reference
        MemoryDataSet tiles exactly as told, memory.py:362 — tests
        depend on block granularity AND sig splitting; a sig-split
        hint makes the scheme sig-split, which the device step and
        the host tile dispatch both honor)."""
        if self._tileshape is None:
            return tileshape
        return tuple(int(s) for s in tuple(self._tileshape))

    def get_num_partitions(self) -> int:
        if self._num_partitions is not None:
            return max(1, self._num_partitions)
        return super().get_num_partitions()

    def get_partitions(self) -> Iterator[MemPartition]:
        for idx, (start, stop) in enumerate(self.get_partition_ranges()):
            yield MemPartition(
                self._data, self._tiledelay,
                self.meta, start, stop - start, idx=idx,
            )


class MemoryFile:
    """File-table entry for in-memory data (reference io/dataset/
    memory.py:29) — a plain carrier; this engine reads memory
    partitions directly from the backing array, so MemoryFile exists
    for API compatibility (subclassed dataset tests, diagnostics)."""

    def __init__(self, path, start_idx, end_idx, native_dtype,
                 sig_shape, data, check_cast=True):
        self.path = path
        self.start_idx = int(start_idx)
        self.end_idx = int(end_idx)
        self.native_dtype = native_dtype
        self.sig_shape = tuple(sig_shape)
        self.data = data
        self.check_cast = check_cast

    @property
    def num_frames(self) -> int:
        return self.end_idx - self.start_idx


class FileSet:
    """Ordered collection of file-table entries (reference
    io/dataset/base/fileset.py) — API-compat carrier."""

    def __init__(self, files, frame_header_bytes=0,
                 frame_footer_bytes=0):
        self._files = list(files)
        self.frame_header_bytes = frame_header_bytes
        self.frame_footer_bytes = frame_footer_bytes

    def __iter__(self):
        return iter(self._files)

    def __len__(self):
        return len(self._files)

    def __getitem__(self, idx):
        return self._files[idx]
