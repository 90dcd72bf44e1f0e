"""NPY dataset: numpy .npy files
(reference: libertem/io/dataset/npy.py:86 NPYDataSet — own header
parser + mmap; here we use numpy's public header API + np.memmap).
"""
from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np

from ...common.shape import Shape
from .base import (
    DataSet,
    DataSetException,
    DataSetMeta,
    Partition,
)


def read_npy_info(path: str):
    """Parse the npy header: (shape, dtype, fortran_order, offset)."""
    with open(path, "rb") as f:
        version = np.lib.format.read_magic(f)
        # public, stability-guaranteed header readers (the private
        # _read_array_header has changed signature across releases)
        if version == (1, 0):
            shape, fortran, dtype = (
                np.lib.format.read_array_header_1_0(f)
            )
        else:
            shape, fortran, dtype = (
                np.lib.format.read_array_header_2_0(f)
            )
        offset = f.tell()
    return shape, dtype, fortran, offset


class NPYPartition(Partition):
    def __init__(self, path, offset, dtype, sig_shape,
                 io_backend=None, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._path = path
        self._offset = offset
        self._dtype = np.dtype(dtype)
        self._sig_shape = tuple(sig_shape)
        from .base import RangeReader
        self._reader = RangeReader(path, io_backend)

    def _read_raw_frames(self, start: int, stop: int) -> np.ndarray:
        frame_bytes = (
            int(np.prod(self._sig_shape)) * self._dtype.itemsize
        )
        buf = self._reader.read(
            self._offset + start * frame_bytes,
            (stop - start) * frame_bytes,
        )
        return np.frombuffer(buf, dtype=self._dtype).reshape(
            (stop - start,) + self._sig_shape
        )


class NPYDataSet(DataSet):
    def __init__(
        self,
        path: str,
        sig_dims: int = 2,
        nav_shape: Optional[Sequence[int]] = None,
        sig_shape: Optional[Sequence[int]] = None,
        sync_offset: int = 0,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self._path = path
        self._sig_dims = sig_dims
        self._nav_shape = tuple(nav_shape) if nav_shape else None
        self._sig_shape = tuple(sig_shape) if sig_shape else None
        self._sync_offset = int(sync_offset)

    def initialize(self, executor=None) -> "NPYDataSet":
        shape, dtype, fortran, offset = read_npy_info(self._path)
        if fortran:
            raise DataSetException(
                "fortran-ordered npy files are not supported"
            )
        if self._sig_shape is not None:
            sig_shape = self._sig_shape
        else:
            sig_shape = shape[len(shape) - self._sig_dims:]
        total = int(np.prod(shape)) if shape else 1
        sig_size = int(np.prod(sig_shape))
        if sig_size == 0 or total % sig_size != 0:
            raise DataSetException(
                f"sig_shape {tuple(sig_shape)} does not evenly "
                f"divide the file shape {tuple(shape)}"
            )
        file_nav = shape[:len(shape) - self._sig_dims]
        image_count = total // sig_size
        nav_shape = self._nav_shape or (
            file_nav if (
                self._sig_shape is None
                or sig_size == int(np.prod(
                    shape[len(shape) - self._sig_dims:]
                ))
            ) and file_nav else (image_count,)
        )
        self._meta = DataSetMeta(
            shape=Shape(
                tuple(nav_shape) + tuple(sig_shape),
                sig_dims=len(sig_shape),
            ),
            raw_dtype=dtype,
            sync_offset=self._sync_offset,
            image_count=image_count,
        )
        self._offset = offset
        return self

    def get_partitions(self) -> Iterator[NPYPartition]:
        for idx, (start, stop) in enumerate(self.get_partition_ranges()):
            yield NPYPartition(
                self._path, self._offset, self.meta.raw_dtype,
                tuple(self.meta.shape.sig), self._io_backend,
                self.meta, start, stop - start, idx=idx,
            )

    @classmethod
    def detect_params(cls, path: str, executor=None):
        if not path.lower().endswith(".npy"):
            return False
        try:
            shape, dtype, fortran, _ = read_npy_info(path)
        except Exception:
            return False
        if fortran or len(shape) < 3:
            return False
        return {"path": path, "sig_dims": 2}

    @classmethod
    def get_supported_extensions(cls) -> set:
        return {"npy"}
