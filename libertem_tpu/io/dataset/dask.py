"""DaskDataSet: wrap a dask.array as a dataset
(reference: libertem/io/dataset/dask.py:69 — chunk -> partition
mapping).  Gated on dask availability; also accepts any array-like
(numpy, jax) for the common in-memory case.
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


class DaskPartition(Partition):
    def __init__(self, array_flat, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._array = array_flat

    def _read_raw_frames(self, start: int, stop: int) -> np.ndarray:
        chunk = self._array[start:stop]
        if hasattr(chunk, "compute"):
            chunk = chunk.compute()
        return np.asarray(chunk)


class DaskDataSet(DataSet):
    def __init__(
        self,
        dask_array=None,
        array=None,
        sig_dims: int = 2,
        preserve_dimensions: bool = True,  # reference-compat
        min_size: Optional[int] = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self._array = dask_array if dask_array is not None else array
        if self._array is None:
            raise DataSetException(
                "dask_array (or array) is required"
            )
        self._sig_dims = sig_dims

    def initialize(self, executor=None) -> "DaskDataSet":
        arr = self._array
        shape = tuple(int(s) for s in arr.shape)
        sig_shape = shape[len(shape) - self._sig_dims:]
        nav_shape = shape[:len(shape) - self._sig_dims]
        self._flat = arr.reshape((-1,) + sig_shape)
        self._chunk_sizes = None
        if hasattr(arr, "chunks"):
            # one partition per nav chunk of the first axis
            self._chunk_sizes = [int(c) for c in
                                 self._flat.chunks[0]]
        self._meta = DataSetMeta(
            shape=Shape(nav_shape + sig_shape,
                        sig_dims=self._sig_dims),
            raw_dtype=np.dtype(arr.dtype),
            sync_offset=0,
            image_count=int(np.prod(nav_shape)),
        )
        return self

    def get_num_partitions(self) -> int:
        if self._chunk_sizes is not None:
            return len(self._chunk_sizes)
        return super().get_num_partitions()

    def get_partition_ranges(self):
        if self._chunk_sizes is not None:
            bounds = np.cumsum([0] + self._chunk_sizes)
            return [
                (int(bounds[i]), int(bounds[i + 1]))
                for i in range(len(self._chunk_sizes))
            ]
        return super().get_partition_ranges()

    def get_partitions(self) -> Iterator[DaskPartition]:
        for idx, (start, stop) in enumerate(self.get_partition_ranges()):
            yield DaskPartition(
                self._flat, self.meta, start, stop - start, idx=idx,
            )
