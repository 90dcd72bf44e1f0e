"""Dataset -> dask.array adapter
(reference: libertem/contrib/daskadapter.py:23 make_dask_array).
Gated on dask availability (not bundled in this environment).
"""
from __future__ import annotations

import numpy as np


def make_dask_array(dataset, dtype=None, roi=None):
    """Wrap a DataSet as a dask.array with one chunk per partition."""
    try:
        import dask
        import dask.array as da
    except ImportError as e:
        raise ImportError(
            "make_dask_array requires dask to be installed"
        ) from e
    dtype = np.dtype(dtype) if dtype is not None else dataset.dtype
    sig = tuple(dataset.shape.sig)
    chunks = []
    name = f"libertem-tpu-ds-{id(dataset)}"
    dsk = {}
    for i, partition in enumerate(dataset.get_partitions()):
        dsk[(name, i) + (0,) * len(sig)] = (
            _read_partition, partition, dtype,
        )
        chunks.append(partition.num_frames)
    arr = da.Array(
        dsk, name, shape=(dataset.shape.nav.size,) + sig,
        chunks=(tuple(chunks),) + tuple((s,) for s in sig),
        dtype=dtype,
    )
    workers = {}
    return arr.reshape(dataset.shape.to_tuple()), workers


def _read_partition(partition, dtype):
    data = partition.read_dataset_frames(
        partition.start_frame,
        partition.start_frame + partition.num_frames,
    )
    return data.astype(dtype)
