"""Exact integer math helpers.

Counterpart of the reference's ``libertem/common/math.py`` (prod:18,
count_nonzero:36, make_2D_square:47) — exact Python-int products so huge
dataset shapes never overflow int64 intermediates.
"""
from __future__ import annotations

import math
from typing import Iterable, Sequence

import numpy as np


def prod(iterable: Iterable[int]) -> int:
    """Exact product as a Python int (no numpy overflow)."""
    result = 1
    for item in iterable:
        result *= int(item)
    return result


def count_nonzero(mask) -> int:
    """Count truthy entries in a dense or scipy.sparse mask."""
    if mask is None:
        return 0
    if hasattr(mask, "nnz"):  # scipy.sparse
        return int(mask.nnz)
    return int(np.count_nonzero(np.asarray(mask)))


def make_2D_square(shape: Sequence[int]) -> tuple[int, ...]:
    """Reshape a flat size into the most-square 2D factorization.

    Used when visualizing 1D nav shapes as 2D images.
    """
    size = prod(shape)
    if len(shape) == 2:
        return tuple(int(s) for s in shape)
    if size == 0:
        return (0, 0)
    side = int(math.sqrt(size))
    while side > 1 and size % side != 0:
        side -= 1
    return (side, size // side)


def flat_nonzero(mask) -> np.ndarray:
    """Flat indices of truthy entries of a dense boolean array."""
    return np.flatnonzero(np.asarray(mask))


def ndenumerate(array):
    """np.ndenumerate that also works for sparse arrays (reference
    common/math.py:85): falls back to densifying coordinate lookups
    when numpy refuses to iterate the array type."""
    try:
        yield from np.ndenumerate(array)
    except (RuntimeError, TypeError):
        arr = np.asarray(
            array.todense() if hasattr(array, "todense") else array
        )
        yield from np.ndenumerate(arr)
