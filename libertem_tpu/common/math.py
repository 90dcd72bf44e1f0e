"""Exact integer math helpers.

Counterpart of the reference's ``libertem/common/math.py`` (prod:18,
count_nonzero:36, make_2D_square:47) — exact Python-int products so huge
dataset shapes never overflow int64 intermediates.
"""
from __future__ import annotations

import math
from typing import Iterable, Sequence

import numpy as np


_prod_accepted = (
    int, bool,
    np.bool_, np.signedinteger, np.unsignedinteger,
)


def prod(iterable: Iterable[int]) -> int:
    """Exact product as a Python int (no numpy overflow).

    Raises ValueError on non-integer entries (reference
    common/math.py:18 — shape math must never silently truncate
    floats)."""
    result = 1
    for item in iterable:
        if not isinstance(item, _prod_accepted):
            raise ValueError(
                f"prod() accepts integer types only, got {type(item)}"
            )
        result *= int(item)
    return result


def count_nonzero(mask) -> int:
    """Count truthy entries in a dense or sparse mask (reference
    common/math.py:36: np.count_nonzero with an astype(bool).sum()
    fallback — the fallback handles sparse arrays with fill_value
    and non-canonical scipy COO without densifying)."""
    if mask is None:
        return 0
    try:
        return int(np.count_nonzero(mask))
    except (TypeError, ValueError):
        return int(mask.astype(bool).sum())


def make_2D_square(shape: Sequence[int]) -> tuple[int, ...]:
    """Reshape a 1D shape into 2D square when its size is a perfect
    square; pass anything else through (reference common/math.py:47 —
    non-square 1D nav stays 1D so indices remain meaningful).
    Raises ValueError on zero/negative sizes."""
    if len(shape) != 1:
        return tuple(int(s) for s in shape)
    size = prod(shape)
    if size < 1:
        raise ValueError("Zero or negative shape.size")
    side = math.isqrt(size)
    if side * side == size:
        return (side, side)
    return tuple(int(s) for s in shape)


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
