"""Shape: a tuple split into navigation and signal dimensions.

TPU-native counterpart of the reference's ``libertem/common/shape.py``
(Shape:7, nav:29, sig:51, flatten_nav:93).  A 4D-STEM dataset of scan
64x64 with 128x128 detector frames has ``Shape((64, 64, 128, 128),
sig_dims=2)``: nav = (64, 64), sig = (128, 128).
"""
from __future__ import annotations

from typing import Iterator, Sequence

from .math import prod


class Shape:
    """An n-D shape whose trailing ``sig_dims`` axes are the signal axes."""

    __slots__ = ("_nav", "_sig")

    def __init__(self, shape: Sequence[int], sig_dims: int):
        shape = tuple(int(s) for s in shape)
        sig_dims = int(sig_dims)
        if sig_dims < 0 or sig_dims > len(shape):
            raise ValueError(
                f"sig_dims={sig_dims} out of range for shape {shape}"
            )
        nav_dims = len(shape) - sig_dims
        self._nav = shape[:nav_dims]
        self._sig = shape[nav_dims:]

    @property
    def nav(self) -> "Shape":
        """Navigation (scan) part as its own Shape (sig_dims=0)."""
        return Shape(self._nav, sig_dims=0)

    @property
    def sig(self) -> "Shape":
        """Signal (detector) part as its own Shape (all dims sig)."""
        return Shape(self._sig, sig_dims=len(self._sig))

    @property
    def size(self) -> int:
        t = self._nav + self._sig
        # reference shape.py:88: an EMPTY shape covers no elements
        # (not the prod(())==1 convention)
        return prod(t) if t else 0

    @property
    def dims(self) -> int:
        return len(self._nav) + len(self._sig)

    @property
    def nav_dims(self) -> int:
        return len(self._nav)

    @property
    def sig_dims(self) -> int:
        return len(self._sig)

    def flatten_nav(self) -> "Shape":
        """Collapse all nav axes into one."""
        return Shape((prod(self._nav),) + self._sig, sig_dims=len(self._sig))

    def flatten_sig(self) -> "Shape":
        """Collapse all sig axes into one."""
        return Shape(self._nav + (prod(self._sig),), sig_dims=1)

    def to_tuple(self) -> tuple[int, ...]:
        return self._nav + self._sig

    def __iter__(self) -> Iterator[int]:
        return iter(self.to_tuple())

    def __getitem__(self, key):
        return self.to_tuple()[key]

    def __len__(self) -> int:
        return self.dims

    def __eq__(self, other):
        if isinstance(other, Shape):
            return (
                self._nav == other._nav and self._sig == other._sig
            )
        if isinstance(other, (tuple, list)):
            # value-compare convenience (the hash intentionally
            # differs: a Shape is not interchangeable with a tuple
            # as a dict key — it carries sig_dims)
            return self.to_tuple() == tuple(other)
        return NotImplemented

    def __hash__(self) -> int:
        return hash((self._nav, self._sig))

    def __add__(self, other) -> "Shape":
        """``shape + (a, b)`` appends to the SIGNAL dims
        (reference shape.py:183)."""
        if not isinstance(other, tuple):
            return NotImplemented
        return Shape(
            self._nav + self._sig + other,
            sig_dims=len(self._sig) + len(other),
        )

    def __radd__(self, other) -> "Shape":
        """``(a, b) + shape`` appends to the NAVIGATION dims
        (reference shape.py:194)."""
        if not isinstance(other, tuple):
            return NotImplemented
        return Shape(
            self._nav + other + self._sig,
            sig_dims=len(self._sig),
        )

    def __repr__(self) -> str:
        return repr(self.to_tuple())


class SigOnlyShape(Shape):
    """A Shape that is all signal dims (reference shape.py:216) —
    what ``shape.sig`` returns, constructible directly."""

    def __init__(self, shape: Sequence[int]):
        super().__init__(
            tuple(int(s) for s in shape),
            sig_dims=len(tuple(shape)),
        )


class NavOnlyShape(Shape):
    """A Shape that is all navigation dims (reference
    shape.py:250) — what ``shape.nav`` returns, constructible
    directly."""

    def __init__(self, shape: Sequence[int]):
        super().__init__(
            tuple(int(s) for s in shape), sig_dims=0,
        )
