"""Slice: an n-D hyperrectangle (origin + Shape) into a dataset.

TPU-native counterpart of the reference's ``libertem/common/slice.py``
(Slice:31, intersection_with:67, shift_by:132, get:152, subslices:259,
flatten_nav:334, adjust_for_roi:376).  Used to describe which region of
the (flattened-nav, *sig) dataset a partition or tile covers.
"""
from __future__ import annotations

import itertools
from typing import Iterator, Optional, Sequence

import numpy as np

from .math import prod
from .shape import Shape


class SliceUsageError(ValueError):
    """Raised when a Slice is incorrectly instantiated or used
    (reference common/slice.py:11)."""


class Slice:
    __slots__ = ("origin", "shape")

    def __init__(self, origin: Sequence[int], shape: Shape):
        if not isinstance(shape, Shape):
            raise SliceUsageError(
                f"shape must be a Shape, got {type(shape).__name__}"
            )
        origin = tuple(int(o) for o in origin)
        if len(origin) != shape.dims:
            raise SliceUsageError(
                f"origin {origin} and shape {shape} dims mismatch"
            )
        self.origin = origin
        self.shape = shape

    def __repr__(self) -> str:
        return f"<Slice origin={self.origin} shape={self.shape}>"

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, Slice)
            and self.origin == other.origin
            and self.shape == other.shape
        )

    def __hash__(self) -> int:
        return hash((self.origin, self.shape.to_tuple(), self.shape.sig_dims))

    @property
    def nav(self) -> "Slice":
        nd = self.shape.nav_dims
        return Slice(self.origin[:nd], self.shape.nav)

    @property
    def sig(self) -> "Slice":
        nd = self.shape.nav_dims
        return Slice(self.origin[nd:], self.shape.sig)

    def intersection_with(self, other: "Slice") -> "Slice":
        """The overlapping region (may be empty: zero-size shape)."""
        if len(self.origin) != len(other.origin):
            raise SliceUsageError("dimension mismatch")
        if self.shape.sig_dims != other.shape.sig_dims:
            raise SliceUsageError(
                f"sig_dims mismatch ({self.shape.sig_dims} vs "
                f"{other.shape.sig_dims})"
            )
        new_origin = tuple(
            max(a, b) for a, b in zip(self.origin, other.origin)
        )
        ends = tuple(
            min(a + sa, b + sb)
            for a, b, sa, sb in zip(
                self.origin, other.origin, self.shape, other.shape
            )
        )
        new_shape = tuple(max(0, e - o) for o, e in zip(new_origin, ends))
        if any(s == 0 for s in new_shape):
            new_shape = tuple(0 for _ in new_shape)
        return Slice(
            new_origin, Shape(new_shape, sig_dims=self.shape.sig_dims)
        )

    def is_null(self) -> bool:
        return self.shape.size == 0

    def shift(self, other: "Slice") -> "Slice":
        """Express this slice relative to ``other``'s origin
        (reference slice.py:116)."""
        if len(self.origin) != len(other.origin):
            raise SliceUsageError(
                "cannot shift slices with different dimensionality "
                f"({self.origin} vs {other.origin})"
            )
        return Slice(
            tuple(o - oo for o, oo in zip(self.origin, other.origin)),
            self.shape,
        )

    def shift_by(self, offset) -> "Slice":
        """Move the origin BY ``offset`` (reference slice.py:132).
        A Slice argument keeps this repo's earlier relative-to
        spelling (== :meth:`shift`)."""
        if isinstance(offset, Slice):
            return self.shift(offset)
        offset = tuple(int(o) for o in offset)
        if len(self.origin) != len(offset):
            raise SliceUsageError(
                "cannot shift slices with different dimensionality "
                f"({self.origin} vs {offset})"
            )
        return Slice(
            tuple(o + d for o, d in zip(self.origin, offset)),
            self.shape,
        )

    def clip_to(self, shape: Shape) -> "Slice":
        """Intersect with a zero-origin slice of ``shape``
        (reference slice.py:397)."""
        return self.intersection_with(
            Slice((0,) * shape.dims, shape)
        )

    def get(self, arr=None, sig_only: bool = False, nav_only: bool = False):
        """A tuple of python slices; or directly slice ``arr`` with it."""
        if sig_only:
            nd = self.shape.nav_dims
            origin, shape = self.origin[nd:], self.shape.sig
        elif nav_only:
            nd = self.shape.nav_dims
            origin, shape = self.origin[:nd], self.shape.nav
        else:
            origin, shape = self.origin, self.shape
        slices = tuple(
            slice(o, o + s) for o, s in zip(origin, shape)
        )
        if arr is not None:
            if sig_only:
                # sig slices address the TRAILING axes of the array
                # (reference slice.py:152: arr[(Ellipsis,) + slices])
                return arr[(Ellipsis,) + slices]
            return arr[slices]
        return slices

    def discard_nav(self) -> "Slice":
        """Keep only the sig part (nav origin dropped)."""
        return self.sig

    def subslices(self, shape: Sequence[int]) -> Iterator["Slice"]:
        """Iterate sub-slices tiling this slice in a grid of ``shape``."""
        shape = tuple(int(s) for s in shape)
        if len(shape) != self.shape.dims:
            raise SliceUsageError("subslice shape dims mismatch")
        ranges = [
            range(o, o + full, step)
            for o, full, step in zip(self.origin, self.shape, shape)
        ]
        for origin in itertools.product(*ranges):
            sub_shape = tuple(
                min(step, o + full - oo)
                for oo, o, full, step in zip(
                    origin, self.origin, self.shape, shape
                )
            )
            yield Slice(
                origin, Shape(sub_shape, sig_dims=self.shape.sig_dims)
            )

    def flatten_nav(self, containing_shape: Shape) -> "Slice":
        """Convert an nD-nav slice into flat-nav coordinates.

        Only valid when the nav region is contiguous in C order within
        ``containing_shape`` (as partition slices are).  Accepts a
        Shape or any shape-like (reference slice.py:334 takes the
        leading nav_dims entries of a plain tuple too).
        """
        if isinstance(containing_shape, Shape):
            nav_shape = tuple(containing_shape.nav)
        else:
            nav_shape = tuple(containing_shape)[
                :self.shape.nav_dims
            ]
        origin_nav = self.origin[: self.shape.nav_dims]
        strides = [prod(nav_shape[i + 1:]) for i in range(len(nav_shape))]
        flat_origin = sum(o * s for o, s in zip(origin_nav, strides))
        flat_size = prod(self.shape.nav)
        return Slice(
            (flat_origin,) + self.origin[self.shape.nav_dims:],
            Shape(
                (flat_size,) + tuple(self.shape.sig),
                sig_dims=self.shape.sig_dims,
            ),
        )

    def adjust_for_roi(self, roi: Optional[np.ndarray]) -> "Slice":
        """Compress the (flat) nav axis of this slice by a boolean roi.

        ``roi`` is the flat boolean mask over the full dataset nav axis;
        the result's nav origin/size count only selected frames.
        """
        if roi is None:
            return self
        if self.shape.nav_dims != 1:
            raise SliceUsageError("adjust_for_roi requires flat nav")
        roi = np.asarray(roi).reshape(-1)
        o = self.origin[0]
        s = self.shape[0]
        origin = int(np.count_nonzero(roi[:o]))
        size = int(np.count_nonzero(roi[o:o + s]))
        return Slice(
            (origin,) + self.origin[1:],
            Shape((size,) + tuple(self.shape.sig),
                  sig_dims=self.shape.sig_dims),
        )

    @classmethod
    def from_shape(cls, shape: Sequence[int], sig_dims: int) -> "Slice":
        s = Shape(shape, sig_dims=sig_dims)
        return cls(tuple(0 for _ in range(s.dims)), s)
