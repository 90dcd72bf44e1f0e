"""Detector corrections: dark frame, gain map, excluded-pixel repair.

Counterpart of the reference's ``libertem/io/corrections/corrset.py``
(CorrectionSet:72, apply:141) and ``detector.py`` (_correct_numba_inplace
:18, environments:111).

TPU-native design: instead of a numba in-place repair loop on the host,
the correction is a pure function fused into the jit-compiled tile step:

    y = (x - dark) * gain
    y[..., excluded] = mean(y[..., neighbors(excluded)])

Neighbor environments are precomputed host-side as static gather index
matrices (growing square environments that skip other excluded pixels,
like detector.py:111), so the device-side repair is one gather + one
segment-mean + one scatter — XLA-friendly static shapes.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..common.math import prod


class CorrectionSet:
    def __init__(
        self,
        dark: Optional[np.ndarray] = None,
        gain: Optional[np.ndarray] = None,
        excluded_pixels: Optional[np.ndarray] = None,
        allow_empty: bool = True,
    ):
        """
        dark: (*sig) array subtracted from each frame
        gain: (*sig) array multiplied into each frame
        excluded_pixels: a boolean (*sig) mask, a sparse COO-like
            object (``.coords`` attribute, as the reference uses), a
            scipy.sparse matrix, or an integer coordinate array of
            defective pixels to repair.  Coordinate arrays follow the
            reference's sparse.COO ``(ndim, n)`` convention; ``(n,
            ndim)`` is also accepted when unambiguous (when both
            orientations match — a square array — the reference's
            ``(ndim, n)`` reading wins).
        allow_empty: when False, raise if no correction data was
            given (reference corrset.py:72).
        """
        self._dark = None if dark is None else np.asarray(dark, np.float32)
        self._gain = None if gain is None else np.asarray(gain, np.float32)
        self._excluded_coords: Optional[np.ndarray] = None
        if excluded_pixels is not None:
            if hasattr(excluded_pixels, "coords"):
                # sparse.pydata COO: coords is (ndim, n)
                ex = np.asarray(excluded_pixels.coords).T
                coords = ex
            elif hasattr(excluded_pixels, "toarray"):
                coords = np.argwhere(
                    np.asarray(excluded_pixels.toarray()).astype(bool)
                )
            else:
                ex = np.asarray(excluded_pixels)
                if ex.dtype == bool:
                    coords = np.argwhere(ex)  # (n, ndim)
                else:
                    ex = np.atleast_2d(ex)
                    sig_ndim = (
                        self._dark.ndim if self._dark is not None
                        else (
                            self._gain.ndim
                            if self._gain is not None else 2
                        )
                    )
                    # (ndim, n) is the reference convention and wins
                    # the square-array tiebreak
                    if ex.shape[0] == sig_ndim:
                        coords = ex.T
                    else:
                        coords = ex
            self._excluded_coords = coords.astype(np.int64)
        if not allow_empty and not self.have_corrections():
            raise ValueError(
                "allow_empty=False, but no dark/gain/excluded_pixels "
                "correction data was given"
            )
        self._cache = {}

    @property
    def dark(self) -> Optional[np.ndarray]:
        return self._dark

    @property
    def gain(self) -> Optional[np.ndarray]:
        return self._gain

    @property
    def excluded_coords(self) -> Optional[np.ndarray]:
        return self._excluded_coords

    def have_corrections(self) -> bool:
        return (
            self._dark is not None
            or self._gain is not None
            or (
                self._excluded_coords is not None
                and len(self._excluded_coords) > 0
            )
        )

    # -- device-plan construction -----------------------------------------

    def make_plan(self, sig_shape: Sequence[int]) -> Optional[dict]:
        """Precompute static numpy arrays for the device-side correction.

        Returns a dict of numpy arrays (converted to jnp by the runner):
          dark (*sig) f32 | None
          gain (*sig) f32 | None
          repair_idx (k,) int32 flat sig indices of excluded pixels
          nbr_idx (k, m) int32 flat sig indices of repair neighbors
          nbr_w (k, m) f32 normalized weights (0 for padding)
        """
        sig_shape = tuple(int(s) for s in sig_shape)
        key = sig_shape
        if key in self._cache:
            return self._cache[key]
        if not self.have_corrections():
            self._cache[key] = None
            return None
        for name, arr in (("dark", self._dark), ("gain", self._gain)):
            if arr is not None and arr.shape != sig_shape:
                # broadcastable-but-wrong arrays ((1, w), (w,)) would
                # silently apply the same row everywhere
                raise ValueError(
                    f"{name} frame shape {arr.shape} != detector sig "
                    f"shape {sig_shape}"
                )
        plan = {
            "dark": self._dark,
            "gain": self._gain,
            "repair_idx": None,
            "nbr_idx": None,
            "nbr_w": None,
        }
        if (
            self._excluded_coords is not None
            and len(self._excluded_coords) > 0
        ):
            idx, nbr, w = _neighbor_plan(self._excluded_coords, sig_shape)
            plan["repair_idx"] = idx
            plan["nbr_idx"] = nbr
            plan["nbr_w"] = w
        self._cache[key] = plan
        return plan

    def adjust_scheme(self, scheme, dataset_shape):
        """Veto sig-tiling that would split pixel-repair environments
        (reference corrset.py:181): fall back to whole-frame tiles,
        shrinking the block depth so the staged block stays within
        the device budget the sig split existed to protect."""
        from .tiling import Negotiator, TilingScheme
        from ..common.shape import Shape
        if (
            self._excluded_coords is None
            or len(self._excluded_coords) == 0
            or len(scheme) <= 1
        ):
            return scheme
        frame_bytes = dataset_shape.sig.size * 4  # f32 on device
        depth = scheme.depth
        budget = Negotiator.TARGET_BLOCK_BYTES
        if depth * frame_bytes > budget:
            depth = max(1, budget // frame_bytes)
        tileshape = Shape(
            (depth,) + tuple(dataset_shape.sig),
            sig_dims=dataset_shape.sig.dims,
        )
        return TilingScheme.make_for_shape(
            tileshape, dataset_shape, intent=scheme.intent
        )

    def apply_numpy(self, frames: np.ndarray) -> np.ndarray:
        """Host/numpy reference implementation (for tests)."""
        sig_shape = frames.shape[1:]
        out = frames.astype(np.float32, copy=True)
        if self._dark is not None:
            out -= self._dark
        if self._gain is not None:
            out *= self._gain
        plan = self.make_plan(sig_shape)
        if plan is not None and plan["repair_idx"] is not None:
            flat = out.reshape(out.shape[0], -1)
            vals = flat[:, plan["nbr_idx"]]  # (n, k, m)
            mean = (vals * plan["nbr_w"]).sum(axis=-1)
            flat[:, plan["repair_idx"]] = mean
        return out


def _neighbor_plan(
    coords: np.ndarray, sig_shape: tuple
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Growing-environment neighbor indices for each excluded pixel.

    For each excluded pixel, grow a centered square/cube environment
    (radius 1, 2, ...) until it contains at least one valid (in-bounds,
    non-excluded) pixel; average over all valid pixels at that radius.
    """
    ndim = len(sig_shape)
    excluded_set = {tuple(c) for c in coords}
    k = len(coords)
    nbr_lists = []
    max_m = 0
    for c in coords:
        found: list[int] = []
        for radius in range(1, max(sig_shape) + 1):
            ranges = [
                range(
                    max(0, int(c[d]) - radius),
                    min(sig_shape[d], int(c[d]) + radius + 1),
                )
                for d in range(ndim)
            ]
            pts = np.stack(
                np.meshgrid(*ranges, indexing="ij"), axis=-1
            ).reshape(-1, ndim)
            found = [
                int(np.ravel_multi_index(tuple(p), sig_shape))
                for p in pts
                if tuple(p) not in excluded_set
            ]
            if found:
                break
        if not found:  # everything excluded — repair with itself
            found = [int(np.ravel_multi_index(tuple(c), sig_shape))]
        nbr_lists.append(found)
        max_m = max(max_m, len(found))
    nbr_idx = np.zeros((k, max_m), dtype=np.int32)
    nbr_w = np.zeros((k, max_m), dtype=np.float32)
    for i, lst in enumerate(nbr_lists):
        nbr_idx[i, :len(lst)] = lst
        nbr_w[i, :len(lst)] = 1.0 / len(lst)
    repair_idx = np.array(
        [np.ravel_multi_index(tuple(c), sig_shape) for c in coords],
        dtype=np.int32,
    )
    return repair_idx, nbr_idx, nbr_w
