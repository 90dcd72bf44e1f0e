"""Blobfinder-style correlation peak finding.

Counterpart of the LiberTEM-blobfinder sibling package (referenced in
the reference's README.rst:61 and BASELINE config #4): locate
diffraction peaks per frame by cross-correlating with a match
pattern, with subpixel refinement — the basis of strain mapping.

TPU-native design: the whole correlation runs batched inside the tile
step — one 2D FFT over the frame block, one multiply with the
conjugate template spectrum, one inverse FFT (all XLA-native batched
ops on the device), then peak extraction:

* :class:`FullFrameCorrelationUDF` — argmax over the full correlation
  map per frame + 3x3 center-of-mass subpixel refinement.
* :class:`SparseCorrelationUDF` — refine ONLY around expected peak
  positions (a static gather of small windows around each peak),
  giving per-peak positions/strengths for lattice/strain fitting.

Match patterns (`RadialGradient`, `Disk`, `BackgroundSubtraction`)
mirror the blobfinder pattern library.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import masks as mask_lib
from .base import UDF


class MatchPattern:
    """A correlation template, rendered into a fftshifted spectrum."""

    def __init__(self, search: float = 10.0):
        self.search = search

    def get_mask(self, sig_shape) -> np.ndarray:
        raise NotImplementedError()

    def get_template_spectrum(self, sig_shape) -> np.ndarray:
        """conj(FFT(centered template)) for correlation."""
        mask = self.get_mask(sig_shape)
        # center the template at (0, 0) so correlation peaks land on
        # the pattern positions
        return np.conj(
            np.fft.fft2(np.fft.ifftshift(mask))
        ).astype(np.complex64)


class Disk(MatchPattern):
    def __init__(self, radius: float, search: Optional[float] = None):
        super().__init__(search or 2 * radius)
        self.radius = radius

    def get_mask(self, sig_shape):
        h, w = sig_shape
        return mask_lib.circular(
            w // 2, h // 2, w, h, self.radius, antialiased=True
        )


class RadialGradient(MatchPattern):
    def __init__(self, radius: float, search: Optional[float] = None):
        super().__init__(search or 2 * radius)
        self.radius = radius

    def get_mask(self, sig_shape):
        h, w = sig_shape
        return mask_lib.radial_gradient(
            w // 2, h // 2, w, h, self.radius, antialiased=True
        )


class BackgroundSubtraction(MatchPattern):
    def __init__(self, radius: float, radius_outer: float,
                 search: Optional[float] = None):
        super().__init__(search or radius_outer)
        self.radius = radius
        self.radius_outer = radius_outer

    def get_mask(self, sig_shape):
        h, w = sig_shape
        return mask_lib.background_subtraction(
            w // 2, h // 2, w, h, self.radius_outer, self.radius,
            antialiased=True,
        )


def _subpixel_refine(corr, iy, ix):
    """3x3 center-of-mass refinement around an integer peak."""
    h, w = corr.shape[-2:]
    oy = jnp.arange(-1, 2, dtype=jnp.int32)
    ox = jnp.arange(-1, 2, dtype=jnp.int32)
    yy = jnp.clip(iy + oy[:, None], 0, h - 1)
    xx = jnp.clip(ix + ox[None, :], 0, w - 1)
    window = corr[..., yy, xx]
    window = window - window.min()
    total = jnp.maximum(window.sum(), 1e-12)
    dy = (window * oy[:, None]).sum() / total
    dx = (window * ox[None, :]).sum() / total
    return iy.astype(jnp.float32) + dy, ix.astype(jnp.float32) + dx


class FullFrameCorrelationUDF(UDF):
    """Correlate each frame with the pattern over the full frame and
    report the strongest peak (position, subpixel-refined, +
    strength)."""

    def __init__(self, match_pattern: MatchPattern, **kwargs):
        super().__init__(match_pattern=match_pattern, **kwargs)
        self._spectrum = None

    def on_params_updated(self):
        self._spectrum = None

    def get_result_buffers(self):
        return {
            "centers": self.buffer(
                kind="nav", extra_shape=(2,), dtype="float32"
            ),
            "refineds": self.buffer(
                kind="nav", extra_shape=(2,), dtype="float32"
            ),
            "peak_values": self.buffer(kind="nav", dtype="float32"),
        }

    def _require_whole_sig(self):
        """Correlation needs whole frames: a sig-split scheme (e.g.
        forced by a co-running UDF's small tile preference) would
        correlate partial frames and clamp full-frame peak coordinates
        silently under jit — refuse loudly instead."""
        if tuple(self.meta.sig_slice.shape) != tuple(
            self.meta.sig_shape
        ):
            from .base import UDFException
            raise UDFException(
                f"{type(self).__name__} needs whole frames but the "
                "tiling scheme splits sig (a co-running UDF requested "
                "small tiles?); run it in its own pass"
            )

    def get_tiling_preferences(self):
        return {"whole_frames": True,
                "depth": self.TILE_DEPTH_DEFAULT,
                "total_size": self.TILE_SIZE_MAX}

    def _get_spectrum(self):
        if self._spectrum is None:
            # numpy cache (tracer-safe)
            self._spectrum = (
                self.params.match_pattern.get_template_spectrum(
                    self.meta.sig_shape
                )
            )
        return jnp.asarray(self._spectrum)

    def process_tile(self, tile):
        self._require_whole_sig()
        spec = self._get_spectrum()
        f = jnp.fft.fft2(tile.astype(jnp.float32))
        corr = jnp.fft.ifft2(f * spec).real  # (depth, h, w)
        h, w = corr.shape[-2:]
        flat_idx = jnp.argmax(
            corr.reshape(corr.shape[0], -1), axis=-1
        )
        iy = (flat_idx // w).astype(jnp.int32)
        ix = (flat_idx % w).astype(jnp.int32)
        ref_y, ref_x = jax.vmap(_subpixel_refine)(corr, iy, ix)
        self.results.centers = jnp.stack(
            [iy, ix], axis=-1
        ).astype(jnp.float32)
        self.results.refineds = jnp.stack(
            [ref_y, ref_x], axis=-1
        )
        self.results.peak_values = corr.reshape(
            corr.shape[0], -1
        ).max(axis=-1)


class SparseCorrelationUDF(UDF):
    """Correlate around expected peak positions only: for each frame
    and each of N peaks, search the correlation maximum within a
    window of +-steps pixels — per-peak positions/strengths for
    lattice refinement."""

    def __init__(self, match_pattern: MatchPattern,
                 peaks: np.ndarray, steps: int = 5, **kwargs):
        peaks = np.asarray(peaks, dtype=np.int32)
        super().__init__(
            match_pattern=match_pattern, peaks=peaks, steps=steps,
            **kwargs,
        )
        self._spectrum = None
        self._windows = None

    def on_params_updated(self):
        self._spectrum = None
        self._windows = None

    def get_result_buffers(self):
        n = len(self._kwargs["peaks"])
        return {
            "centers": self.buffer(
                kind="nav", extra_shape=(n, 2), dtype="float32"
            ),
            "refineds": self.buffer(
                kind="nav", extra_shape=(n, 2), dtype="float32"
            ),
            "peak_values": self.buffer(
                kind="nav", extra_shape=(n,), dtype="float32"
            ),
        }

    _require_whole_sig = FullFrameCorrelationUDF._require_whole_sig

    def get_tiling_preferences(self):
        return {"whole_frames": True,
                "depth": self.TILE_DEPTH_DEFAULT,
                "total_size": self.TILE_SIZE_MAX}

    def _get_plan(self):
        if self._spectrum is None:
            self._spectrum = (
                self.params.match_pattern.get_template_spectrum(
                    self.meta.sig_shape
                )
            )
            steps = int(self.params.steps)
            size = 2 * steps + 1
            h, w = self.meta.sig_shape
            peaks = np.asarray(self.params.peaks)
            # (n_peaks, size, size) absolute coordinates.  The FFT
            # correlation is CIRCULAR, so windows near the border
            # wrap (modulo) rather than clip: clipping would
            # duplicate border cells and break the bijection between
            # the argmax index and the (dy, dx) offset (border peaks
            # got silently shifted centers).
            win_y = (
                peaks[:, 0:1, None] + np.arange(-steps, steps + 1)[
                    None, :, None
                ]
            ) % h
            win_x = (
                peaks[:, 1:2, None] + np.arange(-steps, steps + 1)[
                    None, None, :
                ]
            ) % w
            self._windows = (
                np.ascontiguousarray(np.broadcast_to(
                    win_y, (len(peaks), size, size)
                )),
                np.ascontiguousarray(np.broadcast_to(
                    win_x, (len(peaks), size, size)
                )),
            )
        return jnp.asarray(self._spectrum), (
            jnp.asarray(self._windows[0]),
            jnp.asarray(self._windows[1]),
        )

    def process_tile(self, tile):
        self._require_whole_sig()
        spec, (wy, wx) = self._get_plan()
        steps = int(self.params.steps)
        size = 2 * steps + 1
        peaks = jnp.asarray(self.params.peaks)
        f = jnp.fft.fft2(tile.astype(jnp.float32))
        corr = jnp.fft.ifft2(f * spec).real  # (depth, h, w)
        # (depth, n_peaks, size, size) windows around expected peaks
        wins = corr[:, wy, wx]
        flat = wins.reshape(wins.shape[0], wins.shape[1], -1)
        idx = jnp.argmax(flat, axis=-1)
        dy = (idx // size).astype(jnp.float32) - steps
        dx = (idx % size).astype(jnp.float32) - steps
        centers = (
            peaks[None].astype(jnp.float32)
            + jnp.stack([dy, dx], axis=-1)
        )
        # subpixel: CoM over the window, relative to expected peak
        w0 = flat - flat.min(axis=-1, keepdims=True)
        total = jnp.maximum(w0.sum(axis=-1), 1e-12)
        gy = jnp.arange(size, dtype=jnp.float32) - steps
        grid_y = jnp.repeat(gy, size)
        grid_x = jnp.tile(gy, size)
        ry = (w0 * grid_y).sum(axis=-1) / total
        rx = (w0 * grid_x).sum(axis=-1) / total
        refineds = (
            peaks[None].astype(jnp.float32)
            + jnp.stack([ry, rx], axis=-1)
        )
        self.results.centers = centers
        self.results.refineds = refineds
        self.results.peak_values = flat.max(axis=-1)


def run_blobfinder(
    ctx, dataset, match_pattern: MatchPattern,
    peaks: Optional[np.ndarray] = None, steps: int = 5, roi=None,
):
    """Convenience wrapper: full-frame when no expected peaks are
    given, else sparse refinement around them."""
    if peaks is None:
        udf = FullFrameCorrelationUDF(match_pattern=match_pattern)
    else:
        udf = SparseCorrelationUDF(
            match_pattern=match_pattern, peaks=peaks, steps=steps,
        )
    return ctx.run_udf(dataset, udf, roi=roi)


def fit_lattice(refineds, peaks, zero, a, b):
    """Per-frame affine lattice fit from refined peak positions.

    For each scan position, solve least squares for (zero', a', b')
    in  pos_k = zero' + h_k * a' + k_k * b'  where (h_k, k_k) are the
    integer indices of ``peaks`` relative to the nominal lattice
    (zero, a, b).  Returns a dict of per-frame arrays:
    zero / a / b (each (..., 2)) and the 2x2 strain-related gradient
    components da_rel, db_rel (relative length changes) and rotation.

    This is the strain-mapping step on top of SparseCorrelationUDF
    (the reference hosts the equivalent in LiberTEM-blobfinder).
    """
    refineds = np.asarray(refineds, dtype=np.float64)
    peaks = np.asarray(peaks, dtype=np.float64)
    zero = np.asarray(zero, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    nav_shape = refineds.shape[:-2]
    n_peaks = refineds.shape[-2]
    flat = refineds.reshape(-1, n_peaks, 2)

    # integer lattice indices of the nominal peaks
    M = np.stack([a, b], axis=-1)  # (2, 2), columns a and b
    hk = np.linalg.solve(M, (peaks - zero).T).T  # (n_peaks, 2)
    hk = np.round(hk)

    # design matrix: pos = A @ [zero_y zero_x a_y a_x b_y b_x]
    A = np.zeros((n_peaks * 2, 6))
    for k in range(n_peaks):
        h, kk = hk[k]
        A[2 * k] = [1, 0, h, 0, kk, 0]
        A[2 * k + 1] = [0, 1, 0, h, 0, kk]
    rhs = flat.reshape(-1, n_peaks * 2).T  # (n_peaks*2, n_frames)
    sol, *_ = np.linalg.lstsq(A, rhs, rcond=None)  # (6, n_frames)
    sol = sol.T  # (n_frames, 6)
    zero_f = sol[:, 0:2].reshape(nav_shape + (2,))
    a_f = sol[:, 2:4].reshape(nav_shape + (2,))
    b_f = sol[:, 4:6].reshape(nav_shape + (2,))
    la = np.linalg.norm(a)
    lb = np.linalg.norm(b)
    da_rel = (
        np.linalg.norm(sol[:, 2:4], axis=-1) / max(la, 1e-12) - 1.0
    ).reshape(nav_shape)
    db_rel = (
        np.linalg.norm(sol[:, 4:6], axis=-1) / max(lb, 1e-12) - 1.0
    ).reshape(nav_shape)
    rot_a = (
        np.arctan2(sol[:, 2], sol[:, 3])
        - np.arctan2(a[0], a[1])
    ).reshape(nav_shape)
    return {
        "zero": zero_f, "a": a_f, "b": b_f,
        "da_rel": da_rel, "db_rel": db_rel, "rotation": rot_a,
    }
