"""Off-axis electron holography reconstruction.

The reference moved this to the LiberTEM-holo sibling package
(libertem/udf/holography.py:11 raises pointing there); a working
TPU-native implementation ships here since the sideband method is a
natural fit for the batched-FFT tile path:

    wave = IFFT( window( FFT(hologram) shifted to the sideband ) )

Per tile: one batched 2D FFT, a static roll to center the sideband,
a static aperture multiply, one batched inverse FFT — all fused into
the jit-compiled step.  Use
:func:`libertem_tpu.utils.generate.hologram_frame` for synthetic
test data.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .base import UDF


def estimate_sideband_position(
    holo: np.ndarray, central_band_mask_radius: Optional[float] = None,
) -> tuple:
    """(y, x) of the strongest sideband in FFT coordinates (the
    carrier peak outside the masked central band)."""
    holo = np.asarray(holo, dtype=np.float64)
    h, w = holo.shape
    spec = np.abs(np.fft.fft2(holo))
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    r = np.sqrt(fy ** 2 + fx ** 2)
    if central_band_mask_radius is None:
        central_band_mask_radius = 0.05
    spec = np.where(r > central_band_mask_radius, spec, 0.0)
    # use only the upper half-plane: sidebands are conjugate pairs
    spec[h // 2:, :] = 0.0
    iy, ix = np.unravel_index(np.argmax(spec), spec.shape)
    return int(iy), int(ix)


def estimate_sideband_size(sb_position, holo_shape,
                           fraction: float = 0.5) -> float:
    """Aperture radius: a fraction of the sideband distance from the
    origin (in FFT pixel units)."""
    h, w = holo_shape
    dy = min(sb_position[0], h - sb_position[0])
    dx = min(sb_position[1], w - sb_position[1])
    return float(np.hypot(dy, dx) * fraction)


def _aperture(shape, radius, smoothness: float = 0.05) -> np.ndarray:
    """Centered (at index 0,0 in fft layout) smoothed circular
    aperture."""
    h, w = shape
    fy = np.fft.fftfreq(h) * h
    fx = np.fft.fftfreq(w) * w
    r = np.sqrt(fy[:, None] ** 2 + fx[None, :] ** 2)
    edge = max(1.0, smoothness * radius)
    ap = np.clip((radius - r) / edge + 0.5, 0.0, 1.0)
    return ap.astype(np.float32)


class HoloReconstructUDF(UDF):
    """Reconstruct complex object waves from off-axis holograms.

    Parameters
    ----------
    out_shape : (int, int)
        Output wave shape (the sideband is cropped in Fourier space,
        i.e. reconstruction is downsampled to this shape).
    sb_position : (int, int)
        Sideband position in FFT coordinates of the full frame
        (see :func:`estimate_sideband_position`).
    sb_size : float
        Aperture radius in FFT pixels
        (see :func:`estimate_sideband_size`).
    sb_smoothness : float
        Aperture edge smoothness as a fraction of sb_size.
    """

    def __init__(self, out_shape=None, sb_position=None,
                 sb_size=None, sb_smoothness=0.05):
        if sb_position is None or sb_size is None:
            raise ValueError(
                "sb_position and sb_size are required (see "
                "estimate_sideband_position/size)"
            )
        super().__init__(
            out_shape=tuple(out_shape) if out_shape else None,
            sb_position=tuple(int(v) for v in sb_position),
            sb_size=float(sb_size),
            sb_smoothness=float(sb_smoothness),
        )
        self._plan = None

    def on_params_updated(self):
        self._plan = None

    def _get_out_shape(self):
        if self.params.out_shape is not None:
            oh, ow = self.params.out_shape
            sh, sw = self.meta.sig_shape
            if oh > sh or ow > sw:
                # the Fourier crop can only shrink: a larger
                # out_shape would silently duplicate frequency
                # rows/columns (sig < out <= 2*sig concatenates
                # overlapping head/tail slices without any error)
                raise ValueError(
                    f"out_shape {(oh, ow)} exceeds the frame shape "
                    f"{(sh, sw)}; the sideband crop can only "
                    "downsample"
                )
            return self.params.out_shape
        return self.meta.sig_shape

    def get_result_buffers(self):
        return {
            "wave": self.buffer(
                kind="nav", extra_shape=self._get_out_shape(),
                dtype="complex64",
            ),
        }

    def get_tiling_preferences(self):
        return {"whole_frames": True,
                "depth": self.TILE_DEPTH_DEFAULT,
                "total_size": self.TILE_SIZE_MAX}

    def _get_plan(self):
        if self._plan is None:
            oh, ow = self._get_out_shape()
            # numpy cache (tracer-safe)
            self._plan = _aperture(
                (oh, ow), self.params.sb_size,
                self.params.sb_smoothness,
            )
        return jnp.asarray(self._plan)

    def process_tile(self, tile):
        sy, sx = self.params.sb_position
        oh, ow = self._get_out_shape()
        aperture = self._get_plan()
        spec = jnp.fft.fft2(tile.astype(jnp.float32))
        # move the sideband to the origin
        spec = jnp.roll(spec, (-sy, -sx), axis=(-2, -1))
        # crop in fft layout: low frequencies live at the corners
        top = spec[..., : oh // 2 + oh % 2, :]
        bot = spec[..., -(oh // 2):, :] if oh // 2 else top[..., :0, :]
        spec = jnp.concatenate([top, bot], axis=-2)
        left = spec[..., :, : ow // 2 + ow % 2]
        right = (
            spec[..., :, -(ow // 2):] if ow // 2
            else left[..., :, :0]
        )
        spec = jnp.concatenate([left, right], axis=-1)
        wave = jnp.fft.ifft2(spec * aperture)
        self.results.wave = wave.astype(jnp.complex64)
