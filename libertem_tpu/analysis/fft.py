"""FFT-based analyses: FFT of picked frame, FFT of sum, FFT-space mask
applied per frame.

Reference: libertem/analysis/rawfft.py:37 (PICK_FFT_FRAME),
sumfft.py:39 (FFTSUM_FRAMES), apply_fft_mask.py:33 (APPLY_FFT_MASK).

The per-frame FFT-mask product runs on device as a batched jnp.fft
over the tile (XLA-fused) — the reference loops masked FFTs per frame
on the host.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..common.analysis import AnalysisResult, AnalysisResultSet
from ..udf.base import UDF
from ..viz.base import visualize_simple
from .base import BaseAnalysis
from .raw import PickFrameAnalysis
from .sum import SumAnalysis


def _fft_ring_mask(sig_shape, rad_in, rad_out):
    """fftshift-space ring, returned in fft layout."""
    h, w = sig_shape
    cy, cx = h // 2, w // 2
    y, x = np.ogrid[0:h, 0:w]
    d = np.sqrt((y - cy) ** 2 + (x - cx) ** 2)
    # reference semantics (crystallinity.py:59: disk(out) - disk(in)
    # with d <= r disks): rad_in < d <= rad_out
    sel = (d > rad_in) & (d <= rad_out)
    return np.fft.ifftshift(sel).astype(np.float32)


def _real_aperture(sig_shape, real_rad, real_cy, real_cx):
    """Real-space mask BLOCKING the zero-order peak: 1 - disk
    (reference crystallinity.py:54 '1-1*_make_circular_mask')."""
    if real_rad is None or real_cy is None or real_cx is None:
        return None
    h, w = sig_shape
    y, x = np.ogrid[0:h, 0:w]
    return 1.0 - (
        ((y - real_cy) ** 2 + (x - real_cx) ** 2) <= real_rad ** 2
    ).astype(np.float32)


class ApplyFFTMaskUDF(UDF):
    """sum(|FFT(aperture*frame)| * fourier_ring) per frame."""

    def __init__(self, rad_in, rad_out, real_rad=None,
                 real_centery=None, real_centerx=None):
        super().__init__(
            rad_in=rad_in, rad_out=rad_out, real_rad=real_rad,
            real_centery=real_centery, real_centerx=real_centerx,
        )
        self._masks = None

    def get_result_buffers(self):
        return {"intensity": self.buffer(kind="nav", dtype="float32")}

    def get_tiling_preferences(self):
        # per-frame FFT needs whole frames
        return {"whole_frames": True,
                "depth": self.TILE_DEPTH_DEFAULT,
                "total_size": self.TILE_SIZE_MAX}

    def on_params_updated(self):
        self._masks = None

    def _get_masks(self):
        if self._masks is None:
            sig = self.meta.sig_shape
            ring = jnp.asarray(_fft_ring_mask(
                sig, self.params.rad_in, self.params.rad_out
            ))
            ap = _real_aperture(
                sig, self.params.real_rad, self.params.real_centery,
                self.params.real_centerx,
            )
            self._masks = (
                ring, None if ap is None else jnp.asarray(ap)
            )
        return self._masks

    def process_tile(self, tile):
        ring, aperture = self._get_masks()
        x = tile.astype(jnp.float32)
        if aperture is not None:
            x = x * aperture
        spec = jnp.abs(jnp.fft.fft2(x))
        self.results.intensity += (spec * ring).sum(axis=(1, 2))


class ApplyFFTMask(BaseAnalysis, id_="APPLY_FFT_MASK"):
    def get_udf(self):
        p = self.parameters
        return ApplyFFTMaskUDF(
            rad_in=p["rad_in"], rad_out=p["rad_out"],
            real_rad=p.get("real_rad"),
            real_centery=p.get("real_centery"),
            real_centerx=p.get("real_centerx"),
        )

    def get_udf_results(self, udf_results, roi, damage):
        data = udf_results["intensity"].data
        dmg = self.nav_damage(damage)
        return AnalysisResultSet([
            AnalysisResult(
                raw_data=data,
                visualized=lambda: visualize_simple(data, damage=dmg),
                key="intensity", title="intensity",
                desc="Fourier-space ring intensity per scan position",
            ),
        ], raw_results=udf_results)


class PickFFTFrameAnalysis(PickFrameAnalysis, id_="PICK_FFT_FRAME"):
    def get_udf_results(self, udf_results, roi, damage):
        frame = np.asarray(
            udf_results["intensity"].data, dtype=np.float64
        )[0]
        p = self.parameters
        ap = _real_aperture(
            frame.shape, p.get("real_rad"),
            p.get("real_centery"), p.get("real_centerx"),
        )
        if ap is not None:
            frame = frame * ap
        fft = np.fft.fftshift(np.abs(np.fft.fft2(frame)))
        coords_str = ", ".join(str(c) for c in self.get_coords())
        return AnalysisResultSet([
            AnalysisResult(
                raw_data=fft,
                visualized=lambda: visualize_simple(
                    fft, logarithmic=True
                ),
                key="intensity", title=f"FFT of frame ({coords_str})",
                desc="magnitude spectrum of the selected frame",
            ),
        ], raw_results=udf_results)


class SumfftAnalysis(SumAnalysis, id_="FFTSUM_FRAMES"):
    def get_udf_results(self, udf_results, roi, damage):
        total = np.asarray(
            udf_results["intensity"].data, dtype=np.float64
        )
        p = self.parameters
        ap = _real_aperture(
            total.shape, p.get("real_rad"),
            p.get("real_centery"), p.get("real_centerx"),
        )
        if ap is not None:
            total = total * ap
        fft = np.fft.fftshift(np.abs(np.fft.fft2(total)))
        return AnalysisResultSet([
            AnalysisResult(
                raw_data=fft,
                visualized=lambda: visualize_simple(
                    fft, logarithmic=True
                ),
                key="intensity", title="FFT of the sum of frames",
                desc="magnitude spectrum of the summed frames",
            ),
        ], raw_results=udf_results)
