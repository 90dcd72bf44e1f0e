"""Radial Fourier series analysis
(reference: libertem/analysis/radialfourier.py:164, id RADIAL_FOURIER;
sparse radial-bin Fourier masks radial_mask_factory:106, numba ring
modulation _radial_mask_product:150).

TPU-native: the complex mask stack ``ring_b(r) * exp(i·o·phi)`` for
every (bin, order) pair is packed into one flattened complex matmul
operand — the per-frame Fourier coefficients of all bins/orders come
out of a single MXU pass, replacing the reference's numba sparse
product.
"""
from __future__ import annotations

import numpy as np

from ..common.analysis import AnalysisResult, AnalysisResultSet
from ..masks import polar_map, radial_bins
from ..udf.masks import ApplyMasksUDF
from ..viz.base import rgb_from_2dvector, visualize_simple
from .base import BaseAnalysis


def radial_fourier_masks(
    sig_shape, cx, cy, ri, ro, n_bins, max_order,
):
    """(n_bins*(max_order+1), *sig) complex64 stack: antialiased ring
    b modulated by exp(i*order*phi), matching the reference's
    radial_mask_factory (radialfourier.py:106) — unnormalized; display
    normalization happens in get_udf_results like the reference."""
    h, w = sig_shape
    bins = radial_bins(
        cx, cy, w, h, radius=ro, radius_inner=ri, n_bins=n_bins
    )
    _, phi = polar_map(cx, cy, w, h)
    # build the modulator in f64 and cast ONCE at the end: an
    # f32-truncated phase makes o*(phi - pi) drift ~4e-7 rad from
    # o*phi - o*pi, so mirrored pixels lose their exact m(-p) = ±m(p)
    # symmetry and symmetric frames stop cancelling (reference
    # test_symmetries, atol 1e-6).  f64 phases keep mirrored values
    # within ~1e-15 relative, so the final c64 rounding lands them on
    # the SAME float32 — cancellation is then exact given a wide
    # accumulator (the c128 host path engages for f64 datasets).
    orders = np.arange(max_order + 1, dtype=np.float64)
    modulator = np.exp(1j * phi * orders[:, None, None])
    stack = (
        bins[:, None, :, :].astype(np.float64) * modulator[None]
    )
    return stack.reshape(-1, h, w).astype(np.complex64)


class RadialFourierAnalysis(BaseAnalysis, id_="RADIAL_FOURIER"):
    def get_parameters(self, parameters: dict) -> dict:
        h, w = tuple(self.dataset.shape.sig)
        ro = parameters.get("ro") or min(h, w) / 2
        ri = parameters.get("ri") or 0
        # reference defaults (radialfourier.py:326-327): ONE bin, 24
        # orders — a derived many-bin default would mean hundreds of
        # result channels, each PNG-encoded on every web push
        n_bins = parameters.get("n_bins") or 1
        max_order = parameters.get("max_order") or 24
        return {
            # keep roi/other keys — BaseAnalysis.get_roi reads
            # parameters["roi"]
            **parameters,
            "cx": parameters.get("cx", w / 2),
            "cy": parameters.get("cy", h / 2),
            "ri": ri, "ro": ro,
            "n_bins": int(n_bins), "max_order": int(max_order),
        }

    def get_udf(self):
        p = self.parameters
        sig = tuple(self.dataset.shape.sig)

        def factory():
            return radial_fourier_masks(
                sig, p["cx"], p["cy"], p["ri"], p["ro"],
                p["n_bins"], p["max_order"],
            )

        return ApplyMasksUDF(
            mask_factories=factory,
            mask_count=p["n_bins"] * (p["max_order"] + 1),
            mask_dtype=np.complex64,
        )

    def get_udf_results(self, udf_results, roi, damage):
        p = self.parameters
        n_bins, max_order = p["n_bins"], p["max_order"]
        dmg = self.nav_damage(damage)
        data = udf_results["intensity"].data
        nav_shape = data.shape[:-1]
        coeffs = data.reshape(nav_shape + (n_bins, max_order + 1))
        absolute = np.abs(coeffs)
        # reference dominant-order rule (radialfourier.py:207-213):
        # threshold on RAW magnitudes — positions where all higher
        # orders are below 20% of the bin's max |c| get dominant=0.
        # (the max(1, |c0|) normalization in the reference only sets
        # display limits for the absolute channels, not the threshold)
        # ROI runs fill non-selected positions with NaN; a plain max
        # would poison the per-bin threshold (NaN) and disable the
        # below-test entirely — reduce with nanmax and mark invalid
        # positions explicitly
        invalid = np.isnan(absolute).any(axis=-1)  # (*nav, n_bins)
        threshold = (
            np.nanmax(
                absolute[..., 1:].reshape(-1, n_bins, max_order),
                axis=(0, 2), initial=0.0,
            ) * 0.2
        )
        below = np.all(
            absolute[..., 1:] < threshold[:, None], axis=-1
        )
        with np.errstate(invalid="ignore"):
            dominant = (
                np.argmax(
                    np.nan_to_num(absolute[..., 1:]), axis=-1
                ) + 1.0
            )
        dominant[below] = 0.0
        dominant[invalid] = np.nan
        results = []
        for b in range(n_bins):
            dom_b = dominant[..., b]
            results.append(AnalysisResult(
                raw_data=dom_b,
                visualized=(
                    lambda d=dom_b: visualize_simple(d, damage=dmg)
                ),
                key=f"dominant_{b}", title=f"dominant order [bin {b}]",
                desc="order with the largest relative Fourier "
                     "coefficient in this radial bin",
            ))
            for o in range(max_order + 1):
                arr = absolute[..., b, o]
                results.append(AnalysisResult(
                    raw_data=arr,
                    visualized=(
                        lambda a=arr: visualize_simple(a, damage=dmg)
                    ),
                    key=f"absolute_{b}_{o}",
                    title=f"|c{o}| [bin {b}]",
                    desc=f"magnitude of Fourier order {o} in radial "
                         f"bin {b}",
                ))
                if o > 0:
                    ph = np.angle(coeffs[..., b, o])
                    results.append(AnalysisResult(
                        raw_data=ph,
                        visualized=(
                            lambda a=ph: visualize_simple(
                                a, damage=dmg
                            )
                        ),
                        key=f"phase_{b}_{o}",
                        title=f"arg(c{o}) [bin {b}]",
                        desc=f"phase of Fourier order {o} in radial "
                             f"bin {b}",
                    ))
                # raw complex coefficient on the 2D-vector color
                # wheel (reference radialfourier.py:274)
                carr = coeffs[..., b, o]
                results.append(AnalysisResult(
                    raw_data=carr,
                    visualized=(
                        lambda a=carr: rgb_from_2dvector(
                            a.imag, a.real
                        )
                    ),
                    key=f"complex_{b}_{o}",
                    title=f"c{o} [bin {b}]",
                    desc=f"complex Fourier order {o} in radial "
                         f"bin {b}",
                ))
        return AnalysisResultSet(results, raw_results=udf_results)
