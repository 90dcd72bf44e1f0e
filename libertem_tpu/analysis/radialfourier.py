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
from ..viz.base import visualize_simple
from .base import BaseAnalysis


def radial_fourier_masks(
    sig_shape, cx, cy, ri, ro, n_bins, max_order,
):
    """(n_bins*(max_order+1), *sig) complex64 stack; normalized per
    bin so order-0 equals the mean intensity in the bin."""
    h, w = sig_shape
    bins = radial_bins(
        cx, cy, w, h, radius=ro, radius_inner=ri, n_bins=n_bins
    )
    _, phi = polar_map(cx, cy, w, h)
    stack = np.empty(
        (n_bins * (max_order + 1), h, w), dtype=np.complex64
    )
    for b in range(n_bins):
        mask = bins[b]
        total = mask.sum()
        norm = mask / total if total > 0 else mask
        for o in range(max_order + 1):
            stack[b * (max_order + 1) + o] = (
                norm * np.exp(1j * o * phi)
            ).astype(np.complex64)
    return stack


class RadialFourierAnalysis(BaseAnalysis, id_="RADIAL_FOURIER"):
    def get_parameters(self, parameters: dict) -> dict:
        h, w = tuple(self.dataset.shape.sig)
        ro = parameters.get("ro") or min(h, w) / 2
        ri = parameters.get("ri") or 0
        n_bins = parameters.get("n_bins") or max(
            1, int(np.round((ro - ri) / 2))
        )
        max_order = parameters.get("max_order") or 8
        return {
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
        # normalize higher orders by order 0 before picking dominant
        with np.errstate(invalid="ignore", divide="ignore"):
            normalized = absolute[..., 1:] / (
                absolute[..., 0:1] + 1e-30
            )
        dominant = np.argmax(normalized, axis=-1) + 1.0
        results = []
        for b in range(n_bins):
            dom_b = dominant[..., b, :].reshape(nav_shape) if False \
                else dominant[..., b]
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
        return AnalysisResultSet(results, raw_results=udf_results)
