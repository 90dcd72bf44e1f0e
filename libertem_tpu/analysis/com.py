"""Center-of-mass analysis
(reference: libertem/analysis/com.py:188, id CENTER_OF_MASS;
parameter-guess RPC :139).
"""
from __future__ import annotations

import numpy as np

from ..common.analysis import AnalysisResult, AnalysisResultSet
from ..udf.com import CoMUDF, guess_corrections
from ..viz.base import rgb_from_2dvector, visualize_simple
from .base import BaseAnalysis
from .getroi import get_roi


class COMAnalysis(BaseAnalysis, id_="CENTER_OF_MASS"):
    def get_parameters(self, parameters: dict) -> dict:
        h, w = tuple(self.dataset.shape.sig)
        return {
            "cx": parameters.get("cx", w / 2),
            "cy": parameters.get("cy", h / 2),
            "r": parameters.get("r"),
            "ri": parameters.get("ri"),
            "flip_y": parameters.get("flip_y", False),
            "scan_rotation": parameters.get("scan_rotation", 0.0),
            **{k: v for k, v in parameters.items()
               if k not in ("cx", "cy", "r", "ri", "flip_y",
                            "scan_rotation")},
        }

    def get_udf(self):
        p = self.parameters
        return CoMUDF.with_params(
            cy=p["cy"], cx=p["cx"], r=p["r"], ri=p["ri"],
            scan_rotation=p["scan_rotation"], flip_y=p["flip_y"],
        )

    def get_roi(self):
        return get_roi(self.parameters, self.dataset.shape.nav)

    def get_udf_results(self, udf_results, roi, damage):
        dmg = self.nav_damage(damage)
        fy = udf_results["field_y"].data
        fx = udf_results["field_x"].data
        mag = udf_results["magnitude"].data
        div = udf_results["divergence"].data
        curl = udf_results["curl"].data
        return AnalysisResultSet([
            AnalysisResult(
                raw_data=np.stack([fy, fx], axis=-1),
                visualized=lambda: rgb_from_2dvector(fy, fx),
                key="field", title="field",
                desc="center-of-mass shift vector field",
            ),
            AnalysisResult(
                raw_data=mag,
                visualized=lambda: visualize_simple(mag, damage=dmg),
                key="magnitude", title="magnitude",
                desc="magnitude of the CoM shift",
            ),
            AnalysisResult(
                raw_data=div,
                visualized=lambda: visualize_simple(div, damage=dmg),
                key="divergence", title="divergence",
                desc="divergence of the CoM field",
            ),
            AnalysisResult(
                raw_data=curl,
                visualized=lambda: visualize_simple(curl, damage=dmg),
                key="curl", title="curl",
                desc="curl of the CoM field",
            ),
            AnalysisResult(
                raw_data=fx,
                visualized=lambda: visualize_simple(fx, damage=dmg),
                key="x", title="x shift",
                desc="x component of the CoM shift",
            ),
            AnalysisResult(
                raw_data=fy,
                visualized=lambda: visualize_simple(fy, damage=dmg),
                key="y", title="y shift",
                desc="y component of the CoM shift",
            ),
        ], raw_results=udf_results)

    @classmethod
    def get_rpc_definitions(cls) -> dict:
        return {"guess_parameters": GuessParametersProc}


class GuessParametersProc:
    """CoM parameter-guess RPC
    (reference: com.py:139 ParameterGuessProc)."""

    async def __call__(self, rpc_context):
        analysis = rpc_context.get_analysis()
        res = rpc_context.run_analysis_default(analysis)
        y = res["y"].raw_data
        x = res["x"].raw_data
        guess = guess_corrections(y, x)
        return {"status": "ok", "guess": guess}
