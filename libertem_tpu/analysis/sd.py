"""Standard-deviation analysis
(reference: libertem/analysis/sd.py:51, id SD_FRAMES)."""
from __future__ import annotations

from ..common.analysis import AnalysisResult, AnalysisResultSet
from ..udf.stddev import StdDevUDF
from ..viz.base import visualize_simple
from .base import BaseAnalysis


class SDAnalysis(BaseAnalysis, id_="SD_FRAMES"):
    def get_udf(self):
        return StdDevUDF()

    def get_udf_results(self, udf_results, roi, damage):
        var = udf_results["var"].data
        std = udf_results["std"].data
        mean = udf_results["mean"].data
        # reference channels (sd.py:62): 'intensity' is the STANDARD
        # DEVIATION log-scaled, 'intensity_lin' linear; variance/std/
        # mean stay available as extra channels
        return AnalysisResultSet([
            AnalysisResult(
                raw_data=std,
                visualized=lambda: visualize_simple(
                    std, logarithmic=True
                ),
                key="intensity", title="intensity [log]",
                desc="standard deviation of frames log-scaled",
            ),
            AnalysisResult(
                raw_data=std,
                visualized=lambda: visualize_simple(std),
                key="intensity_lin", title="intensity [lin]",
                desc="standard deviation of frames lin-scaled",
            ),
            AnalysisResult(
                raw_data=var,
                visualized=lambda: visualize_simple(var),
                key="variance", title="variance",
                desc="per-pixel variance over all frames",
            ),
            AnalysisResult(
                raw_data=std,
                visualized=lambda: visualize_simple(std),
                key="std", title="std",
                desc="per-pixel standard deviation",
            ),
            AnalysisResult(
                raw_data=mean,
                visualized=lambda: visualize_simple(mean),
                key="mean", title="mean",
                desc="per-pixel mean",
            ),
        ], raw_results=udf_results)
