"""Sum-of-frames analysis
(reference: libertem/analysis/sum.py:91, id SUM_FRAMES)."""
from __future__ import annotations

import numpy as np

from ..common.analysis import AnalysisResult, AnalysisResultSet
from ..udf.sum import SumUDF
from ..viz.base import visualize_simple
from .base import BaseAnalysis


class SumAnalysis(BaseAnalysis, id_="SUM_FRAMES"):
    def get_udf(self):
        return SumUDF()

    def get_udf_results(self, udf_results, roi, damage):
        data = udf_results["intensity"].data
        if np.iscomplexobj(data):
            return AnalysisResultSet(
                self.get_complex_results(
                    data, key_prefix="intensity", title="intensity",
                    desc="sum of frames",
                ),
                raw_results=udf_results,
            )
        return AnalysisResultSet([
            AnalysisResult(
                raw_data=data,
                visualized=lambda: visualize_simple(data),
                key="intensity", title="intensity",
                desc="sum of frames",
            ),
            AnalysisResult(
                raw_data=data,
                visualized=lambda: visualize_simple(
                    data, logarithmic=True
                ),
                key="intensity_log", title="intensity [log]",
                desc="sum of frames (log scale)",
            ),
        ], raw_results=udf_results)
