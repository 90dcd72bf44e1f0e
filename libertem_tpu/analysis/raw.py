"""Pick-frame analysis
(reference: libertem/analysis/raw.py:83, id PICK_FRAME)."""
from __future__ import annotations

import numpy as np

from ..common.analysis import AnalysisResult, AnalysisResultSet
from ..common.math import prod
from ..udf.raw import PickUDF
from ..viz.base import visualize_simple
from .base import BaseAnalysis


class PickFrameAnalysis(BaseAnalysis, id_="PICK_FRAME"):
    def get_coords(self):
        nav = tuple(self.dataset.shape.nav)
        p = self.parameters
        # reference validation (analysis/raw.py): the coordinate
        # count must match the nav dimensionality exactly
        expected = {1: ("x",), 2: ("x", "y"),
                    3: ("x", "y", "z")}.get(len(nav))
        if expected is None:
            raise ValueError(
                f"cannot pick from a {len(nav)}D navigation shape"
            )
        given = tuple(
            k for k in ("x", "y", "z") if p.get(k) is not None
        )
        if set(given) != set(expected):
            raise ValueError(
                f"for a {len(nav)}D navigation shape, pick needs "
                f"exactly the coordinates {expected}, got "
                f"{given or ('nothing',)}"
            )
        if len(nav) == 1:
            return (int(p["x"]),)
        coords = (int(p["y"]), int(p["x"]))
        if len(nav) == 3:
            coords = (int(p["z"]),) + coords
        return coords

    def get_udf(self):
        return PickUDF()

    def get_roi(self):
        nav = tuple(self.dataset.shape.nav)
        roi = np.zeros(prod(nav), dtype=bool)
        roi[np.ravel_multi_index(self.get_coords(), nav)] = True
        return roi

    def get_udf_results(self, udf_results, roi, damage):
        frame = np.asarray(udf_results["intensity"].data)[0]
        coords_str = ", ".join(str(c) for c in self.get_coords())
        results = []
        if np.iscomplexobj(frame):
            results.extend(self.get_complex_results(
                frame, key_prefix="intensity",
                title=f"frame ({coords_str})",
                desc="the frame at the selected scan position",
                # reference raw.py:145: bare key is log-scaled
                default_lin=False,
            ))
        else:
            # reference channel pair (raw.py:151): 'intensity' log,
            # 'intensity_lin' linear
            results.append(AnalysisResult(
                raw_data=frame,
                visualized=lambda: visualize_simple(
                    frame, logarithmic=True
                ),
                key="intensity",
                title=f"frame ({coords_str}) [log]",
                desc="the frame at the selected scan position (log)",
            ))
            results.append(AnalysisResult(
                raw_data=frame,
                visualized=lambda: visualize_simple(frame),
                key="intensity_lin",
                title=f"frame ({coords_str}) [lin]",
                desc="the frame at the selected scan position",
            ))
        return AnalysisResultSet(results, raw_results=udf_results)
