"""ROI construction from GUI parameters
(reference: libertem/analysis/getroi.py:27)."""
from __future__ import annotations

from typing import Optional

import numpy as np


def get_roi(params: dict, shape) -> Optional[np.ndarray]:
    """Build a boolean nav-shaped roi from GUI roi params.

    Supported shapes: {"shape": "disk", cx, cy, r} and
    {"shape": "rect", x, y, width, height}; anything else → None.
    """
    roi_params = params.get("roi", {})
    if not roi_params:
        return None
    nav = tuple(shape)
    kind = roi_params.get("shape")
    # the GUI selections are 2D gestures: apply them to the LAST two
    # nav dims (broadcast over any leading dims); 1D nav treats the
    # single axis as x with y pinned to 0
    if kind == "disk":
        cx, cy, r = (
            roi_params["cx"], roi_params["cy"], roi_params["r"]
        )
        if len(nav) == 1:
            x = np.arange(nav[0])
            sel = ((0 - cy) ** 2 + (x - cx) ** 2) <= r ** 2
            return sel
        y, x = np.ogrid[0:nav[-2], 0:nav[-1]]
        sel = ((y - cy) ** 2 + (x - cx) ** 2) <= r ** 2
        return np.broadcast_to(sel, nav).copy()
    if kind == "rect":
        x, y = roi_params["x"], roi_params["y"]
        w, h = roi_params["width"], roi_params["height"]
        mask = np.zeros(nav, dtype=bool)
        if len(nav) == 1:
            mask[int(x):int(x + w)] = True
        else:
            mask[..., int(y):int(y + h), int(x):int(x + w)] = True
        return mask
    return None
