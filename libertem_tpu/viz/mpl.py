"""Matplotlib live plot (reference: libertem/viz/mpl.py:30)."""
from __future__ import annotations

import logging

import numpy as np

from .base import Live2DPlot, visualize_simple

log = logging.getLogger(__name__)


class MPLLive2DPlot(Live2DPlot):
    def __init__(self, *args, cmap="viridis", **kwargs):
        super().__init__(*args, **kwargs)
        self.cmap = cmap
        self.fig = None
        self.axes = None
        self.im_obj = None

    def display(self):
        import matplotlib.pyplot as plt
        self.fig, self.axes = plt.subplots()
        data = self.data
        if data is None:
            data = np.zeros(tuple(self.dataset.shape.nav)[:2])
        self.im_obj = self.axes.imshow(
            np.nan_to_num(np.asarray(data, dtype=np.float64)),
            cmap=self.cmap,
        )
        self.axes.set_title(self.title)
        return self.fig

    def update(self, damage, force=False):
        if self.im_obj is None or self.data is None:
            return
        raw = np.asarray(self.data, dtype=np.float64)
        # damage-aware limits BEFORE nan_to_num: unmerged regions are
        # NaN and must not drag the color scale to zero
        from .base import _stat_limits
        lo, hi = _stat_limits(raw, damage)
        data = np.nan_to_num(raw)
        self.im_obj.set_data(data)
        if np.isfinite(lo) and np.isfinite(hi):
            self.im_obj.set_clim(lo, hi + 1e-30)
        if self.fig is not None:
            self.fig.canvas.draw_idle()
