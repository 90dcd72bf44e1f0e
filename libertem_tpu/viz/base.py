"""Result visualization: normalization, colormapping, live plotting.

Counterpart of the reference's ``libertem/viz/base.py``
(visualize_simple:121, rgb_from_2dvector:161, Live2DPlot:211,
_get_stat_limits:23) — damage-aware normalization so partial results
render stably while a run streams in.
"""
from __future__ import annotations

import io
import logging
from typing import Callable, Optional, Union

import numpy as np

log = logging.getLogger(__name__)


def _stat_limits(data: np.ndarray, damage=None):
    """Robust vmin/vmax over the valid (damaged = merged) region."""
    data = np.asarray(data)
    if np.iscomplexobj(data):
        data = np.abs(data)
    if damage is not None:
        damage = np.broadcast_to(np.asarray(damage), data.shape)
        sel = data[damage & np.isfinite(data)]
    else:
        sel = data[np.isfinite(data)]
    if sel.size == 0:
        return 0.0, 1.0
    vmin = float(sel.min())
    vmax = float(sel.max())
    if vmin == vmax:
        vmax = vmin + 1
    return vmin, vmax


def visualize_simple(
    data: np.ndarray,
    colormap=None,
    logarithmic: bool = False,
    vmin=None,
    vmax=None,
    damage=None,
) -> np.ndarray:
    """Normalize a 2D array to an RGBA uint8 image."""
    from matplotlib import cm
    data = np.asarray(data)
    if np.iscomplexobj(data):
        data = np.abs(data)
    data = data.astype(np.float64)
    if logarithmic:
        offset = np.nanmin(data[np.isfinite(data)]) if np.isfinite(
            data
        ).any() else 0.0
        data = np.log1p(data - offset)
    lo, hi = _stat_limits(data, damage)
    if vmin is not None:
        lo = vmin
    if vmax is not None:
        hi = vmax
    norm = np.clip((data - lo) / (hi - lo + 1e-30), 0, 1)
    norm = np.nan_to_num(norm)
    if colormap is None:
        import matplotlib
        colormap = matplotlib.colormaps["viridis"]
    rgba = (colormap(norm) * 255).astype(np.uint8)
    return rgba


def rgb_from_2dvector(y, x, vmax=None):
    """2D vector field → RGB via a cyclic colormap for the angle and
    lightness for the magnitude (reference viz/base.py:161)."""
    from matplotlib import colors
    y = np.nan_to_num(np.asarray(y, dtype=np.float64))
    x = np.nan_to_num(np.asarray(x, dtype=np.float64))
    mag = np.sqrt(y ** 2 + x ** 2)
    if vmax is None:
        vmax = mag.max() if mag.size else 1.0
    angle = (np.arctan2(y, x) + np.pi) / (2 * np.pi)
    sat = np.clip(mag / (vmax + 1e-30), 0, 1)
    hsv = np.stack(
        [angle, np.ones_like(angle), 0.3 + 0.7 * sat], axis=-1
    )
    rgb = colors.hsv_to_rgb(hsv)
    return (rgb * 255).astype(np.uint8)


def encode_image(rgba: np.ndarray, save_kwargs=None) -> io.BytesIO:
    """RGBA array → PNG BytesIO (for the web API)."""
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(rgba).save(buf, format="PNG",
                               **(save_kwargs or {}))
    buf.seek(0)
    return buf


class Live2DPlot:
    """Base class for live-updating 2D plots during a UDF run
    (reference viz/base.py:211).  ``channel`` may be a buffer name, a
    ``(name, fn)`` tuple, or a callable over the whole result dict.
    """

    def __init__(
        self, dataset, udf, roi=None, channel=None, title=None,
        min_delta: float = 0.2,
    ):
        self.dataset = dataset
        self.udf = udf
        self.roi = roi
        self.channel = channel
        self.title = title or type(udf).__name__
        self.min_delta = min_delta
        self.data = None
        self.damage = None
        self._last_update = 0.0

    def extract(self, udf_results, damage):
        """Pull the channel out of a (partial) results dict."""
        ch = self.channel
        if callable(ch):
            return ch(udf_results, damage)
        if isinstance(ch, tuple):
            name, fn = ch
            if name not in udf_results:
                raise ValueError(
                    f"channel {name} not found, have: "
                    f"{list(udf_results.keys())}"
                )
            buf = udf_results[name]
            return fn(buf.data), damage
        if ch is None:
            if not udf_results:
                raise ValueError(
                    f"No plottable 2D channel found for "
                    f"{type(self.udf).__name__}"
                )
            ch = next(iter(udf_results.keys()))
        if ch not in udf_results:
            raise ValueError(
                f"channel {ch} not found, have: "
                f"{list(udf_results.keys())}"
            )
        buf = udf_results[ch]
        data = buf.data
        if data is not None and data.ndim > 2:
            data = data.reshape(data.shape[:2] + (-1,))[..., 0]
        if getattr(buf, "kind", "nav") != "nav":
            # sig/single buffers aren't nav-shaped: the nav damage
            # mask doesn't apply (reference viz/base.py sets
            # damage=True for non-nav channels)
            damage = True
        return data, damage

    def new_data(self, results, force: bool = False):
        import time
        now = time.monotonic()
        if not force and now - self._last_update < self.min_delta:
            return
        buffers = results.buffers[0] if hasattr(
            results, "buffers"
        ) else results
        damage = results.damage.data if hasattr(
            results, "damage"
        ) else None
        self.data, self.damage = self.extract(buffers, damage)
        self._last_update = now
        # pass the (possibly channel-adjusted) damage, not the raw
        # nav damage — extract() replaces it for non-nav channels
        self.update(self.damage, force=force)

    def update(self, damage, force=False):
        """Render; implemented by subclasses."""

    def display(self):
        pass


class Dummy2DPlot(Live2DPlot):
    """No-op plot for tests (reference viz/base.py:389)."""

    def update(self, damage, force=False):
        pass


def make_colormap():
    """Cyclic colormap matching :func:`rgb_from_2dvector`'s hue wheel
    (reference viz/base.py:190) — for colorbars next to vector-field
    plots."""
    from matplotlib import colors
    angles_rad = np.arange(360) / 180 * np.pi
    yy, xx = -np.sin(angles_rad), -np.cos(angles_rad)
    cols = rgb_from_2dvector(y=yy, x=xx) / 255
    return colors.LinearSegmentedColormap.from_list(
        "libertem_cyclic", cols
    )


def get_plottable_2D_channels(buffers) -> list:
    """Buffer names whose squeezed data is 2D — the channels a live
    plot can display (reference viz/base.py:202)."""
    return [
        k for k in buffers.keys()
        if getattr(buffers[k], "data", None) is not None
        and len(np.asarray(buffers[k].data).squeeze().shape) == 2
    ]


def __getattr__(name):
    # lazy module attribute: building the colormap imports matplotlib,
    # which stays optional for headless use
    if name == "libertem_cyclic":
        return make_colormap()
    raise AttributeError(name)
