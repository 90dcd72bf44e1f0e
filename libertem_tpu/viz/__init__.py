from .base import (
    Dummy2DPlot,
    Live2DPlot,
    encode_image,
    rgb_from_2dvector,
    visualize_simple,
)
from .mpl import MPLLive2DPlot

__all__ = [
    "Live2DPlot", "Dummy2DPlot", "MPLLive2DPlot",
    "visualize_simple", "encode_image", "rgb_from_2dvector",
    "libertem_cyclic",
]


def __getattr__(name):
    # lazy: building the cyclic colormap imports matplotlib
    if name == "libertem_cyclic":
        from . import base
        return base.libertem_cyclic
    raise AttributeError(name)
