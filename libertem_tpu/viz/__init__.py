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
]
