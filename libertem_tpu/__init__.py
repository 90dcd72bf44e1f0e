"""libertem_tpu — a TPU-native framework for high-throughput
processing of large 4D-STEM / pixelated electron-microscopy datasets.

Re-designed from scratch for TPUs (JAX/XLA/Pallas) with the
capabilities of LiberTEM: a MapReduce-style UDF interface (map over
frames/tiles/partitions + merge of partial results), dataset formats,
tiled streaming I/O, corrections, analyses and live partial results —
with the compute core as a jit-compiled tile loop and mask-stack
matmuls on the MXU.
"""
__version__ = "0.1.0"

from . import masks
from .api import Context, ResultGenerator
from .common.analysis import AnalysisResult, AnalysisResultSet
from .common.buffers import AuxBufferWrapper, BufferWrapper
from .common.shape import Shape
from .common.slice import Slice
from .io.corrections import CorrectionSet
from .udf.base import UDF

__all__ = [
    "Context", "ResultGenerator", "UDF", "Shape", "Slice",
    "BufferWrapper", "AuxBufferWrapper", "CorrectionSet",
    "AnalysisResult", "AnalysisResultSet", "masks", "__version__",
]
