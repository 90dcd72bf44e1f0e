from .base import (
    NoOpUDF,
    UDF,
    UDFData,
    UDFMeta,
    UDFResults,
    UDFRunner,
)
from ..common.exceptions import UDFRunCancelled  # noqa: F401
from .auto import AutoUDF
from .blobfinder import (
    BackgroundSubtraction,
    Disk,
    FullFrameCorrelationUDF,
    MatchPattern,
    RadialGradient,
    SparseCorrelationUDF,
    run_blobfinder,
)
from .holography import (
    HoloReconstructUDF,
    estimate_sideband_position,
    estimate_sideband_size,
)
from .com import CoMParams, CoMUDF, RegressionOptions, guess_corrections
from .crystallinity import CrystallinityUDF
from .FEM import FEMUDF
from .logsum import LogsumUDF
from .masks import ApplyMasksUDF, MaskContainer
from .raw import PickUDF
from .record import RecordUDF
from .stddev import StdDevUDF, run_stddev
from .sum import SumUDF
from .sumsigudf import SumSigUDF

__all__ = [
    "UDF", "UDFData", "UDFMeta", "UDFResults", "UDFRunner", "NoOpUDF",
    "AutoUDF", "CoMParams", "CoMUDF", "RegressionOptions",
    "guess_corrections", "CrystallinityUDF", "FEMUDF", "LogsumUDF",
    "ApplyMasksUDF", "MaskContainer", "PickUDF", "StdDevUDF",
    "run_stddev", "SumUDF", "SumSigUDF",
    "MatchPattern", "Disk", "RadialGradient",
    "BackgroundSubtraction", "FullFrameCorrelationUDF",
    "SparseCorrelationUDF", "run_blobfinder", "RecordUDF",
    "HoloReconstructUDF", "estimate_sideband_position",
    "estimate_sideband_size",
]
