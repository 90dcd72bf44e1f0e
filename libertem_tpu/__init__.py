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


def _setup_compile_cache():
    """Enable jax's persistent compilation cache by default
    (~/.cache/libertem_tpu/jax): the fused tile step takes 20-200 s to
    compile on TPU, and GUI/notebook sessions re-create identical
    programs constantly.  Opt out with LIBERTEM_TPU_NO_COMPILE_CACHE=1
    or override the location with LIBERTEM_TPU_COMPILE_CACHE=<dir>.
    No-op if jax is already configured or initialization fails."""
    import os

    if os.environ.get("LIBERTEM_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return  # user/test harness already configured one
        cache = os.environ.get(
            "LIBERTEM_TPU_COMPILE_CACHE",
            os.path.join(
                os.path.expanduser("~"), ".cache",
                "libertem_tpu", "jax",
            ),
        )
        jax.config.update("jax_compilation_cache_dir", cache)
        # note: remote-PJRT plugins without executable serialization
        # (e.g. the dev tunnel) silently skip the cache
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.5
        )
    except Exception:
        pass


def _setup_malloc():
    """Keep large allocations on the reusable heap (glibc
    mallopt(M_MMAP_THRESHOLD)): the streaming read path allocates a
    fresh multi-MB block buffer per read, and glibc's default
    mmap/munmap of large chunks makes every block re-fault its pages
    (measured 0.8 -> 3.5 GB/s host feed rate from this one switch on
    the target hosts).  Trade-off: the heap retains its high-water
    mark; for a framework that streams GB/s this is the right
    default.  Opt out with LIBERTEM_TPU_NO_MALLOC_TUNE=1."""
    import os
    import sys

    if os.environ.get("LIBERTEM_TPU_NO_MALLOC_TUNE"):
        return
    if not sys.platform.startswith("linux"):
        return
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_MMAP_THRESHOLD = -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
    except Exception:
        pass


_setup_compile_cache()
_setup_malloc()

from . import masks  # noqa: E402
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
