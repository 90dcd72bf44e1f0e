"""Host thread-count control
(reference: libertem/common/threading.py — set_num_threads:195 clamps
BLAS/numba/pyfftw pools inside workers to avoid oversubscription).

The TPU compute path doesn't use host BLAS, but the host streaming /
decode layer may; this module provides the same controls for it.
"""
from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def set_num_threads(n: int):
    # only the import belongs in the try: an except around the yield
    # would swallow ImportErrors raised by the caller's body and
    # yield twice ("generator didn't stop after throw()")
    try:
        import threadpoolctl
    except ImportError:  # pragma: no cover
        threadpoolctl = None
    if threadpoolctl is None:
        yield
    else:
        with threadpoolctl.threadpool_limits(limits=n):
            yield


@contextlib.contextmanager
def set_num_threads_env(n: int, set_numba: bool = False):
    keys = [
        "OMP_NUM_THREADS", "MKL_NUM_THREADS",
        "OPENBLAS_NUM_THREADS",
    ]
    old = {k: os.environ.get(k) for k in keys}
    for k in keys:
        os.environ[k] = str(n)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def mitigations():
    """Reference threading.py:288 — thread-pool mitigations for
    threaded executors; a no-op context here."""
    return contextlib.nullcontext()
