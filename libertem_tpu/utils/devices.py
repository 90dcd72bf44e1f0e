"""Device detection (reference: libertem/utils/devices.py:31 detect —
cpus via psutil + cudas via nvidia probing; here: host cores + jax
TPU/accelerator devices).
"""
from __future__ import annotations

from typing import Optional


def detect() -> dict:
    import os
    try:
        import psutil
        cpus = psutil.cpu_count(logical=False) or psutil.cpu_count()
    except Exception:
        cpus = None
    if cpus is None:
        # psutil may return None for BOTH calls on platforms where
        # core count is undetectable (cgroup containers)
        cpus = os.cpu_count() or 1
    # cupy probe for API parity (reference devices.py:40): a clean
    # "not installed" stays silent; a BROKEN cupy (ImportError with a
    # cause, AttributeError, driver exceptions) warns so the user
    # learns why CUDA workers are absent.  has_cupy is always False —
    # the accelerator path here is jax/TPU.
    try:
        import cupy  # noqa: F401
        _probe = getattr(cupy, "cuda", None)  # broken-install probe
    except ModuleNotFoundError:
        pass
    except Exception as e:
        import warnings
        warnings.warn(repr(e), RuntimeWarning)
    tpus: list = []
    has_tpu = False
    try:
        import jax
        devices = jax.devices()
        tpus = [
            i for i, d in enumerate(devices)
            if d.platform in ("tpu", "axon")
        ]
        has_tpu = bool(tpus)
    except Exception:
        pass
    return {
        "cpus": list(range(int(cpus))),
        "tpus": tpus,
        "cudas": [],       # API compat with the reference
        "has_cupy": False,  # API compat with the reference
        "has_tpu": has_tpu,
    }

try:
    from typing import TypedDict

    class DetectResult(TypedDict):
        """Shape of :func:`detect`'s result (reference
        devices.py:25; extended with tpus/has_tpu here)."""
        cpus: list
        cudas: list
        has_cupy: bool
        tpus: list
        has_tpu: bool
except Exception:  # pragma: no cover
    DetectResult = dict  # type: ignore


def has_cupy() -> bool:
    """CuPy probe (reference devices.py:64) — always False here: the
    accelerator path is jax/TPU, not CUDA."""
    return False
