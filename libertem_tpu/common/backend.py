"""Device pinning via environment variables
(reference: libertem/common/backend.py:22–60
LIBERTEM_USE_CUDA/LIBERTEM_USE_CPU; here the device of interest is a
TPU index on the local mesh).
"""
from __future__ import annotations

import os
from typing import Optional

_ENV_TPU = "LIBERTEM_TPU_USE_DEVICE"
_ENV_CPU = "LIBERTEM_TPU_USE_CPU"


def set_use_device(idx: int) -> None:
    os.environ[_ENV_TPU] = str(int(idx))


def get_use_device() -> Optional[int]:
    v = os.environ.get(_ENV_TPU)
    return int(v) if v is not None else None


def set_use_cpu(flag: bool = True) -> None:
    os.environ[_ENV_CPU] = "1" if flag else "0"


def get_use_cpu() -> bool:
    return os.environ.get(_ENV_CPU, "0") == "1"


def get_pinned_device():
    """The jax device selected by the env pinning, or None."""
    import jax
    if get_use_cpu():
        # jax.devices() lists only the DEFAULT backend: on a TPU
        # host that never contains a cpu device — ask the cpu
        # backend explicitly
        try:
            cpus = jax.devices("cpu")
        except RuntimeError:
            cpus = []
        return cpus[0] if cpus else None
    idx = get_use_device()
    if idx is not None:
        devices = jax.devices()
        if 0 <= idx < len(devices):
            return devices[idx]
    return None
