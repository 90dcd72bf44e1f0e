import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are
# exercised without TPU hardware (the driver benches on a real chip).
# NOTE: this environment force-registers a remote-TPU PJRT plugin via
# sitecustomize and exports JAX_PLATFORMS=axon, so a plain env-var
# default is not enough — override the jax config directly (backends
# initialize lazily, so this works as long as no jax computation ran).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeated test runs skip recompilation
_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache",
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest

from libertem_tpu.io.dataset.memory import MemoryDataSet
from libertem_tpu.executor.inline import InlineJobExecutor
from libertem_tpu.api import Context


def _mk_random(size, dtype="float32", seed=None):
    """Asymmetric random data (no accidental symmetry masking bugs)."""
    rng = np.random.default_rng(42 if seed is None else seed)
    dtype = np.dtype(dtype)
    if dtype.kind == "f":
        data = rng.normal(loc=1.0, scale=3.0, size=size)
        # make it asymmetric along each axis
        data += np.linspace(0, 1, num=data.size).reshape(size)
        return data.astype(dtype)
    elif dtype.kind in "ui":
        info = np.iinfo(dtype)
        hi = min(info.max, 4096)
        return rng.integers(
            max(0, info.min), hi, size=size
        ).astype(dtype)
    elif dtype.kind == "c":
        return (
            rng.normal(size=size) + 1j * rng.normal(size=size)
        ).astype(dtype)
    raise ValueError(dtype)


@pytest.fixture
def lt_ctx():
    return Context(executor=InlineJobExecutor())


@pytest.fixture
def default_raw_data():
    return _mk_random((16, 16, 32, 32), dtype="float32")


@pytest.fixture
def default_ds(default_raw_data):
    return MemoryDataSet(
        data=default_raw_data, sig_dims=2, num_partitions=4
    ).initialize()


import sys as _sys

# make bench.py importable from tests
_sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
