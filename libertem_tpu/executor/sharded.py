"""ShardedJobExecutor: SPMD execution over all available devices.

TPU-native replacement for the reference's distributed executors
(DaskJobExecutor executor/dask.py:435, PipelinedExecutor
pipelined.py:789): instead of a dask/multiprocessing worker pool with
pickled tasks, the navigation axis is sharded over a
``jax.sharding.Mesh`` and the tile loop runs as one shard_mapped XLA
program per super-step (see UDFRunner._run_loop_sharded).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax

from .base import JobExecutor


class ShardedJobExecutor(JobExecutor):
    def __init__(self, devices: Optional[Sequence] = None, **kwargs):
        if devices is None:
            devices = jax.devices()
        super().__init__(devices=devices)

    @classmethod
    def make_local(cls, **kwargs) -> "ShardedJobExecutor":
        return cls()
