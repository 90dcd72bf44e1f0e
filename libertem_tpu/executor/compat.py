"""Reference-executor compatibility wrappers.

The reference ships a zoo of executors (SURVEY §2.3): Dask,
Pipelined, Inline, Concurrent, Delayed.  On TPU the distributed
backend is the device mesh, so these collapse onto two real
implementations — InlineJobExecutor (one device) and
ShardedJobExecutor (all devices) — plus thin aliases here so that
reference code importing the old names keeps working:

  * ConcurrentJobExecutor -> single-device (the GIL-side work is the
    host streaming loop; XLA already parallelizes the device side)
  * DaskJobExecutor / PipelinedExecutor -> sharded over all devices
  * DelayedJobExecutor -> requires dask, raises otherwise
"""
from __future__ import annotations

from .base import JobExecutor
from .inline import InlineJobExecutor
from .sharded import ShardedJobExecutor


class ConcurrentJobExecutor(InlineJobExecutor):
    """reference: executor/concurrent.py:58"""

    @classmethod
    def make_local(cls, **kwargs):
        return cls()


class DaskJobExecutor(ShardedJobExecutor):
    """reference: executor/dask.py:435 — partitions shard over the
    jax device mesh instead of dask workers."""

    @classmethod
    def connect(cls, scheduler_uri=None, **kwargs):
        raise NotImplementedError(
            "connecting to a dask scheduler is not applicable on "
            "TPU; ShardedJobExecutor uses the local device mesh"
        )


class PipelinedExecutor(ShardedJobExecutor):
    """reference: executor/pipelined.py:789 — the double-buffered
    host->device streaming in the runner plays the role of the
    pipelined worker pool."""


# real lazy-results implementation lives in executor/delayed.py
from .delayed import DelayedJobExecutor  # noqa: F401,E402


def get_dask_integration_executor():
    """reference: executor/integration.py — pick an executor matching
    the current dask scheduler config; here: inline."""
    return InlineJobExecutor()
