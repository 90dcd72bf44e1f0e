"""Executor-construction helpers for the web API
(reference: libertem/web/helpers.py — there they assemble a dask
cluster spec; here 'local' means the in-process single-controller
executor over the JAX device mesh, with ``numWorkers`` recorded as
the advertised CPU-worker count).
"""
from __future__ import annotations

from typing import Any


def _int_or_zero(value) -> int:
    try:
        return int(value)
    except (TypeError, ValueError):
        return 0


def _convert_device_map(raw_cudas: dict) -> list:
    """{device_id: count} -> flat device list
    (reference web/helpers.py:15 _convert_device_map)."""
    return [
        this_id
        for dev_id, num in raw_cudas.items()
        for this_id in [dev_id] * _int_or_zero(num)
    ]


def create_executor(*, connection: dict, local_directory=None,
                    preload=(), snooze_timeout=None):
    """Build the sync executor for a 'local' GUI connection
    (reference web/helpers.py:23 create_executor — dask cluster
    there; the in-process mesh/inline executor here).

    ``numWorkers`` is validated like the reference (positive int)
    and recorded on the executor as the advertised CPU-worker count
    for the cluster-details page.
    """
    num_workers = None
    if "numWorkers" in connection:
        num_workers = connection["numWorkers"]
        if not isinstance(num_workers, int) or num_workers < 1:
            raise ValueError(
                "Number of workers must be positive integer"
            )
    # GUI cuda selections don't apply to a TPU/CPU mesh; validate the
    # shape but ignore the devices
    _convert_device_map(connection.get("cudas", {}) or {})
    # 'local' means "use this machine's compute" — here that is the
    # full device mesh (single-controller design)
    from ..executor.sharded import ShardedJobExecutor
    executor = ShardedJobExecutor.make_local()
    if num_workers is not None:
        executor._cpu_workers = num_workers
    return executor


def create_executor_external(
    executor_spec: dict, local_directory=None, preload=(),
    snooze_timeout=None,
) -> tuple:
    """Executor + connection params from a ``--cpus/--cudas`` style
    spec (reference web/helpers.py:46 create_executor_external)."""
    cudas: dict = {}
    if executor_spec.get("cudas"):
        cudas[0] = executor_spec["cudas"]
    params = {
        "connection": {
            "type": "LOCAL",
            "numWorkers": executor_spec["cpus"],
            "cudas": cudas,
        }
    }
    sync_executor = create_executor(
        connection=params["connection"],
        local_directory=local_directory,
        preload=preload,
        snooze_timeout=snooze_timeout,
    )
    from ..executor.async_adapter import AsyncAdapter
    pool = AsyncAdapter.make_pool()
    executor = AsyncAdapter(wrapped=sync_executor, pool=pool)
    return executor, params
