"""Executor protocol.

TPU-native counterpart of the reference's executor zoo
(``libertem/common/executor.py:175`` JobExecutor, ``executor/``).

The reference's executors exist to distribute partition tasks over
dask/multiprocessing worker pools.  On TPU the "workers" are devices of
one JAX process (single-controller SPMD), so an executor here is a much
thinner object: it owns the device set, decides how partitions map onto
devices, and runs host-side functions.  The heavy lifting (the
jit-compiled tile loop) lives in :class:`libertem_tpu.udf.base.UDFRunner`.
"""
from __future__ import annotations

from typing import Any, Callable, Iterable, Optional, Sequence

import jax


class Environment:
    """Per-task environment (reference common/executor.py:52)."""

    def __init__(self, threads_per_worker: int = 1, device=None):
        self.threads_per_worker = threads_per_worker
        self.device = device

    def enter(self):
        return self

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class Worker:
    def __init__(self, name: str, host: str, device, resources: dict):
        self.name = name
        self.host = host
        self.device = device
        self.resources = resources

    def __repr__(self):
        return f"<Worker {self.name} device={self.device}>"


class WorkerSet:
    def __init__(self, workers: Sequence[Worker]):
        self.workers = list(workers)

    def __len__(self):
        return len(self.workers)

    def __iter__(self):
        return iter(self.workers)

    def has_tpu(self) -> bool:
        return any(
            w.device.platform in ("tpu", "axon") for w in self.workers
        )


class JobExecutor:
    """Base executor: owns devices, runs host functions."""

    def __init__(self, devices: Optional[Sequence] = None):
        self._devices = (
            list(devices) if devices is not None else [jax.devices()[0]]
        )

    @property
    def devices(self) -> list:
        return self._devices

    @property
    def main_device(self):
        return self._devices[0]

    def run_function(self, fn: Callable, *args, **kwargs) -> Any:
        return fn(*args, **kwargs)

    def map(self, fn: Callable, iterable: Iterable) -> list:
        return [fn(item) for item in iterable]

    def run_each_worker(self, fn: Callable, *args, **kwargs) -> dict:
        return {
            f"device-{i}": fn(*args, **kwargs)
            for i, _ in enumerate(self._devices)
        }

    def get_available_workers(self) -> WorkerSet:
        return WorkerSet([
            Worker(
                name=f"device-{i}",
                host="localhost",
                device=d,
                resources={
                    "compute": 1,
                    # the axon remote plugin IS a TPU: tasks
                    # restricted to {'TPU': 1} must match it
                    (
                        "TPU" if d.platform in ("tpu", "axon")
                        else d.platform.upper()
                    ): 1,
                },
            )
            for i, d in enumerate(self._devices)
        ])

    def get_resource_details(self) -> list:
        """Per-device resource rows for the GUI cluster page
        (reference: DaskJobExecutor.get_resource_details,
        executor/dask.py:387 — dask workers there, mesh devices
        here)."""
        details = []
        for w in self.get_available_workers():
            d = w.device
            row = {
                "host": "localhost",
                "name": w.name,
                "device": str(d),
                "platform": getattr(d, "platform", "unknown"),
                "kind": getattr(d, "device_kind", ""),
                "process_index": getattr(d, "process_index", 0),
                "resources": dict(w.resources),
            }
            try:
                # live HBM occupancy where the backend reports it
                # (real TPUs do; the CPU backend returns None/raises)
                stats = d.memory_stats()
                if stats:
                    row["memory"] = {
                        "bytes_in_use": stats.get("bytes_in_use"),
                        "bytes_limit": stats.get("bytes_limit"),
                    }
            except Exception:
                pass
            details.append(row)
        return details

    def ensure_sync(self) -> "JobExecutor":
        return self

    def ensure_async(self, pool=None):
        from .async_adapter import AsyncAdapter
        return AsyncAdapter(self, pool=pool)

    def close(self):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
