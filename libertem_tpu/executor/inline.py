"""InlineJobExecutor: synchronous single-device execution — the test
backbone and the single-chip production path
(reference: libertem/executor/inline.py:32).
"""
from __future__ import annotations

import os
from typing import Optional

import jax

from .base import JobExecutor, Worker, WorkerSet


class InlineJobExecutor(JobExecutor):
    def __init__(self, device=None, debug: bool = False,
                 inline_threads: Optional[int] = None,
                 main_process_gpu=None, **kwargs):
        if device is None:
            device = jax.devices()[0]
        super().__init__(devices=[device])
        self._debug = debug
        self._inline_threads = inline_threads
        # no CUDA on this target; accepted for API compat
        self._main_process_gpu = main_process_gpu

    @property
    def threads_per_worker(self) -> int:
        """Fine-grained threads a UDF may use
        (meta.threads_per_worker; reference inline.py:79 — explicit
        count, or one per core)."""
        if self._inline_threads is not None:
            return int(self._inline_threads)
        return os.cpu_count() or 1

    def run_each_worker(self, fn, *args, **kwargs) -> dict:
        # the inline executor IS its single worker (reference
        # inline.py:133)
        return {"inline": fn(*args, **kwargs)}

    def get_available_workers(self) -> WorkerSet:
        d = self._devices[0]
        return WorkerSet([
            Worker(
                name="inline",
                host="localhost",
                device=d,
                resources={
                    "compute": 1,
                    (
                        "TPU" if d.platform in ("tpu", "axon")
                        else d.platform.upper()
                    ): 1,
                },
                nthreads=self.threads_per_worker,
            ),
        ])
