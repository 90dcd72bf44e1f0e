"""Worker/resource scheduling model
(reference: libertem/common/scheduler.py — Worker:81, WorkerSet:10,
Scheduler.workers_for_task:127, effective_worker_count:135).

On TPU the "workers" are mesh devices; resource tags still matter for
API parity (e.g. a UDF restricted to specific backends).
"""
from __future__ import annotations

from typing import Callable, Sequence

from ..executor.base import Worker, WorkerSet


class Scheduler:
    def __init__(self, all_workers: WorkerSet):
        self.workers = all_workers

    def workers_for_task(self, task) -> WorkerSet:
        """Workers whose resources satisfy task.get_resources()."""
        resources = {}
        if hasattr(task, "get_resources"):
            resources = task.get_resources() or {}

        def fits(worker: Worker) -> bool:
            for key, amount in resources.items():
                if worker.resources.get(key, 0) < amount:
                    return False
            return True

        return WorkerSet([w for w in self.workers if fits(w)])

    def effective_worker_count(self) -> int:
        return max(1, len([
            w for w in self.workers
            if w.resources.get("compute", 0) > 0
        ]))
