"""Shared server-side state
(reference: libertem/web/state.py:481 SharedState, ExecutorState:33,
AnalysisState:204, DatasetState:348, JobState:421).
"""
from __future__ import annotations

import time
from typing import Optional


class ExecutorState:
    def __init__(self):
        self.executor = None
        self._context = None

    def get_context(self):
        if self._context is None:
            from ..api import Context
            from ..executor.inline import InlineJobExecutor
            self._context = Context(executor=InlineJobExecutor())
        return self._context

    def set_context(self, ctx, jobs_running: bool = False):
        old = self._context
        self._context = ctx
        if old is not None and old is not ctx:
            if jobs_running:
                # a job is still executing against the old context:
                # closing it would kill the run mid-flight — leak it
                # (finishing jobs hold their own reference)
                return
            # release the replaced context's executor and stop its
            # snooze timer — repeated cluster reconnects must not
            # accumulate threads/resources
            try:
                old.close()
            except Exception:
                pass


class DatasetState:
    def __init__(self):
        self.datasets: dict = {}

    def register(self, uuid: str, dataset, params: dict):
        self.datasets[uuid] = {
            "dataset": dataset,
            "params": params,
        }

    def __getitem__(self, uuid: str):
        return self.datasets[uuid]["dataset"]

    def __contains__(self, uuid: str):
        return uuid in self.datasets

    def remove(self, uuid: str):
        self.datasets.pop(uuid, None)

    def serialize(self, uuid: str) -> dict:
        entry = self.datasets[uuid]
        ds = entry["dataset"]
        return {
            "id": uuid,
            "params": {
                **entry["params"],
                "shape": list(ds.shape.to_tuple()),
                "sig_shape": list(ds.shape.sig),
                "nav_shape": list(ds.shape.nav),
            },
            "diagnostics": ds.diagnostics,
        }

    def serialize_all(self) -> list:
        return [self.serialize(u) for u in self.datasets]


class AnalysisState:
    def __init__(self):
        self.analyses: dict = {}

    def create(self, uuid: str, dataset_uuid: str, details: dict):
        self.analyses[uuid] = {
            "dataset": dataset_uuid,
            "details": details,
            "jobs": [],
        }

    def update(self, uuid: str, details: dict):
        self.analyses[uuid]["details"] = details

    def __getitem__(self, uuid: str):
        return self.analyses[uuid]

    def __contains__(self, uuid: str):
        return uuid in self.analyses

    def remove(self, uuid: str):
        self.analyses.pop(uuid, None)

    def serialize_all(self) -> list:
        return [
            {
                "analysis": uuid,
                "dataset": entry["dataset"],
                "details": entry["details"],
                "jobs": entry["jobs"],
            }
            for uuid, entry in self.analyses.items()
        ]


class JobState:
    def __init__(self):
        self.jobs: dict = {}

    def register(self, uuid: str, analysis_uuid: str,
                 dataset_uuid: str):
        self.jobs[uuid] = {
            "analysis": analysis_uuid,
            "dataset": dataset_uuid,
            "running": True,
            "cancelled": False,
            "start": time.time(),
        }

    def __getitem__(self, uuid: str):
        return self.jobs[uuid]

    def __contains__(self, uuid: str):
        return uuid in self.jobs

    def cancel(self, uuid: str):
        if uuid in self.jobs:
            self.jobs[uuid]["cancelled"] = True

    def is_cancelled(self, uuid: str) -> bool:
        return self.jobs.get(uuid, {}).get("cancelled", False)

    # completed jobs kept for INITIAL_STATE replay / downloads;
    # beyond this many, the oldest finished ones are evicted so a
    # long-lived GUI session doesn't grow memory monotonically
    MAX_FINISHED = 100

    def finish(self, uuid: str):
        if uuid in self.jobs:
            self.jobs[uuid]["running"] = False
        finished = [
            u for u, j in self.jobs.items() if not j["running"]
        ]
        if len(finished) > self.MAX_FINISHED:
            finished.sort(key=lambda u: self.jobs[u]["start"])
            for u in finished[:len(finished) - self.MAX_FINISHED]:
                del self.jobs[u]


class SharedState:
    def __init__(self):
        self.executor_state = ExecutorState()
        self.dataset_state = DatasetState()
        self.analysis_state = AnalysisState()
        self.job_state = JobState()
        self.compound_analyses: dict = {}

    def serialize_initial(self) -> dict:
        return {
            "status": "ok",
            "messageType": "INITIAL_STATE",
            "datasets": self.dataset_state.serialize_all(),
            "analyses": self.analysis_state.serialize_all(),
            "compoundAnalyses": [
                {"compoundAnalysis": k, **v}
                for k, v in self.compound_analyses.items()
            ],
            "jobs": [
                {"job": k, "analysis": v["analysis"],
                 "running": v["running"]}
                for k, v in self.job_state.jobs.items()
            ],
        }
