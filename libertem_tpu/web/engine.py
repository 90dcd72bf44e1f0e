"""JobEngine: run analyses asynchronously and stream partial results
over the websocket (reference: libertem/web/engine.py:73 JobEngine,
run_analysis:85, _run_udf:156, send_results:261 — result pushes are
throttled, channels PNG-encoded).
"""
from __future__ import annotations

import asyncio
import logging
import time
from typing import Optional

import numpy as np

from ..analysis.base import Analysis
from ..common.progress import ProgressReporter
from ..viz.base import encode_image

log = logging.getLogger(__name__)

RESULT_THROTTLE = 0.3  # seconds between TASK_RESULT pushes


class WebProgressReporter(ProgressReporter):
    """Streams JOB_PROGRESS websocket messages
    (reference: web/engine.py:30).  Must subclass ProgressReporter:
    UDFRunner._make_progress type-checks it."""

    def __init__(self, loop, registry, job_uuid):
        self._loop = loop
        self._registry = registry
        self._job = job_uuid

    def _send(self, event, state):
        msg = {
            "status": "ok", "messageType": "JOB_PROGRESS",
            "job": self._job, "event": event,
            "details": {
                "numFrames": state.num_frames_total,
                "numFramesComplete": state.num_frames_complete,
            },
        }
        self._loop.call_soon_threadsafe(
            lambda: self._loop.create_task(
                self._registry.broadcast(msg)
            )
        )

    def start(self, state):
        self._send("start", state)

    def update(self, state):
        self._send("update", state)

    def end(self, state):
        self._send("end", state)


def _encode_channel(result) -> tuple[dict, Optional[bytes]]:
    """(metadata dict, png bytes or None) — images travel as binary
    websocket followup frames (reference engine.py:261 send_results),
    not base64-in-JSON."""
    vis = result.visualized
    png = None
    if vis is not None:
        png = encode_image(np.asarray(vis)).read()
    return {
        "key": result.key,
        "title": result.title,
        "desc": result.desc,
        "hasImage": png is not None,
    }, png


class JobEngine:
    def __init__(self, state, event_registry):
        self.state = state
        self.event_registry = event_registry
        # analysis_uuid -> (parameters, final UDFResults) for the
        # need_rerun re-visualization short-circuit
        self._result_cache: dict = {}

    async def run_analysis(self, analysis_uuid: str, job_uuid: str):
        # everything (incl. setup) inside try: a deleted dataset or a
        # bad analysis type must broadcast JOB_ERROR, not hang the
        # GUI job forever
        try:
            entry = self.state.analysis_state[analysis_uuid]
            ds_uuid = entry["dataset"]
            dataset = self.state.dataset_state[ds_uuid]
            details = entry["details"]
            # raises ValueError with the known types on a bad id
            analysis_cls = Analysis.get_analysis_by_type(
                details["analysisType"]
            )
            parameters = details.get("parameters", {})
            analysis = analysis_cls(
                dataset=dataset, parameters=parameters,
            )
            self.state.job_state.register(
                job_uuid, analysis_uuid, ds_uuid
            )
            entry["jobs"].append(job_uuid)
            await self.event_registry.broadcast({
                "status": "ok", "messageType": "JOB_STARTED",
                "job": job_uuid, "analysis": analysis_uuid,
                "details": {"id": job_uuid,
                            "analysis": analysis_uuid},
            })
            # re-visualization short-circuit: if only display
            # parameters changed, reuse the cached raw results
            # (reference web/engine.py:189-206)
            cached = self._result_cache.get(analysis_uuid)
            if cached is not None and not analysis.need_rerun(
                cached[0], parameters
            ):
                await self._push_results(
                    job_uuid, analysis, cached[1], final=True,
                )
                await self._finish(job_uuid)
                return
            controller = getattr(analysis, "controller", None)
            if controller is not None:
                await self._run_controller(
                    job_uuid, analysis, controller
                )
            else:
                final_results = await self._run_udf(
                    job_uuid, analysis, dataset
                )
                if final_results is not None:
                    self._result_cache[analysis_uuid] = (
                        parameters, final_results,
                    )
        except Exception as e:
            log.exception("job %s failed", job_uuid)
            await self.event_registry.broadcast({
                "status": "error", "messageType": "JOB_ERROR",
                "job": job_uuid, "msg": str(e),
            })
        finally:
            if job_uuid in self.state.job_state.jobs:
                self.state.job_state.finish(job_uuid)
                # drop evicted job uuids from the analysis records so
                # INITIAL_STATE doesn't replay dangling references
                live = self.state.job_state.jobs
                for entry in self.state.analysis_state.analyses.values():
                    if len(entry["jobs"]) > 8:
                        entry["jobs"] = [
                            u for u in entry["jobs"] if u in live
                        ]

    def invalidate_cache(self, analysis_uuid=None, ds_uuid=None):
        """Drop cached results when an analysis is removed or its
        dataset is closed/replaced (prevents stale re-visualization
        and unbounded growth)."""
        if analysis_uuid is not None:
            self._result_cache.pop(analysis_uuid, None)
        if ds_uuid is not None:
            stale = [
                uuid for uuid in self._result_cache
                if self.state.analysis_state.analyses.get(
                    uuid, {}
                ).get("dataset") == ds_uuid
            ]
            for uuid in stale:
                self._result_cache.pop(uuid, None)

    async def _finish(self, job_uuid):
        await self.event_registry.broadcast({
            "status": "ok", "messageType": "FINISH_JOB",
            "job": job_uuid,
            "followup": {"numMessages": 0, "descriptions": []},
        })

    async def _run_controller(self, job_uuid, analysis, controller):
        """Analysis-owned job controller (reference engine.py:176-185,
        used by ClusterAnalysis): the analysis drives its own multi-
        pass pipeline against the Context."""
        ctx = self.state.executor_state.get_context()

        def cancelled():
            return self.state.job_state.is_cancelled(job_uuid)

        result_set = await controller(
            ctx=ctx, cancel_id=job_uuid, job_is_cancelled=cancelled,
        )
        if cancelled():
            await self.event_registry.broadcast({
                "status": "ok", "messageType": "CANCEL_JOB_DONE",
                "job": job_uuid,
            })
            return
        await self._push_result_set(job_uuid, result_set, final=True)
        await self._finish(job_uuid)

    async def _run_udf(self, job_uuid, analysis, dataset):
        ctx = self.state.executor_state.get_context()
        udf = analysis.get_udf()
        roi = analysis.get_roi()
        loop = asyncio.get_running_loop()
        queue: asyncio.Queue = asyncio.Queue()

        reporter = WebProgressReporter(loop, self.event_registry,
                                       job_uuid)

        def producer():
            try:
                for partial in ctx.run_udf_iter(
                    dataset, udf, roi=roi, progress=reporter,
                ):
                    if self.state.job_state.is_cancelled(job_uuid):
                        loop.call_soon_threadsafe(
                            queue.put_nowait, ("cancelled", None)
                        )
                        return
                    loop.call_soon_threadsafe(
                        queue.put_nowait, ("partial", partial)
                    )
                loop.call_soon_threadsafe(
                    queue.put_nowait, ("done", None)
                )
            except Exception as e:  # pragma: no cover
                loop.call_soon_threadsafe(
                    queue.put_nowait, ("error", e)
                )

        fut = loop.run_in_executor(None, producer)
        last_push = 0.0
        latest = None
        while True:
            kind, payload = await queue.get()
            if kind == "error":
                raise payload
            if kind == "cancelled":
                await self.event_registry.broadcast({
                    "status": "ok", "messageType": "CANCEL_JOB_DONE",
                    "job": job_uuid,
                })
                latest = None  # partial results must not be cached
                break
            if kind == "partial":
                latest = payload
                now = time.monotonic()
                if now - last_push < RESULT_THROTTLE:
                    continue
                last_push = now
                await self._push_results(
                    job_uuid, analysis, latest, final=False
                )
            if kind == "done":
                if latest is not None:
                    await self._push_results(
                        job_uuid, analysis, latest, final=True
                    )
                await self._finish(job_uuid)
                break
        await fut
        return latest

    async def _push_results(self, job_uuid, analysis, udf_results,
                            final):
        from ..udf.base import SingleUDFResults
        wrapped = SingleUDFResults(
            udf_results.buffers[0], udf_results.damage
        )
        roi = analysis.get_roi()
        import asyncio as _asyncio
        loop = _asyncio.get_running_loop()
        # get_udf_results fetches device buffers (tunnel RTT, can
        # hang) and visualizes — keep it off the event loop
        result_set = await loop.run_in_executor(
            None,
            lambda: analysis.get_udf_results(
                wrapped, roi, udf_results.damage
            ),
        )
        await self._push_result_set(job_uuid, result_set, final)

    async def _push_result_set(self, job_uuid, result_set, final):
        """TASK_RESULT JSON header (channel metadata + followup
        count), then one binary websocket frame per channel image
        (reference sends images as binary followups, engine.py:261)."""
        import asyncio as _asyncio
        loop = _asyncio.get_running_loop()
        # PNG encoding is CPU work: off the event loop
        encoded = await loop.run_in_executor(
            None,
            lambda: [_encode_channel(r) for r in result_set],
        )
        channels = [meta for meta, _ in encoded]
        images = [png for _, png in encoded if png is not None]
        await self.event_registry.broadcast({
            "status": "ok", "messageType": "TASK_RESULT",
            "job": job_uuid, "channels": channels,
            "final": final,
            "followup": {
                "numMessages": len(images),
                "descriptions": [
                    {"title": m["title"], "desc": m["desc"],
                     "key": m["key"]}
                    for m, p in encoded if p is not None
                ],
            },
        })
        for png in images:
            await self.event_registry.broadcast_binary(png)
