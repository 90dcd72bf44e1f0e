"""Tornado web API server
(reference: libertem/web/server.py:79 make_app, routes :95–116,
token auth :61; handlers from web/dataset.py, web/jobs.py,
web/analysis.py, web/browse.py).

REST + websocket protocol:
  GET  /api/config/                         server/config info
  GET  /api/datasets/detect/?path=          format auto-detection
  PUT  /api/datasets/<uuid>/                open a dataset
  DELETE /api/datasets/<uuid>/              close
  PUT  /api/compoundAnalyses/<cuuid>/analyses/<uuid>/   create/update
  DELETE .../analyses/<uuid>/
  PUT  /api/jobs/<uuid>/                    start analysis job
  DELETE /api/jobs/<uuid>/                  cancel
  GET  /api/jobs/<uuid>/download/?fmt=NPZ   download results
  GET  /api/browse/?path=                   filesystem browser
  WS   /api/events/                         state + result stream

Result images are streamed as binary websocket frames following a
TASK_RESULT JSON header (matching the reference's protocol shape).
"""
from __future__ import annotations

import io
import json
import logging
import os
import stat
import uuid as uuid_mod
from typing import Optional

import numpy as np
import tornado.escape
import tornado.web
import tornado.websocket

from .engine import JobEngine
from .state import SharedState

log = logging.getLogger(__name__)


class EventRegistry:
    """Connected websocket clients + broadcast
    (reference: web/events.py:12)."""

    # a client whose TCP window closed without erroring accumulates
    # outgoing buffer; above this many queued bytes it is dropped
    # instead of growing server RSS unboundedly
    MAX_CLIENT_BACKLOG = 64 * 1024 * 1024

    def __init__(self):
        self.handlers: set = set()

    def add_handler(self, h):
        self.handlers.add(h)

    def remove_handler(self, h):
        self.handlers.discard(h)

    def _backlogged(self, h) -> bool:
        try:
            stream = h.ws_connection.stream
            return (
                stream.writing()
                and len(stream._write_buffer)
                > self.MAX_CLIENT_BACKLOG
            )
        except Exception:
            return False

    def _send_all(self, payload, binary: bool):
        dead = []
        for h in self.handlers:
            if self._backlogged(h):
                log.warning(
                    "dropping websocket client with >%d MB backlog",
                    self.MAX_CLIENT_BACKLOG // (1024 * 1024),
                )
                dead.append(h)
                continue
            try:
                # fire-and-forget: per-client backpressure is
                # enforced via the backlog check above
                h.write_message(payload, binary=binary)
            except Exception:
                dead.append(h)
        for h in dead:
            self.handlers.discard(h)
            try:
                h.close()
            except Exception:
                pass

    async def broadcast(self, message: dict):
        # serialize once for all clients
        self._send_all(json.dumps(message), binary=False)

    async def broadcast_binary(self, payload: bytes):
        """Binary websocket frame (result images follow their
        TASK_RESULT JSON header as raw PNG frames)."""
        self._send_all(payload, binary=True)


class _BaseHandler(tornado.web.RequestHandler):
    def initialize(self, state: SharedState, registry: EventRegistry,
                   engine: JobEngine, token: Optional[str] = None):
        self.state = state
        self.registry = registry
        self.engine = engine
        self.token = token

    def prepare(self):
        if self.token is not None:
            given = self.get_argument("token", None)
            if given != self.token:
                raise tornado.web.HTTPError(400, "token mismatch")

    def write_json(self, obj):
        self.set_header("Content-Type", "application/json")
        self.write(json.dumps(obj))


class ConfigHandler(_BaseHandler):
    def get(self):
        import jax

        from .. import __version__
        devices = jax.devices()
        self.write_json({
            "status": "ok",
            "messageType": "CONFIG",
            "config": {
                "version": __version__,
                "revision": "",
                "localCores": os.cpu_count() or 1,
                "devices": {
                    "cpus": [0],
                    "cudas": [],
                    "tpus": [
                        str(d) for d in devices
                        if d.platform in ("tpu", "axon")
                    ],
                    "has_cupy": False,
                },
                "cwd": os.getcwd(),
                "separator": os.sep,
            },
        })


class DataSetSchemaHandler(_BaseHandler):
    """GUI open-form schemas, one per registered format — the
    reference client ships per-format form components compiled in;
    here the forms are DRIVEN by the server's MessageConverter
    schemas (io/dataset/converters.py), so format and form can't
    drift apart."""

    def get(self):
        from ..io.dataset.converters import CONVERTERS
        schemas = {}
        for type_id, cls in CONVERTERS.items():
            conv = cls()
            schemas[type_id] = {
                "schema": conv.SCHEMA,
                "required": list(
                    conv.SCHEMA.get("required", ())
                ),
            }
        self.write_json({
            "status": "ok",
            "messageType": "DATASET_SCHEMAS",
            "schemas": schemas,
        })


class DataSetDetectHandler(_BaseHandler):
    async def get(self):
        path = self.get_argument("path")
        from ..io.dataset import detect
        import asyncio as _asyncio
        # header probing can read GBs over slow filesystems: keep it
        # off the event loop (same rule as DataSetDetailHandler.put)
        params = await _asyncio.get_running_loop().run_in_executor(
            None, detect, path, None
        )
        if params is None:
            self.write_json({
                "status": "error",
                "messageType": "DATASET_DETECTION_FAILED",
                "path": path,
                "msg": "could not detect dataset format",
            })
            return
        self.write_json({
            "status": "ok",
            "messageType": "DATASET_DETECTED",
            "datasetParams": {
                "type": params["type"].upper(),
                **params["parameters"],
            },
        })


class DataSetDetailHandler(_BaseHandler):
    async def put(self, uuid: str):
        request_data = tornado.escape.json_decode(self.request.body)
        raw_params = dict(request_data["dataset"]["params"])
        ds_type = raw_params["type"].lower()
        ctx = self.state.executor_state.get_context()
        from ..io.dataset.converters import get_converter
        conv_cls = get_converter(ds_type)
        try:
            if conv_cls is not None:
                params = conv_cls().to_python(raw_params)
            else:
                params = {
                    k: v for k, v in raw_params.items()
                    if k != "type"
                }
                for key in ("nav_shape", "sig_shape"):
                    if params.get(key) is not None:
                        params[key] = tuple(params[key])
            import asyncio as _asyncio
            loop = _asyncio.get_running_loop()
            # dataset initialize can scan GBs of headers: keep it off
            # the event loop
            ds = await loop.run_in_executor(
                None, lambda: ctx.load(ds_type, **params)
            )
        except Exception as e:
            self.write_json({
                "status": "error",
                "messageType": "CREATE_DATASET_ERROR",
                "dataset": uuid,
                "msg": str(e),
            })
            return
        # re-opening an existing uuid replaces the dataset: stale
        # cached analysis results must not survive
        self.engine.invalidate_cache(ds_uuid=uuid)
        self.state.dataset_state.register(uuid, ds, {
            "type": ds_type.upper(), **params,
        })
        msg = {
            "status": "ok",
            "messageType": "CREATE_DATASET",
            "dataset": uuid,
            "details": self.state.dataset_state.serialize(uuid),
        }
        await self.registry.broadcast(msg)
        self.write_json(msg)

    async def delete(self, uuid: str):
        self.engine.invalidate_cache(ds_uuid=uuid)
        self.state.dataset_state.remove(uuid)
        msg = {
            "status": "ok",
            "messageType": "DELETE_DATASET",
            "dataset": uuid,
        }
        await self.registry.broadcast(msg)
        self.write_json(msg)


class CompoundAnalysisHandler(_BaseHandler):
    async def put(self, compound_uuid: str):
        data = tornado.escape.json_decode(self.request.body)
        details = data["details"]
        # reference protocol puts the dataset id at the top level
        # (web/messages.py CREATE_COMPOUND_ANALYSIS); accept a
        # details-nested id too for robustness
        dataset = data.get("dataset", details.get("dataset"))
        self.state.compound_analyses[compound_uuid] = {
            "dataset": dataset,
            "details": details,
        }
        msg = {
            "status": "ok",
            "messageType": "COMPOUND_ANALYSIS_CREATED",
            "compoundAnalysis": compound_uuid,
            "details": details,
        }
        await self.registry.broadcast(msg)
        self.write_json(msg)

    async def delete(self, compound_uuid: str):
        self.state.compound_analyses.pop(compound_uuid, None)
        msg = {
            "status": "ok",
            "messageType": "COMPOUND_ANALYSIS_REMOVED",
            "compoundAnalysis": compound_uuid,
        }
        await self.registry.broadcast(msg)
        self.write_json(msg)


class AnalysisDetailHandler(_BaseHandler):
    async def put(self, compound_uuid: str, uuid: str):
        data = tornado.escape.json_decode(self.request.body)
        details = data["details"]
        ds_uuid = data["dataset"]
        if uuid in self.state.analysis_state:
            self.state.analysis_state.update(uuid, details)
            message_type = "ANALYSIS_UPDATED"
        else:
            self.state.analysis_state.create(uuid, ds_uuid, details)
            message_type = "ANALYSIS_CREATED"
        # auto-register the containing compound analysis so notebook
        # download works without a separate compound PUT
        comp = self.state.compound_analyses.get(compound_uuid)
        if comp is None:
            comp = {
                "dataset": ds_uuid,
                "details": {"analyses": []},
            }
            self.state.compound_analyses[compound_uuid] = comp
        if uuid not in comp["details"]["analyses"]:
            comp["details"]["analyses"].append(uuid)
        msg = {
            "status": "ok",
            "messageType": message_type,
            "analysis": uuid,
            "dataset": ds_uuid,
            "details": details,
        }
        await self.registry.broadcast(msg)
        self.write_json(msg)

    async def delete(self, compound_uuid: str, uuid: str):
        self.engine.invalidate_cache(analysis_uuid=uuid)
        self.state.analysis_state.remove(uuid)
        msg = {
            "status": "ok",
            "messageType": "ANALYSIS_REMOVED",
            "analysis": uuid,
        }
        await self.registry.broadcast(msg)
        self.write_json(msg)


class JobDetailHandler(_BaseHandler):
    async def put(self, uuid: str):
        data = tornado.escape.json_decode(self.request.body)
        analysis_uuid = data["job"]["analysis"]
        self.write_json({
            "status": "ok",
            "messageType": "JOB_STARTED",
            "job": uuid,
        })
        tornado.ioloop.IOLoop.current().add_callback(
            self.engine.run_analysis, analysis_uuid, uuid
        )

    async def delete(self, uuid: str):
        self.state.job_state.cancel(uuid)
        msg = {
            "status": "ok",
            "messageType": "CANCEL_JOB",
            "job": uuid,
        }
        await self.registry.broadcast(msg)
        self.write_json(msg)


class ResultDownloadHandler(_BaseHandler):
    async def get(self, job_uuid: str):
        fmt = self.get_argument("fmt", "NPZ").upper()
        job = self.state.job_state[job_uuid]
        entry = self.state.analysis_state[job["analysis"]]
        dataset = self.state.dataset_state[job["dataset"]]
        from ..analysis.base import Analysis
        analysis_cls = Analysis.get_analysis_by_type(
            entry["details"]["analysisType"]
        )
        analysis = analysis_cls(
            dataset=dataset,
            parameters=entry["details"].get("parameters", {}),
        )
        ctx = self.state.executor_state.get_context()
        import asyncio as _asyncio
        cached = self.engine._result_cache.get(job["analysis"])
        if cached is not None and analysis.need_rerun(
            cached[0], entry["details"].get("parameters", {})
        ):
            # the cached raw results were computed with different
            # non-display parameters — re-visualizing them would
            # serve stale numbers
            cached = None
        loop = _asyncio.get_running_loop()
        if cached is not None:
            # the engine already holds the computed raw results —
            # re-visualize without recomputing
            from ..udf.base import SingleUDFResults
            udf_results = cached[1]
            wrapped = SingleUDFResults(
                udf_results.buffers[0], udf_results.damage
            )
            result_set = await loop.run_in_executor(
                None,
                lambda: analysis.get_udf_results(
                    wrapped, analysis.get_roi(), udf_results.damage
                ),
            )
        else:
            # recompute off the event loop so downloads don't stall
            # every other request / websocket
            result_set = await loop.run_in_executor(
                None, lambda: ctx.run(analysis)
            )
        from ..io.writers import ResultFormat
        fmt_cls = ResultFormat.registry[fmt]
        buf = io.BytesIO()
        fmt_cls({
            r.key: r for r in result_set
        }).serialize_to(buf)
        buf.seek(0)
        self.set_header("Content-Type", "application/octet-stream")
        self.set_header(
            "Content-Disposition",
            f'attachment; filename="result.{fmt_cls.extension}"',
        )
        self.write(buf.read())


class ConnectionHandler(_BaseHandler):
    """Executor lifecycle over REST
    (reference: web/connect.py:76 — here 'connecting a cluster' means
    choosing single-device vs mesh execution)."""

    def get(self):
        ctx = self.state.executor_state.get_context()
        self.write_json({
            "status": "ok",
            "messageType": "EXECUTOR_STATE",
            "connection": {
                "type": type(ctx.executor).__name__,
                "numWorkers": len(ctx.executor.devices),
                # per-device rows for the cluster page (reference GUI
                # shows dask worker/resource details; here the mesh)
                "details": ctx.executor.get_resource_details(),
            },
        })

    async def put(self):
        data = tornado.escape.json_decode(self.request.body)
        conn = data.get("connection", {})
        ctype = conn.get("type", "LOCAL").upper()
        from ..api import Context
        if ctype in ("LOCAL", "TCP", "SHARDED"):
            ctx = Context.make_with("sharded")
        else:
            ctx = Context.make_with("inline")
        running = any(
            j["running"] for j in self.state.job_state.jobs.values()
        )
        self.state.executor_state.set_context(
            ctx, jobs_running=running
        )
        msg = {
            "status": "ok",
            "messageType": "CLUSTER_CONNECTED",
            "connection": {
                "type": ctype,
                "numWorkers": len(ctx.executor.devices),
            },
        }
        await self.registry.broadcast(msg)
        self.write_json(msg)


class AnalysisRPCHandler(_BaseHandler):
    """Per-analysis RPC procedures, e.g. CoM parameter guessing
    (reference: web/rpc.py:1–103)."""

    async def put(self, compound_uuid: str, analysis_uuid: str,
                  proc_name: str):
        entry = self.state.analysis_state[analysis_uuid]
        dataset = self.state.dataset_state[entry["dataset"]]
        from ..analysis.base import Analysis
        cls = Analysis.get_analysis_by_type(
            entry["details"]["analysisType"]
        )
        procs = cls.get_rpc_definitions()
        if proc_name not in procs:
            raise tornado.web.HTTPError(
                404, f"no rpc {proc_name} for this analysis"
            )
        analysis = cls(
            dataset=dataset,
            parameters=entry["details"].get("parameters", {}),
        )
        ctx = self.state.executor_state.get_context()

        loop = tornado.ioloop.IOLoop.current()

        class RpcContext:
            def get_analysis(self):
                return analysis

            def run_analysis_default(self, a):
                # runs on a thread via run_in_executor below; kept
                # sync so procs can call it without awaiting
                return ctx.run(a)

        proc = procs[proc_name]()

        # the UDF run inside the proc is CPU/TPU-bound; keep the
        # event loop responsive (same pattern as the download handler)
        import asyncio
        result = await loop.run_in_executor(
            None, lambda: asyncio.run(proc(RpcContext()))
        )
        self.write_json(result)

    get = put


class NotebookDownloadHandler(_BaseHandler):
    async def get(self, compound_uuid: str):
        comp = self.state.compound_analyses.get(compound_uuid)
        if comp is None:
            raise tornado.web.HTTPError(404)
        ds_uuid = comp["dataset"]
        entry = self.state.dataset_state.datasets[ds_uuid]
        analyses = []
        for entry_ in comp["details"].get("analyses", []):
            if isinstance(entry_, dict):
                # tolerated protocol variant: inline analysis details
                # instead of an analysis uuid
                if "analysisType" in entry_:
                    analyses.append(entry_)
            elif entry_ in self.state.analysis_state:
                analyses.append(
                    self.state.analysis_state[entry_]["details"]
                )
        if not analyses:
            analyses = [
                e["details"]
                for e in
                self.state.analysis_state.analyses.values()
                if e["dataset"] == ds_uuid
            ]
        from .notebook_generator import notebook_for, notebook_to_bytes
        nb = notebook_for(
            entry["params"].get("type", "memory"),
            {k: v for k, v in entry["params"].items()
             if k != "type"},
            analyses,
        )
        self.set_header("Content-Type", "application/x-ipynb+json")
        self.set_header(
            "Content-Disposition",
            'attachment; filename="analysis.ipynb"',
        )
        self.write(notebook_to_bytes(nb))


class BrowseHandler(_BaseHandler):
    async def get(self):
        path = self.get_argument("path")
        import asyncio as _asyncio
        loop = _asyncio.get_running_loop()
        try:
            # a large NFS directory must not stall the event loop
            names = await loop.run_in_executor(
                None, lambda: sorted(os.listdir(path))
            )
        except OSError as e:
            self.write_json({
                "status": "error",
                "messageType": "DIRECTORY_LISTING_FAILED",
                "path": path, "code": "NOT_FOUND", "alternative": None,
                "msg": str(e),
            })
            return
        dirs, files = [], []
        for name in names:
            full = os.path.join(path, name)
            try:
                st = os.stat(full)
            except OSError:
                continue
            entry = {
                "name": name, "size": st.st_size,
                "ctime": st.st_ctime, "mtime": st.st_mtime,
                "owner": str(st.st_uid),
            }
            if stat.S_ISDIR(st.st_mode):
                dirs.append(entry)
            else:
                files.append(entry)
        self.write_json({
            "status": "ok",
            "messageType": "DIRECTORY_LISTING",
            "drives": ["/"],
            "places": [{"key": "home",
                        "title": "Home",
                        "path": os.path.expanduser("~")}],
            "path": path, "dirs": dirs, "files": files,
        })


class ShutdownHandler(_BaseHandler):
    async def delete(self):
        self.write_json({
            "status": "ok", "messageType": "SERVER_SHUTDOWN",
        })
        tornado.ioloop.IOLoop.current().add_callback(
            tornado.ioloop.IOLoop.current().stop
        )


class EventsHandler(tornado.websocket.WebSocketHandler):
    def initialize(self, state, registry, engine, token=None):
        self.state = state
        self.registry = registry
        self.token = token

    def check_origin(self, origin):
        # Tornado-default same-origin check (reference web/events.py:49
        # keeps it too): without it any website open in the browser
        # could connect cross-origin to the localhost GUI websocket.
        # A configured token is an explicit cross-origin credential.
        if self.token is not None:
            return True
        return super().check_origin(origin)

    def open(self):
        if self.token is not None and self.get_argument(
            "token", None
        ) != self.token:
            self.close(code=4403)
            return
        self.registry.add_handler(self)
        self.write_message(json.dumps(
            self.state.serialize_initial()
        ))

    def on_close(self):
        self.registry.remove_handler(self)

    def on_message(self, message):
        pass


def make_app(state: Optional[SharedState] = None,
             token: Optional[str] = None) -> tornado.web.Application:
    if state is None:
        state = SharedState()
    registry = EventRegistry()
    engine = JobEngine(state, registry)
    common = dict(
        state=state, registry=registry, engine=engine, token=token,
    )
    app = tornado.web.Application([
        (r"/api/config/", ConfigHandler, common),
        (r"/api/config/connection/", ConnectionHandler, common),
        (r"/api/compoundAnalyses/([^/]+)/analyses/([^/]+)/rpc/"
         r"([^/]+)/", AnalysisRPCHandler, common),
        (r"/api/datasets/detect/", DataSetDetectHandler, common),
        (r"/api/datasets/schema/", DataSetSchemaHandler, common),
        (r"/api/datasets/([^/]+)/", DataSetDetailHandler, common),
        (r"/api/compoundAnalyses/([^/]+)/analyses/([^/]+)/",
         AnalysisDetailHandler, common),
        (r"/api/compoundAnalyses/([^/]+)/download/notebook/",
         NotebookDownloadHandler, common),
        (r"/api/compoundAnalyses/([^/]+)/", CompoundAnalysisHandler,
         common),
        (r"/api/jobs/([^/]+)/download/", ResultDownloadHandler,
         common),
        (r"/api/jobs/([^/]+)/", JobDetailHandler, common),
        (r"/api/browse/localfs/", BrowseHandler, common),
        (r"/api/shutdown/", ShutdownHandler, common),
        (r"/api/events/", EventsHandler, common),
        (r"/()", tornado.web.StaticFileHandler, {
            "path": os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "client"
            ),
            "default_filename": "index.html",
        }),
    ])
    app.shared_state = state
    app.event_registry = registry
    return app


def run_server(host="localhost", port=9000, token=None,
               browser=False):
    app = make_app(token=token)
    app.listen(port, address=host)
    log.info("libertem-tpu-server listening on %s:%d", host, port)
    if browser:  # pragma: no cover
        import urllib.parse
        import webbrowser
        url = f"http://{host}:{port}"
        if token is not None:
            # the client threads ?token= through every API call; a
            # browser opened without it gets an unusable GUI
            url += "?token=" + urllib.parse.quote(token)
        webbrowser.open(url)
    tornado.ioloop.IOLoop.current().start()
