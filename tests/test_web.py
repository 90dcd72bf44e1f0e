"""Web API tests: drive the REST + websocket protocol in-process
(counterpart of the reference's tests/server/, marker web_api)."""
import json

import numpy as np
import pytest
import tornado.gen
import tornado.httpclient
import tornado.testing
import tornado.websocket

from libertem_tpu.io.dataset.memory import MemoryDataSet
from libertem_tpu.web.server import make_app
from libertem_tpu.web.state import SharedState

from conftest import _mk_random


class WebTestBase(tornado.testing.AsyncHTTPTestCase):
    def get_app(self):
        self.state = SharedState()
        return make_app(state=self.state)

    def tearDown(self):
        self.state.executor_state.shutdown()
        super().tearDown()

    def connect(self, executor=None):
        """Install an executor (reference tests do this via the
        connection PUT; most tests here use the inline one for
        speed)."""
        from libertem_tpu.executor.async_adapter import AsyncAdapter
        from libertem_tpu.executor.inline import InlineJobExecutor
        if executor is None:
            executor = InlineJobExecutor()
        adapter = AsyncAdapter(wrapped=executor)
        self.io_loop.run_sync(
            lambda: self.state.executor_state.set_executor(
                adapter, {"connection": {"type": "inline"}},
            )
        )

    def register_ds(self, uuid, ds, params=None):
        self.state.dataset_state.register(
            uuid, ds,
            {"params": params or {"type": "MEMORY"}},
            converted={},
        )

    def fetch_json(self, path, method="GET", body=None):
        kwargs = {"method": method}
        if body is not None:
            kwargs["body"] = json.dumps(body)
        resp = self.fetch(path, **kwargs)
        assert resp.code == 200, resp.body
        return json.loads(resp.body)

    def wait_job(self, job_id, deadline=400):
        """Drive the test loop until the job's run_analysis coroutine
        completed — the job PUT responds BEFORE running (reference
        web/jobs.py:40), and AsyncHTTPTestCase only runs the loop
        while a fetch is in flight."""
        engine = self._app.job_engine
        while deadline > 0:
            if job_id in engine.finished_jobs:
                return
            self.io_loop.run_sync(
                lambda: tornado.gen.sleep(0.02)
            )
            deadline -= 1
        raise AssertionError(f"job {job_id} did not finish")

    def run_job(self, job_id, analysis_id):
        resp = self.fetch_json(
            f"/api/jobs/{job_id}/", method="PUT",
            body={"job": {"analysis": analysis_id}},
        )
        self.wait_job(job_id)
        return resp


class TestConfig(WebTestBase):
    def test_config(self):
        data = self.fetch_json("/api/config/")
        assert data["status"] == "ok"
        assert "version" in data["config"]

    def test_browse(self):
        data = self.fetch_json("/api/browse/localfs/?path=/")
        assert data["messageType"] == "DIRECTORY_LISTING"
        assert isinstance(data["dirs"], list)

    def test_browse_missing(self):
        data = self.fetch_json(
            "/api/browse/localfs/?path=/nonexistent-dir-xyz"
        )
        assert data["status"] == "error"


class TestDatasetAndJob(WebTestBase):
    def _register_memory_ds(self, uuid="ds-1"):
        data = _mk_random((6, 7, 12, 12), dtype="float32")
        ds = MemoryDataSet(
            data=data, sig_dims=2, num_partitions=2
        ).initialize()
        self.register_ds(uuid, ds)
        return data

    def test_dataset_lifecycle_raw(self):
        import tempfile, os
        self.connect()
        raw = _mk_random((4, 5, 8, 8), dtype="float32")
        with tempfile.NamedTemporaryFile(
            suffix=".raw", delete=False
        ) as f:
            raw.tofile(f.name)
            path = f.name
        try:
            resp = self.fetch_json(
                "/api/datasets/ds-raw/", method="PUT",
                body={
                    "dataset": {
                        "params": {
                            "type": "RAW",
                            "path": path,
                            "dtype": "float32",
                            "nav_shape": [4, 5],
                            "sig_shape": [8, 8],
                        },
                    },
                },
            )
            assert resp["status"] == "ok", resp
            assert resp["details"]["params"]["shape"] == [4, 5, 8, 8]
            resp = self.fetch_json(
                "/api/datasets/ds-raw/", method="DELETE"
            )
            assert resp["messageType"] == "DELETE_DATASET"
        finally:
            os.unlink(path)

    def test_analysis_and_job(self):
        self.connect()
        self._register_memory_ds()
        resp = self.fetch_json(
            "/api/compoundAnalyses/ca-1/analyses/an-1/",
            method="PUT",
            body={
                "dataset": "ds-1",
                "details": {
                    "analysisType": "SUM_FRAMES",
                    "parameters": {},
                },
            },
        )
        assert resp["messageType"] == "ANALYSIS_CREATED"
        # the job PUT responds after the run completed (the handler
        # awaits run_analysis; reference web/jobs.py:25)
        resp = self.run_job("job-1", "an-1")
        assert resp["messageType"] == "JOB_STARTED"
        assert resp["details"] == {"id": "job-1",
                                   "analysis": "an-1"}
        assert self.state.analysis_state.have_results("an-1")

    def test_download(self):
        self.connect()
        self._register_memory_ds(uuid="ds-2")
        self.fetch_json(
            "/api/compoundAnalyses/ca-2/analyses/an-2/",
            method="PUT",
            body={
                "dataset": "ds-2",
                "details": {
                    "analysisType": "SUM_FRAMES",
                    "parameters": {},
                },
            },
        )
        self.run_job("job-2", "an-2")
        resp = self.fetch(
            "/api/compoundAnalyses/ca-2/analyses/an-2/download/NPZ/"
        )
        assert resp.code == 200
        import io
        arrays = np.load(io.BytesIO(resp.body))
        assert "intensity" in arrays


class TestEvents(WebTestBase):
    def test_initial_state_ws(self):
        self.connect()

        async def go():
            url = (
                f"ws://127.0.0.1:{self.get_http_port()}/api/events/"
            )
            conn = await tornado.websocket.websocket_connect(url)
            msg = json.loads(await conn.read_message())
            assert msg["messageType"] == "INITIAL_STATE"
            conn.close()

        self.io_loop.run_sync(go)

    def test_cross_origin_ws_rejected(self):
        """Without a token, the events websocket enforces Tornado's
        same-origin policy (reference web/events.py:49-51): a browser
        page from another origin must not be able to connect."""
        self.connect()

        async def go():
            port = self.get_http_port()
            url = f"ws://127.0.0.1:{port}/api/events/"
            req = tornado.httpclient.HTTPRequest(
                url, headers={"Origin": "http://evil.example"}
            )
            with pytest.raises(tornado.httpclient.HTTPClientError):
                await tornado.websocket.websocket_connect(req)
            # same-origin connects fine
            req2 = tornado.httpclient.HTTPRequest(
                url, headers={"Origin": f"http://127.0.0.1:{port}"}
            )
            conn = await tornado.websocket.websocket_connect(req2)
            msg = json.loads(await conn.read_message())
            assert msg["messageType"] == "INITIAL_STATE"
            conn.close()

        self.io_loop.run_sync(go)


class TestConnectionAndRPC(WebTestBase):
    def test_connection(self):
        # before any connect: disconnected, empty connection
        # (reference web/connect.py:36-41)
        data = self.fetch_json("/api/config/connection/")
        assert data == {"status": "disconnected", "connection": {}}
        conn = {"type": "local", "numWorkers": 2}
        data = self.fetch_json(
            "/api/config/connection/", method="PUT",
            body={"connection": conn},
        )
        assert data == {"status": "ok", "connection": conn}
        # GET echoes the connection params verbatim
        data = self.fetch_json("/api/config/connection/")
        assert data == {"status": "ok", "connection": conn}
        # cluster page: per-host rows (reference shape)
        data = self.fetch_json("/api/config/cluster/")
        assert data["messageType"] == "CLUSTER_DETAILS"
        assert data["details"] == [
            {"host": "localhost", "cpu": 2, "cuda": 0,
             "service": 1},
        ]

    def test_com_guess_rpc(self):
        self.connect()
        data = _mk_random((5, 5, 16, 16), dtype="float32")
        ds = MemoryDataSet(
            data=data, sig_dims=2, num_partitions=1
        ).initialize()
        self.register_ds("ds-rpc", ds)
        self.fetch_json(
            "/api/compoundAnalyses/ca/", method="PUT",
            body={
                "dataset": "ds-rpc",
                "details": {"mainType": "CENTER_OF_MASS",
                            "analyses": []},
            },
        )
        self.fetch_json(
            "/api/compoundAnalyses/ca/analyses/an-rpc/",
            method="PUT",
            body={
                "dataset": "ds-rpc",
                "details": {
                    "analysisType": "CENTER_OF_MASS",
                    "parameters": {"cx": 8, "cy": 8},
                },
            },
        )
        # RPC before the analysis joins the compound: error
        # (reference tests/server/test_job.py:516)
        resp = self.fetch_json(
            "/api/compoundAnalyses/ca/rpc/guess_parameters/",
            method="PUT", body={},
        )
        assert resp["status"] == "error"
        self.fetch_json(
            "/api/compoundAnalyses/ca/", method="PUT",
            body={
                "dataset": "ds-rpc",
                "details": {"mainType": "CENTER_OF_MASS",
                            "analyses": ["an-rpc"]},
            },
        )
        resp = self.fetch_json(
            "/api/compoundAnalyses/ca/rpc/guess_parameters/",
            method="PUT", body={},
        )
        assert resp["status"] == "ok"
        guess = resp["guess"]
        assert set(guess) == {
            "scan_rotation", "flip_y", "cy", "cx"
        }
        # the guess is converted to ABSOLUTE GUI parameters
        # (reference com.py:166): for near-centered random data the
        # guessed center is near the configured (8, 8), not near the
        # relative delta (~0)
        assert 4.0 < guess["cy"] < 12.0
        assert 4.0 < guess["cx"] < 12.0

    def test_notebook_download(self):
        data = _mk_random((4, 4, 8, 8), dtype="float32")
        ds = MemoryDataSet(
            data=data, sig_dims=2, num_partitions=1
        ).initialize()
        self.register_ds("ds-nb", ds)
        self.fetch_json(
            "/api/compoundAnalyses/ca-nb/", method="PUT",
            body={"dataset": "ds-nb",
                  "details": {"mainType": "SUM_FRAMES",
                              "analyses": ["an-nb"]}},
        )
        self.fetch_json(
            "/api/compoundAnalyses/ca-nb/analyses/an-nb/",
            method="PUT",
            body={
                "dataset": "ds-nb",
                "details": {"analysisType": "SUM_FRAMES",
                            "parameters": {}},
            },
        )
        resp = self.fetch(
            "/api/compoundAnalyses/ca-nb/download/notebook/"
        )
        assert resp.code == 200
        nb = json.loads(resp.body)
        assert nb["nbformat"] == 4


class TestClientPage(WebTestBase):
    def test_index(self):
        resp = self.fetch("/")
        assert resp.code == 200
        assert b"libertem_tpu" in resp.body
        assert b"/api/events/" in resp.body


class TestJobError(WebTestBase):
    def test_job_error_broadcast(self):
        # analysis referencing a dataset that raises during the run
        self.connect()
        data = _mk_random((4, 4, 8, 8), dtype="float32")
        ds = MemoryDataSet(
            data=data, sig_dims=2, num_partitions=1
        ).initialize()
        self.register_ds("ds-err", ds)
        self.fetch_json(
            "/api/compoundAnalyses/ca/analyses/an-err/",
            method="PUT",
            body={
                "dataset": "ds-err",
                "details": {
                    "analysisType": "FEM",
                    # ring selecting no pixels -> ValueError
                    "parameters": {"cx": 4, "cy": 4, "ri": 7,
                                   "ro": 7.1},
                },
            },
        )
        self.run_job("job-err", "an-err")
        # a failed job is removed from the registry
        # (reference engine.py:127)
        assert "job-err" not in self.state.job_state.jobs
        assert not self.state.analysis_state.have_results("an-err")


class TestParamValidation(WebTestBase):
    def test_invalid_raw_params_rejected(self):
        resp = self.fetch_json(
            "/api/datasets/ds-bad/", method="PUT",
            body={
                "dataset": {
                    "params": {
                        "type": "RAW",
                        "path": "/nonexistent.raw",
                        # missing dtype + shapes -> schema error
                    },
                },
            },
        )
        assert resp["status"] == "error"


class TestWebRound2(WebTestBase):
    """Round-2 web parity: binary result frames, need_rerun
    short-circuit, ClusterAnalysis job controller."""

    def _register_memory_ds(self, uuid="ds-1", nav=(6, 7)):
        self.connect()
        data = _mk_random(nav + (12, 12), dtype="float32")
        ds = MemoryDataSet(
            data=data, sig_dims=2, num_partitions=2
        ).initialize()
        self.register_ds(uuid, ds)
        return data

    def _mk_analysis(self, an_uuid, analysis_type, parameters=None):
        return self.fetch_json(
            f"/api/compoundAnalyses/ca-1/analyses/{an_uuid}/",
            method="PUT",
            body={
                "dataset": "ds-1",
                "details": {
                    "analysisType": analysis_type,
                    "parameters": parameters or {},
                },
            },
        )

    def _wait_job(self, job_uuid):
        self.wait_job(job_uuid)

    def test_binary_result_frames(self):
        """TASK_RESULT carries channel metadata + followup count; the
        PNGs arrive as raw binary websocket frames."""
        self._register_memory_ds()
        self._mk_analysis("an-b", "SUM_FRAMES")

        async def go():
            url = (
                f"ws://127.0.0.1:{self.get_http_port()}/api/events/"
            )
            conn = await tornado.websocket.websocket_connect(url)
            await conn.read_message()  # INITIAL_STATE
            resp = await tornado.httpclient.AsyncHTTPClient().fetch(
                f"http://127.0.0.1:{self.get_http_port()}"
                "/api/jobs/job-b/",
                method="PUT",
                body=json.dumps({"job": {"analysis": "an-b"}}),
            )
            assert resp.code == 200
            pngs = []
            expected = None
            while True:
                msg = await conn.read_message()
                if isinstance(msg, bytes):
                    pngs.append(msg)
                    continue
                data = json.loads(msg)
                if data["messageType"] == "TASK_RESULT":
                    for ch in data["channels"]:
                        assert "image" not in ch
                    expected = data["followup"]["numMessages"]
                if data["messageType"] == "FINISH_JOB":
                    break
            assert expected and expected >= 1
            assert len(pngs) >= expected
            assert all(p.startswith(b"\x89PNG") for p in pngs)
            conn.close()

        self.io_loop.run_sync(go)

    def test_need_rerun_short_circuit(self):
        """Re-running a CoM analysis with only scan_rotation changed
        must NOT re-run the UDF pass — results are re-visualized from
        the cache (reference web/engine.py:189-206)."""
        from unittest import mock
        from libertem_tpu.udf.base import UDFRunner

        self._register_memory_ds()
        calls = {"n": 0}
        orig = UDFRunner.run_for_dataset_iter

        def counted(self, *a, **kw):
            calls["n"] += 1
            return orig(self, *a, **kw)

        with mock.patch.object(
            UDFRunner, "run_for_dataset_iter", counted
        ):
            self._mk_analysis(
                "an-c", "CENTER_OF_MASS",
                {"cx": 6.0, "cy": 6.0, "scan_rotation": 0.0},
            )
            self.fetch_json(
                "/api/jobs/job-c1/", method="PUT",
                body={"job": {"analysis": "an-c"}},
            )
            self._wait_job("job-c1")
            assert calls["n"] == 1
            # display-only change: rotation
            self._mk_analysis(
                "an-c", "CENTER_OF_MASS",
                {"cx": 6.0, "cy": 6.0, "scan_rotation": 90.0},
            )
            self.fetch_json(
                "/api/jobs/job-c2/", method="PUT",
                body={"job": {"analysis": "an-c"}},
            )
            self._wait_job("job-c2")
            assert calls["n"] == 1, "UDF must not re-run"
            # data change: mask radius -> re-run
            self._mk_analysis(
                "an-c", "CENTER_OF_MASS",
                {"cx": 6.0, "cy": 6.0, "scan_rotation": 90.0,
                 "r": 4.0},
            )
            self.fetch_json(
                "/api/jobs/job-c3/", method="PUT",
                body={"job": {"analysis": "an-c"}},
            )
            self._wait_job("job-c3")
            assert calls["n"] == 2

    def test_cluster_controller_job(self):
        """ClusterAnalysis runs as a web job via its controller
        (reference web/engine.py:176-185)."""
        import pytest as _pytest
        _pytest.importorskip("sklearn")
        self._register_memory_ds(nav=(8, 8))
        self._mk_analysis(
            "an-k", "CLUST", {"n_clust": 3, "n_peaks": 6},
        )

        async def go():
            url = (
                f"ws://127.0.0.1:{self.get_http_port()}/api/events/"
            )
            conn = await tornado.websocket.websocket_connect(url)
            await conn.read_message()
            resp = await tornado.httpclient.AsyncHTTPClient().fetch(
                f"http://127.0.0.1:{self.get_http_port()}"
                "/api/jobs/job-k/",
                method="PUT",
                body=json.dumps({"job": {"analysis": "an-k"}}),
            )
            assert resp.code == 200
            saw_result = False
            while True:
                msg = await conn.read_message()
                if isinstance(msg, bytes):
                    continue
                data = json.loads(msg)
                # the controller pushes its one result set on
                # FINISH_JOB (finished=True); channels ride both
                # TASK_RESULT and FINISH_JOB headers
                if data["messageType"] in ("TASK_RESULT",
                                           "FINISH_JOB"):
                    keys = [c["key"] for c in data["channels"]]
                    assert "intensity" in keys
                    saw_result = True
                if data["messageType"] in ("FINISH_JOB", "JOB_ERROR"):
                    assert data["messageType"] == "FINISH_JOB", data
                    break
            assert saw_result
            conn.close()

        self.io_loop.run_sync(go)


class TestCompoundAnalysisProtocol(WebTestBase):
    def test_create_compound_top_level_dataset(self):
        """The reference client sends the dataset id at the TOP level
        of the CREATE_COMPOUND_ANALYSIS message (web/messages.py);
        UPDATED on re-PUT, and the serialized shape carries
        dataset/compoundAnalysis/details."""
        data = _mk_random((4, 5, 8, 8), dtype="float32")
        ds = MemoryDataSet(
            data=data, sig_dims=2, num_partitions=2
        ).initialize()
        self.register_ds("ds-ca", ds)
        resp = self.fetch_json(
            "/api/compoundAnalyses/ca-top/", method="PUT",
            body={
                "dataset": "ds-ca",
                "details": {"mainType": "APPLY_RING_MASK",
                            "analyses": []},
            },
        )
        assert resp["messageType"] == "COMPOUND_ANALYSIS_CREATED"
        assert resp["dataset"] == "ds-ca"
        assert resp["compoundAnalysis"] == "ca-top"
        ca_state = self.state.compound_analysis_state
        assert ca_state["ca-top"]["dataset"] == "ds-ca"
        # second PUT on the same uuid: UPDATED
        resp = self.fetch_json(
            "/api/compoundAnalyses/ca-top/", method="PUT",
            body={
                "dataset": "ds-ca",
                "details": {"mainType": "APPLY_RING_MASK",
                            "analyses": ["an-x"]},
            },
        )
        assert resp["messageType"] == "COMPOUND_ANALYSIS_UPDATED"
        assert ca_state["ca-top"]["details"]["analyses"] == ["an-x"]

    def test_download_all_formats(self):
        """Every registered result format serves a non-trivial body
        (the GUI download selector exposes all of them)."""
        self.connect()
        data = _mk_random((4, 5, 8, 8), dtype="float32")
        ds = MemoryDataSet(
            data=data, sig_dims=2, num_partitions=2
        ).initialize()
        self.register_ds("ds-dl", ds)
        self.fetch_json(
            "/api/compoundAnalyses/ca-dl/analyses/an-dl/",
            method="PUT",
            body={
                "dataset": "ds-dl",
                "details": {"analysisType": "SUM_FRAMES",
                            "parameters": {}},
            },
        )
        self.run_job("job-dl", "an-dl")
        for fmt in ("NPZ", "NPZ_COMPRESSED", "HDF5", "TIFF", "RAW"):
            resp = self.fetch(
                "/api/compoundAnalyses/ca-dl/analyses/an-dl/"
                f"download/{fmt}/"
            )
            assert resp.code == 200, fmt
            assert len(resp.body) > 100, fmt


class TestNotebookRoi(WebTestBase):
    def test_roi_analysis_uses_registry_form(self):
        from libertem_tpu.web.notebook_generator import notebook_for

        nb = notebook_for(
            "RAW",
            {"path": "/t.raw", "dtype": "float32",
             "nav_shape": [4, 4], "sig_shape": [8, 8]},
            [{"analysisType": "CENTER_OF_MASS",
              "parameters": {
                  "cx": 4, "cy": 4, "r": 3,
                  "roi": {"shape": "disk", "cx": 1, "cy": 1,
                          "r": 1}}}],
        )
        src = "".join(
            "".join(c["source"]) for c in nb["cells"]
            if c["cell_type"] == "code"
        )
        # a GUI roi cannot ride the pretty template — the registry
        # form carries the full parameter dict (incl. roi)
        assert "get_analysis_by_type" in src
        assert "'roi'" in src or '"roi"' in src


class TestGuiWorkflow(WebTestBase):
    """Protocol-level equivalent of the GUI workflows the client
    drives: schema-driven open forms, pick -> disk-mask -> CoM-with-
    ROI.  (No browser/DOM runtime exists in this environment; the
    client's interactions compile down to exactly these calls.)"""

    def test_dataset_schemas(self):
        from libertem_tpu.io.dataset.converters import CONVERTERS

        data = self.fetch_json("/api/datasets/schema/")
        assert data["status"] == "ok"
        schemas = data["schemas"]
        assert set(schemas) == set(CONVERTERS)
        raw = schemas["RAW"]
        assert "dtype" in raw["schema"]["properties"]
        assert "dtype" in raw["required"]
        assert "nav_shape" in raw["required"]
        h5 = schemas["HDF5"]
        assert "ds_path" in h5["schema"]["properties"]
        # every file-format schema carries the base fields the
        # form renders (MEMORY is the in-memory test format)
        for type_id, info in schemas.items():
            props = info["schema"]["properties"]
            keys = ("nav_shape", "sig_shape", "sync_offset") if \
                type_id == "MEMORY" else \
                ("path", "nav_shape", "sig_shape", "sync_offset")
            for key in keys:
                assert key in props, (type_id, key)

    def _wait_job(self, job_id, deadline=200):
        self.wait_job(job_id)

    def test_open_pick_disk_com_roi_flow(self):
        import io
        import tempfile

        self.connect()
        rng = np.random.default_rng(0)
        nav, sig = (6, 6), (16, 16)
        frames = rng.poisson(
            6.0, nav + sig
        ).astype(np.float32)
        with tempfile.NamedTemporaryFile(
            suffix=".raw", delete=False
        ) as f:
            frames.tofile(f.name)
            path = f.name

        # 1. open with schema-shaped params (what the form submits)
        resp = self.fetch_json(
            "/api/datasets/ds-gui/", method="PUT",
            body={"dataset": {"params": {
                "type": "RAW", "path": path, "dtype": "float32",
                "nav_shape": list(nav), "sig_shape": list(sig),
            }}},
        )
        assert resp["status"] == "ok"

        # 2. SUM card (gives the detector-space image to pick on)
        self.fetch_json(
            "/api/compoundAnalyses/ca-g/analyses/an-sum/",
            method="PUT",
            body={"dataset": "ds-gui", "details": {
                "analysisType": "SUM_FRAMES", "parameters": {},
            }},
        )
        self.fetch_json(
            "/api/jobs/job-sum/", method="PUT",
            body={"job": {"analysis": "an-sum"}},
        )
        self._wait_job("job-sum")

        # 3. disk mask with picked center/radius (drag on the sum)
        cx, cy, r = 8.0, 8.0, 5.0
        self.fetch_json(
            "/api/compoundAnalyses/ca-g/analyses/an-disk/",
            method="PUT",
            body={"dataset": "ds-gui", "details": {
                "analysisType": "APPLY_DISK_MASK",
                "parameters": {"cx": cx, "cy": cy, "r": r},
            }},
        )
        self.fetch_json(
            "/api/jobs/job-disk/", method="PUT",
            body={"job": {"analysis": "an-disk"}},
        )
        self._wait_job("job-disk")
        resp = self.fetch(
            "/api/compoundAnalyses/ca-g/analyses/an-disk/"
            "download/NPZ/"
        )
        assert resp.code == 200
        arrays = np.load(io.BytesIO(resp.body))
        from libertem_tpu import masks as mask_lib
        # the analysis builds its disk antialiased (disk.py)
        mask = mask_lib.circular(
            cx, cy, sig[1], sig[0], r, antialiased=True
        )
        expected = (
            frames.reshape(-1, *sig) * mask
        ).sum(axis=(1, 2)).reshape(nav)
        got = arrays["intensity"].reshape(nav)
        assert np.allclose(got, expected, rtol=1e-3)

        # 4. CoM restricted to a drawn nav-space disk ROI
        self.fetch_json(
            "/api/compoundAnalyses/ca-g/analyses/an-com/",
            method="PUT",
            body={"dataset": "ds-gui", "details": {
                "analysisType": "CENTER_OF_MASS",
                "parameters": {
                    "cx": cx, "cy": cy, "r": 7.0,
                    "roi": {"shape": "disk", "cx": 2, "cy": 2,
                            "r": 2},
                },
            }},
        )
        self.fetch_json(
            "/api/jobs/job-com/", method="PUT",
            body={"job": {"analysis": "an-com"}},
        )
        self._wait_job("job-com")
        resp = self.fetch(
            "/api/compoundAnalyses/ca-g/analyses/an-com/"
            "download/NPZ/"
        )
        arrays = np.load(io.BytesIO(resp.body))
        # the field tuple is excluded from downloads like the
        # reference (include_in_download=False, com.py:243); the
        # x/y component channels carry the same values
        assert "field" not in arrays
        yy, xx = np.mgrid[0:nav[0], 0:nav[1]]
        inside = (yy - 2) ** 2 + (xx - 2) ** 2 <= 4
        for chan in ("x", "y"):
            comp = arrays[chan].reshape(nav)
            # outside the roi: invalid (nan); inside: finite values
            assert np.isfinite(comp[inside]).all(), chan
            assert np.isnan(comp[~inside]).all(), chan


class TestClientConsistency(WebTestBase):
    """Static drift guards for the single-page client (no JS runtime
    exists in this environment, so the JS itself runs only in real
    browsers): the client's analysis registry and REST paths must
    match the server."""

    @staticmethod
    def _client_src():
        import os
        import libertem_tpu.web as web
        path = os.path.join(
            os.path.dirname(os.path.abspath(web.__file__)),
            "client", "index.html",
        )
        with open(path) as f:
            return f.read()

    def test_analysis_types_match_registry(self):
        import re
        import libertem_tpu.analysis  # noqa: F401 (registers all)
        from libertem_tpu.analysis.base import Analysis

        src = self._client_src()
        m = re.search(r"const ANALYSES = \{(.*?)\n\};", src,
                      re.DOTALL)
        assert m, "client ANALYSES registry not found"
        client_types = set(re.findall(
            r"^\s*([A-Z][A-Z0-9_]+):", m.group(1), re.MULTILINE
        ))
        server_types = set(Analysis.registry)
        assert client_types == server_types, (
            client_types ^ server_types
        )

    def test_client_api_paths_exist(self):
        import re

        src = self._client_src()
        called = set(re.findall(r'"(/api/[a-zA-Z/]*?)[?"]', src))
        called |= {
            p.split("${")[0]
            for p in re.findall(r"`(/api/[^`]+)`", src)
        }
        # normalize template paths down to their static prefix
        for prefix in sorted(called):
            resp = None
            probe = prefix
            if not probe.endswith("/"):
                probe = probe.rsplit("/", 1)[0] + "/"
            # probing with GET: a 404 means no route matched at all
            resp = self.fetch(probe + "x/" if probe.count("/") < 3
                              else probe)
            # tornado returns 404 ONLY for unrouted paths; routed
            # handlers answer 200/400/405/500
            assert resp.code != 404 or "jobs" in probe or \
                "compoundAnalyses" in probe or "datasets" in probe, (
                probe, resp.code
            )

    def test_message_vocabulary_covered(self):
        """Every messageType the server can emit must appear in the
        client source — either in a handler branch or in the
        explicit deliberately-ignored comment block.  A new server
        message added without a client decision fails here."""
        import os
        import re

        import libertem_tpu.web as web
        msgs_path = os.path.join(
            os.path.dirname(os.path.abspath(web.__file__)),
            "messages.py",
        )
        with open(msgs_path) as f:
            vocabulary = set(re.findall(
                r'"messageType": "([A-Z_]+)"', f.read()
            ))
        assert len(vocabulary) > 25  # sanity: found the vocabulary
        src = self._client_src()
        missing = {m for m in vocabulary if m not in src}
        assert not missing, (
            f"server messageTypes with no client handler and no "
            f"documented ignore: {sorted(missing)}"
        )


class TestNotebookTemplates(WebTestBase):
    def test_every_analysis_id_has_pretty_template(self):
        """All registered analysis ids generate a dedicated notebook
        template (reference: per-analysis Template classes,
        analysis/*.py GeneratorHelper) and the generated code
        compiles."""
        from libertem_tpu.analysis import Analysis
        from libertem_tpu.web.notebook_generator import (
            ANALYSIS_TEMPLATES, notebook_for,
        )

        ids = (
            "SUM_FRAMES", "SD_FRAMES", "SUM_SIG", "PICK_FRAME",
            "APPLY_DISK_MASK", "APPLY_RING_MASK",
            "APPLY_POINT_SELECTOR", "MASKS", "CENTER_OF_MASS",
            "RADIAL_FOURIER", "FEM", "CLUST", "APPLY_FFT_MASK",
            "PICK_FFT_FRAME", "FFTSUM_FRAMES",
        )
        for id_ in ids:
            assert Analysis.get_analysis_by_type(id_) is not None
            assert id_ in ANALYSIS_TEMPLATES, id_
        params = {
            "cx": 4, "cy": 4, "r": 3, "ri": 1, "ro": 4, "x": 1,
            "y": 1, "n_bins": 2, "max_order": 2, "flip_y": False,
            "scan_rotation": 0.0, "rad_in": 1, "rad_out": 4,
            "n_clust": 3, "n_peaks": 5,
        }
        nb = notebook_for(
            "RAW",
            {"path": "/t.raw", "dtype": "float32",
             "nav_shape": [4, 4], "sig_shape": [8, 8]},
            [{"analysisType": i, "parameters": dict(params)}
             for i in ids],
        )
        code_cells = [
            "".join(c["source"]) for c in nb["cells"]
            if c["cell_type"] == "code"
        ]
        # none fell through to the generic registry form
        joined = "".join(code_cells)
        assert "get_analysis_by_type" not in joined
        for src in code_cells:
            compile(src, "<nb>", "exec")

    def test_notebook_download_inline_analysis_dicts(self):
        """A compound whose analyses list carries inline analysis
        DICTS (instead of uuids) must not 500 the notebook download
        (round-3 live-server drive finding)."""
        data = _mk_random((4, 4, 8, 8), dtype="float32")
        ds = MemoryDataSet(
            data=data, sig_dims=2, num_partitions=1
        ).initialize()
        self.register_ds("ds-nb2", ds)
        self.fetch_json(
            "/api/compoundAnalyses/ca-nb2/", method="PUT",
            body={"dataset": "ds-nb2", "details": {
                "mainType": "SUM_FRAMES",
                "analyses": [{"analysisType": "SUM_FRAMES",
                              "parameters": {}}],
            }},
        )
        resp = self.fetch(
            "/api/compoundAnalyses/ca-nb2/download/notebook/"
        )
        assert resp.code == 200
        nb = json.loads(resp.body)
        src = "".join(
            "".join(c["source"]) for c in nb["cells"]
            if c["cell_type"] == "code"
        )
        assert "create_sum_analysis" in src
