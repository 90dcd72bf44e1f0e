"""Run the REFERENCE's web-API test suite (tests/server/) against
this implementation's tornado server through the drop-in
``libertem`` namespace — the web-protocol analogue of
test_reference_suite.py.

The reference's server fixtures (root conftest.py:899-1015) start a
tornado app in a background thread and drive it with aiohttp +
websockets; the conftest shim below mirrors that harness around THIS
repo's ``make_app``.  ``aio_utils.py`` (the reference's protocol
helper module) is copied verbatim at runtime alongside the test file
— it is part of the oracle: it encodes the message sequences the
reference GUI exchanges with the server.

Environment notes: pytest-asyncio is not installed here, so the shim
conftest runs bare ``async def`` tests via ``asyncio.run`` and
injects a fresh in-loop aiohttp session for the ``http_client``
fixture (aiohttp sessions must be created inside the loop that uses
them).  ``local_cluster_url`` points at a dummy listening TCP socket:
this framework has no dask scheduler — a 'tcp' connection request is
validated for reachability and recorded, execution stays on the
single-controller mesh executor (see web/server.py
ConnectionHandler).
"""
import os
import shutil
import subprocess
import sys

import pytest

from test_reference_suite import (
    REF_TESTS,
    _NUMBA_SHIM,
    _SPARSE_SHIM,
    _SPARSECONVERTER_SHIM,
    _UTILS_SHIM,
)

# (reference file, -k selection or None) — every exclusion carries
# its reason inline.
SERVER_CASES = [
    ("server/test_startup.py", None),
    ("server/test_token_auth.py", None),
    ("server/test_shutdown.py", None),
    ("server/test_browse.py", None),
    ("server/test_ds_detect.py", None),
    ("server/test_dataset.py", None),
    ("server/test_job.py", None),
    ("server/test_download.py", None),
    ("server/test_cancel.py", None),
    ("server/test_copy.py", None),
    ("server/test_cli.py", None),
    ("server/test_server_utils.py", None),
    # test_tcp_cluster_details is @dist: it asserts per-host rows of
    # a two-machine dask cluster (dist_ctx) — no multi-host cluster
    # exists here (single-controller design, executor/compat.py)
    ("server/test_cluster_status.py", "not test_tcp_cluster_details"),
    # the two excluded tests assert reference-internal executor
    # construction: test_preload_executor requires the executor to
    # BE a DaskJobExecutor (isinstance check) with dask-worker
    # preload scripts; test_snooze_last_activity drives the
    # reference's snooze_manager attribute on the ASYNC adapter —
    # snooze here lives on the Context/engine layer
    # (common/snooze.py, tested in the main gate via
    # common/test_snooze.py)
    ("server/test_state.py",
     "not test_preload_executor and not test_snooze_last_activity"),
]

_SERVER_CONFTEST_SHIM = '''\
"""Server-suite harness: mirrors the reference root conftest's web
fixtures (conftest.py:899-1015) around THIS repo's make_app."""
import asyncio
import contextlib
import inspect
import socket
import threading

import numpy as np
import pytest


# ---------------------------------------------------------------
# ports

def find_unused_port():
    with contextlib.closing(socket.socket()) as sock:
        sock.bind(("127.0.0.1", 0))
        return sock.getsockname()[1]


@pytest.fixture
def unused_tcp_port_factory():
    return find_unused_port


# ---------------------------------------------------------------
# dummy scheduler endpoint: a listening TCP socket.  The server
# validates 'tcp' connection requests by reachability; execution
# stays on the local mesh executor either way.

@pytest.fixture(scope="session")
def _scheduler_sock():
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    sock.listen(8)

    # accept-and-close so the backlog never fills up across the many
    # reachability probes a test session makes
    def _drain():
        while True:
            try:
                conn, _ = sock.accept()
                conn.close()
            except OSError:
                return

    drainer = threading.Thread(target=_drain, daemon=True)
    drainer.start()
    yield sock
    sock.close()


@pytest.fixture
def local_cluster_url(_scheduler_sock):
    host, port = _scheduler_sock.getsockname()
    return f"tcp://{host}:{port}"


@pytest.fixture
def local_cluster_url_per_module(local_cluster_url):
    return local_cluster_url


# ---------------------------------------------------------------
# server thread

class ServerThread(threading.Thread):
    def __init__(self, port, shared_state, token, **kwargs):
        super().__init__(name="server-suite-bg", **kwargs)
        self.stop_event = threading.Event()
        self.start_event = threading.Event()
        self.port = port
        self.shared_state = shared_state
        self.token = token
        self.loop = None

    async def wait_for_stop(self):
        while True:
            if self.stop_event.is_set():
                break
            await asyncio.sleep(0.05)
        self.server.stop()
        self.loop.stop()

    def run(self):
        import tornado.httpserver
        from libertem.web.events import EventRegistry
        from libertem.web.server import make_app

        self.loop = loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)
        event_registry = EventRegistry()
        app = make_app(event_registry, self.shared_state,
                       self.token)
        self.server = tornado.httpserver.HTTPServer(app)
        self.server.listen(address="127.0.0.1", port=self.port)
        asyncio.ensure_future(self.wait_for_stop())
        self.start_event.set()
        try:
            loop.run_forever()
        finally:
            loop.close()


@contextlib.contextmanager
def common_server_startup(shared_state, token):
    port = find_unused_port()
    thread = ServerThread(port, shared_state, token, daemon=True)
    thread.start()
    assert thread.start_event.wait(timeout=15), "server failed to start"
    yield port
    thread.stop_event.set()
    thread.join(timeout=15)


@pytest.fixture
def default_token():
    return "something_random"


@pytest.fixture
def shared_state():
    from libertem.web.event_bus import EventBus
    from libertem.web.state import ExecutorState, SharedState
    executor_state = ExecutorState(event_bus=EventBus())
    yield SharedState(executor_state=executor_state)
    executor_state.shutdown()


@pytest.fixture
def server_port(shared_state, default_token):
    with common_server_startup(shared_state, default_token) as port:
        yield port


@pytest.fixture
def base_url(server_port):
    return "http://127.0.0.1:%d" % server_port


@pytest.fixture
def base_url_no_token(shared_state):
    with common_server_startup(shared_state, None) as port:
        yield "http://127.0.0.1:%d" % port


# ---------------------------------------------------------------
# http_client: aiohttp sessions must be created INSIDE the event
# loop that uses them; pytest-asyncio is absent, so the fixture
# yields a sentinel that pytest_pyfunc_call swaps for an in-loop
# session around each async test.

class _LazyClient:
    pass


@pytest.fixture
def http_client():
    return _LazyClient()


# ---------------------------------------------------------------
# datasets

@pytest.fixture
def lt_ctx():
    from libertem.api import Context
    from libertem.executor.inline import InlineJobExecutor
    return Context(executor=InlineJobExecutor())


@pytest.fixture(scope="session")
def default_raw_file(tmp_path_factory):
    from utils import _mk_random
    path = tmp_path_factory.mktemp("data") / "raw-test-default"
    _mk_random(
        size=(16, 16, 128, 128), dtype="float32"
    ).tofile(str(path))
    return str(path)


@pytest.fixture
def default_raw(default_raw_file, lt_ctx):
    return lt_ctx.load(
        "raw", path=default_raw_file, dtype="float32",
        nav_shape=(16, 16), sig_shape=(128, 128),
    )


class _H5File:
    def __init__(self, filename):
        self.filename = filename


@pytest.fixture
def hdf5(tmp_path):
    import h5py
    path = str(tmp_path / "hdf5-test.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset(
            "data",
            data=np.random.randn(5, 5, 16, 16).astype("float32"),
        )
    return _H5File(path)


@pytest.fixture
def async_executor():
    from libertem.executor.base import AsyncAdapter
    from libertem.executor.inline import InlineJobExecutor
    return AsyncAdapter(wrapped=InlineJobExecutor())


# ---------------------------------------------------------------
# bare-async test support (pytest-asyncio absent)

def pytest_pyfunc_call(pyfuncitem):
    fn = pyfuncitem.function
    if not inspect.iscoroutinefunction(fn):
        return None
    kwargs = {
        k: pyfuncitem.funcargs[k]
        for k in pyfuncitem._fixtureinfo.argnames
    }
    lazy_keys = [
        k for k, v in kwargs.items() if isinstance(v, _LazyClient)
    ]

    async def run():
        import aiohttp
        if lazy_keys:
            async with aiohttp.ClientSession(
                timeout=aiohttp.ClientTimeout(total=120)
            ) as session:
                for k in lazy_keys:
                    kwargs[k] = session
                await fn(**kwargs)
        else:
            await fn(**kwargs)

    asyncio.run(run())
    return True
'''


@pytest.mark.skipif(
    not os.path.isdir(REF_TESTS),
    reason="reference checkout not available",
)
@pytest.mark.parametrize(
    "relpath,k_expr", SERVER_CASES,
    ids=[c[0] for c in SERVER_CASES],
)
def test_reference_server_file_passes(relpath, k_expr, tmp_path):
    src = os.path.join(REF_TESTS, relpath)
    dst = tmp_path / os.path.basename(relpath)
    shutil.copy(src, dst)
    # the reference's protocol-helper module is part of the oracle:
    # copied verbatim alongside the test file, like the file itself
    shutil.copy(
        os.path.join(REF_TESTS, "aio_utils.py"),
        tmp_path / "aio_utils.py",
    )
    (tmp_path / "utils.py").write_text(_UTILS_SHIM)
    (tmp_path / "sparseconverter.py").write_text(
        _SPARSECONVERTER_SHIM
    )
    (tmp_path / "conftest.py").write_text(_SERVER_CONFTEST_SHIM)
    (tmp_path / "numba.py").write_text(_NUMBA_SHIM)
    (tmp_path / "sparse.py").write_text(_SPARSE_SHIM)
    repo_root = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root
    env["JAX_PLATFORMS"] = "cpu"
    args = [sys.executable, "-m", "pytest", str(dst), "-q",
            "-p", "no:cacheprovider"]
    if k_expr:
        args += ["-k", k_expr]
    proc = subprocess.run(
        args, cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"{relpath} failed against this implementation:\n"
        f"{proc.stdout[-4000:]}\n{proc.stderr[-2000:]}"
    )
