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

from contextlib import contextmanager
from typing import Any, Callable, Iterable, Optional, Sequence

import jax


class WorkerQueueEmpty(Exception):
    """Non-blocking get on an empty queue, or a blocking get timed
    out (reference common/executor.py:521)."""


class WorkerQueue:
    """Interface for main<->worker streaming queues (reference
    common/executor.py:529).  ``get`` is a context manager yielding
    ``(header, payload)``."""

    def get(self, block: bool = True, timeout=None):
        raise NotImplementedError()

    def put(self, header, payload=None):
        raise NotImplementedError()

    def put_nocopy(self, header, size: int):
        """Context manager yielding a writable memoryview of
        ``size`` bytes, enqueued on exit (reference
        common/executor.py:548)."""
        raise NotImplementedError()

    def close(self, drain: bool = True, force: bool = False):
        raise NotImplementedError()

    def size(self) -> int:
        raise NotImplementedError()


class SimpleWorkerQueue(WorkerQueue):
    """Threading-queue-backed WorkerQueue (reference
    common/executor.py:596) — the natural fit for this engine's
    single-process controller."""

    def __init__(self):
        import queue as _queue
        self._queue_mod = _queue
        self.q = _queue.Queue()

    def put(self, header, payload=None):
        self.q.put((header, payload))

    @contextmanager
    def put_nocopy(self, header, size: int):
        import numpy as _np
        payload = _np.zeros(size, dtype=_np.uint8)
        yield memoryview(payload)
        self.q.put((header, payload))

    @contextmanager
    def get(self, block: bool = True, timeout=None):
        try:
            yield self.q.get(block=block, timeout=timeout)
        except self._queue_mod.Empty:
            raise WorkerQueueEmpty()

    def close(self, drain: bool = True, force: bool = False):
        pass

    def size(self) -> int:
        return self.q.qsize()


class SimpleMPWorkerQueue(WorkerQueue):
    """multiprocessing.Queue-backed WorkerQueue (reference
    common/executor.py:628).  Items cross a process boundary, so
    header and payload are cloudpickled (headers may carry closures).
    Present for protocol parity — this engine's own loops are
    single-process + threads (SimpleWorkerQueue)."""

    def __init__(self):
        import multiprocessing as mp
        import queue as _queue
        self._queue_mod = _queue
        self._mp_ctx = mp.get_context("spawn")
        self.q = self._mp_ctx.Queue()
        self._closed = False

    def _dumps(self, obj):
        import cloudpickle
        return cloudpickle.dumps(obj)

    def put(self, header, payload=None):
        self.q.put((self._dumps(header), self._dumps(payload)))

    @contextmanager
    def put_nocopy(self, header, size: int):
        import numpy as _np
        payload = _np.zeros(size, dtype=_np.uint8)
        yield memoryview(payload)
        self.q.put((self._dumps(header), self._dumps(payload)))

    @contextmanager
    def get(self, block: bool = True, timeout=None):
        import pickle
        try:
            res = self.q.get(block=block, timeout=timeout)
        except self._queue_mod.Empty:
            raise WorkerQueueEmpty()
        yield (pickle.loads(res[0]), pickle.loads(res[1]))

    def close(self, drain: bool = True, force: bool = False):
        if not self._closed:
            if drain:
                while True:
                    try:
                        self.q.get_nowait()
                    except self._queue_mod.Empty:
                        break
            self.q.close()
            self._closed = True

    def size(self) -> int:
        return self.q.qsize()


class WorkerContext:
    """Streaming communication handle between main process and
    workers (reference common/executor.py:682)."""

    def get_worker_queue(self) -> WorkerQueue:
        raise NotImplementedError()

    def signal(self, ident: str, topic: str, msg_dict: dict):
        raise NotImplementedError()


class SimpleWorkerContext(WorkerContext):
    """In-process WorkerContext bound to one queue: ``signal``
    enqueues ``(topic, {..., 'ident': ident})`` headers."""

    def __init__(self, queue: WorkerQueue):
        self._queue = queue

    def get_worker_queue(self) -> WorkerQueue:
        return self._queue

    def signal(self, ident: str, topic: str, msg_dict: dict):
        if "ident" in msg_dict:
            raise ValueError("'ident' is a reserved message key")
        self._queue.put((topic, {**msg_dict, "ident": ident}))


class TaskCommHandler:
    """Interface implemented by datasets/acquisitions for streaming
    communication with the processing loop (reference
    common/executor.py:694): progress messages flow back through
    ``monitor``; live datasets push detector data via
    ``handle_task``."""

    def handle_task(self, task, queue: WorkerQueue):
        pass

    def start(self):
        pass

    def done(self):
        pass

    @property
    def subscriptions(self) -> dict:
        try:
            return self._subscriptions
        except AttributeError:
            self._subscriptions = {}
            return self._subscriptions

    def subscribe(self, topic: str, callback) -> None:
        """Register ``callback(topic, message_dict)`` for messages on
        ``topic``; messages carry an 'ident' sender key."""
        self.subscriptions.setdefault(topic, []).append(callback)

    @contextmanager
    def monitor(self, queue: WorkerQueue):
        """Dispatch queue messages to subscribed callbacks from a
        background thread for the duration of the block."""
        from ..common.progress import CommsDispatcher
        with CommsDispatcher(queue, self.subscriptions):
            yield


class NoopCommHandler(TaskCommHandler):
    """Comm handler that streams nothing (reference
    common/executor.py:777) — the engine skips per-frame progress
    signalling entirely when it sees this type."""


class JobCancelledError(Exception):
    """The current job was cancelled — raised from inside a task (a
    UDF process function or the data source running dry); the runner
    translates it into :class:`UDFRunCancelled` (reference
    common/executor.py:45)."""


class Environment:
    """Per-task environment (reference common/executor.py:52)."""

    def __init__(self, threads_per_worker: int = 1,
                 threaded_executor: bool = False,
                 worker_context=None, gpu_id=None, device=None):
        self.threads_per_worker = threads_per_worker
        self.threaded_executor = threaded_executor
        self.worker_context = worker_context
        self.gpu_id = gpu_id
        self.device = device

    def enter(self):
        return self

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


# resource-name -> requested/provided amount (reference
# common/executor.py:29)
ResourceDef = dict


class TaskProtocol:
    """Structural interface for tasks handed to executors (reference
    common/executor.py:143) — callable with (params, env), plus
    partition/resource accessors."""

    def __call__(self, params, env):
        pass

    def get_partition(self):
        ...

    def get_resources(self) -> dict:
        ...


class Worker:
    def __init__(self, name: str, host: str, device=None,
                 resources: Optional[dict] = None, nthreads: int = 1):
        self.name = name
        self.host = host
        self.device = device
        self.resources = {} if resources is None else resources
        self.nthreads = nthreads

    def __eq__(self, other) -> bool:
        if not isinstance(other, Worker):
            return NotImplemented
        return (
            self.name == other.name
            and self.host == other.host
            and self.device == other.device
            and self.resources == other.resources
            and self.nthreads == other.nthreads
        )

    def __hash__(self):
        return hash((self.name, self.host))

    def __repr__(self):
        return f"<Worker {self.name} device={self.device}>"


class WorkerSet:
    def __init__(self, workers: Sequence[Worker]):
        self.workers = list(workers)

    def __len__(self):
        return len(self.workers)

    def __iter__(self):
        return iter(self.workers)

    def __eq__(self, other) -> bool:
        if not isinstance(other, WorkerSet):
            return NotImplemented
        return self.workers == other.workers

    def extend(self, other: "WorkerSet") -> "WorkerSet":
        return WorkerSet(self.workers + list(other))

    def has_tpu(self) -> bool:
        return any(
            w.device is not None
            and getattr(w.device, "platform", None) in ("tpu", "axon")
            for w in self.workers
        )

    def hosts(self) -> set:
        """Set of worker host names (reference
        common/scheduler.py WorkerSet.hosts)."""
        return {w.host for w in self.workers}


class _ScatterHandle:
    """In-process stand-in for a scattered-object handle
    (reference: dask Future from Client.scatter)."""

    def __init__(self, obj):
        self.obj = obj

    def get(self):
        return self.obj


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
        """Per-host resource rows for the GUI cluster page, in the
        reference's exact shape (DaskJobExecutor.get_resource_details,
        executor/dask.py:387): one row per host with {host, cpu,
        cuda, service}.  ``cpu`` is the advertised CPU-worker count —
        the GUI connection's ``numWorkers`` when one was given
        (web/helpers.py create_executor), else the device count."""
        workers = self.get_available_workers()
        cpu_workers = getattr(self, "_cpu_workers", None)
        details = []
        for host in sorted(workers.hosts()):
            on_host = [w for w in workers if w.host == host]
            details.append({
                "host": host,
                "cpu": (
                    cpu_workers if cpu_workers is not None
                    else len(on_host)
                ),
                "cuda": 0,
                "service": 1,
            })
        return details

    # -- reference utility API (common/executor.py:185-432) ------------

    def run_process_local(self, task, args=(), kwargs=None):
        """Run a callable in the current process
        (reference executor.py:185)."""
        return task(*args, **(kwargs or {}))

    def run_each_partition(self, partitions, fn, all_nodes=False):
        """Run ``fn(partition)`` for each partition
        (reference executor.py:272).  Single-controller: data
        locality is moot, ``all_nodes`` changes nothing."""
        for p in partitions:
            yield fn(p)

    def run_each_host(self, fn, *args, **kwargs) -> dict:
        """host -> result map (reference executor.py:308); one host
        per process here."""
        return {"localhost": fn(*args, **kwargs)}

    def scatter(self, obj):
        """Share ``obj`` with the workers (reference executor.py:227,
        a context manager yielding a handle).  Workers are devices of
        THIS process, so the handle is a trivial in-process box."""
        from contextlib import contextmanager

        @contextmanager
        def _scatter():
            yield _ScatterHandle(obj)

        return _scatter()

    def scatter_update(self, handle, obj):
        handle.obj = obj

    def scatter_update_patch(self, handle, patch):
        handle.obj.patch(patch)

    def modify_buffer_type(self, buf):
        """Hook for executors that substitute result-buffer types
        (reference: DelayedJobExecutor wraps buffers lazily); identity
        here."""
        return buf

    def get_udf_runner(self):
        from ..udf.base import UDFRunner
        return UDFRunner

    @property
    def snooze_manager(self):
        """The Context's snooze manager when one is installed
        (reference executor.py: snooze_manager property)."""
        return getattr(self, "_snooze_manager", None)

    @property
    def subscriptions(self):
        from ..common.subscriptions import SubscriptionManager
        if getattr(self, "_subscriptions", None) is None:
            self._subscriptions = SubscriptionManager()
        return self._subscriptions

    def subscribe(self, topic: str, callback) -> str:
        """Register a callback for executor events
        (reference executor.py:410); Context.run_udf emits
        ``run_udf:start`` / ``run_udf:end``."""
        return self.subscriptions.subscribe(topic, callback)

    def unsubscribe(self, key: str) -> bool:
        return self.subscriptions.unsubscribe(key)

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


class ExecutorError(Exception):
    """Generic executor failure (reference common/executor.py:41)."""


class ResourceError(RuntimeError):
    """Task requests resources the worker pool lacks (reference
    executor/base.py:26)."""


# reference naming: BaseJobExecutor is the concrete-executor base
# (executor/base.py:95); here the JobExecutor protocol class fills
# both roles
BaseJobExecutor = JobExecutor


class GenericTaskProtocol:
    """Interface for generic (non-UDF) tasks submitted via
    run_function-style APIs (reference common/executor.py:160)."""

    def __call__(self, args, kwargs, environment):
        raise NotImplementedError()


def make_canonical(main_gpu) -> "int | None":
    """Resolve a main-device spec to a device index or None
    (reference executor/base.py:34, where the devices are GPUs; the
    accelerator class on this target is the TPU mesh).  True picks
    the first accelerator and raises without one; an int validates
    against the device count; False/None disable/auto."""
    import jax

    def _n_devices():
        try:
            return jax.device_count()
        except Exception:
            return 0

    if main_gpu is None or main_gpu is False:
        return None
    if main_gpu is True:
        if _n_devices() < 1:
            raise ResourceError(
                "main_gpu=True but no accelerator devices present"
            )
        return 0
    idx = int(main_gpu)
    if idx < 0 or idx >= _n_devices():
        raise ResourceError(
            f"main_gpu={idx} is not present "
            f"({_n_devices()} devices)"
        )
    return idx


def __getattr__(name):
    # reference layout compat: AsyncAdapter is importable from
    # executor.base there (lazy here to avoid a circular import);
    # AsyncJobExecutor names its async facade
    if name in ("AsyncAdapter", "AsyncJobExecutor"):
        from .async_adapter import AsyncAdapter
        return AsyncAdapter
    raise AttributeError(name)
