"""Progress reporting subsystem
(reference: libertem/common/progress.py — ProgressReporter:100,
TQDMProgressReporter:146, ProgressManager:233,
PartitionProgressTracker:394, CommsDispatcher:40).

Two feedback paths, like the reference:

- the MAIN loop reports partition completion synchronously
  (``partition_done`` — the fallback that keeps the bar honest even
  when comms fail), and
- datasets with a real :class:`TaskCommHandler` stream fine-grained
  ``partition_start`` / ``tile_complete`` messages through a
  :class:`WorkerQueue`; a :class:`CommsDispatcher` thread forwards
  them to subscribed callbacks (the manager's ``handle_*`` methods).

Per-partition counters are clamped to each partition's frame budget so
the two paths never double-count.
"""
from __future__ import annotations

import sys
import threading
import time
from typing import NamedTuple, Optional


def get_time():
    # module-level indirection so tests can monkeypatch the clock
    # (reference progress.py:389)
    return time.time()


class ProgressState(NamedTuple):
    """Snapshot passed from ProgressManager to ProgressReporter
    (reference progress.py:80 — same field order)."""
    #: frames processed (float: tile updates may cover part-frames)
    num_frames_complete: float
    num_frames_total: int
    num_part_complete: int
    num_part_in_progress: int
    num_part_total: int
    progress_id: str


class ProgressReporter:
    """Receives ProgressState snapshots; subclass for UIs."""

    def start(self, state: ProgressState):
        pass

    def update(self, state: ProgressState):
        pass

    def end(self, state: ProgressState):
        pass


class TQDMProgressReporter(ProgressReporter):
    def __init__(self):
        self._bar = None

    def start(self, state: ProgressState):
        import tqdm
        self._bar = tqdm.tqdm(
            total=state.num_frames_total, unit="frame",
            desc=f"run {state.progress_id[:8]}",
        )

    def update(self, state: ProgressState):
        if self._bar is not None:
            delta = state.num_frames_complete - self._bar.n
            if delta > 0:
                self._bar.update(delta)

    def end(self, state: ProgressState):
        if self._bar is not None:
            self.update(state)
            self._bar.close()


class CommsDispatcher:
    """Drains a WorkerQueue in a background thread, forwarding each
    (topic, message) to the subscribed callbacks (reference
    progress.py:40).  Used by TaskCommHandler.monitor()."""

    def __init__(self, queue, subscriptions: dict):
        self._queue = queue
        self._subscriptions = subscriptions
        self._thread: Optional[threading.Thread] = None

    def __enter__(self):
        self._thread = threading.Thread(
            target=self._drain, daemon=True
        )
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._queue.put(("STOP", {}))
        self._thread.join(timeout=10)
        self._thread = None
        return False

    def _drain(self):
        while True:
            with self._queue.get(block=True) as ((topic, msg), _):
                if topic == "STOP":
                    return
                for callback in self._subscriptions.get(topic, ()):
                    try:
                        callback(topic, msg)
                    except Exception:
                        pass


class ProgressManager:
    """Tracks completion and forwards updates to a reporter.

    The main loop drives :meth:`partition_done` / :meth:`frames_done`
    synchronously; when the run has task comms, :meth:`connect`
    subscribes the ``handle_*`` message callbacks, whose per-partition
    pseudo-frame counters are clamped against ``task_max`` so the
    synchronous completion snap never double-counts (reference
    ProgressManager:233)."""

    def __init__(
        self,
        num_frames_total: int,
        num_part_total: int,
        reporter: Optional[ProgressReporter] = None,
        progress_id: str = "",
        min_delta: float = 0.1,
        task_max: Optional[dict] = None,
        sig_size: int = 1,
    ):
        self._num_frames_total = int(num_frames_total)
        self._num_part_total = int(num_part_total)
        self._progress_id = progress_id
        # per-partition pseudo-frame counters (comms/tile path)
        self._task_max = dict(task_max or {})
        self._counters = {k: 0.0 for k in self._task_max}
        self._sig_size = max(1, int(sig_size))
        self._complete: set = set()
        self._in_progress: set = set()
        # frames/partitions reported without an ident (sharded fold)
        self._anon_frames = 0.0
        self._anon_parts = 0
        self._lock = threading.Lock()
        self._reporter = reporter or ProgressReporter()
        self._min_delta = min_delta
        self._last = 0.0
        self._reporter.start(self.state)

    @property
    def state(self) -> ProgressState:
        return ProgressState(
            sum(self._counters.values()) + self._anon_frames,
            self._num_frames_total,
            len(self._complete) + self._anon_parts,
            len(self._in_progress),
            self._num_part_total,
            self._progress_id,
        )

    # -- synchronous main-loop path ---------------------------------------

    def frames_done(self, n: int, ident=None):
        with self._lock:
            if ident is not None and ident in self._task_max:
                self._counters[ident] = min(
                    self._task_max[ident],
                    self._counters.get(ident, 0.0) + n,
                )
            else:
                self._anon_frames += n
        now = time.monotonic()
        if now - self._last >= self._min_delta:
            self._last = now
            self._reporter.update(self.state)

    def partition_done(self, n_frames: int, ident=None):
        """Synchronous completion fallback (reference
        finalize_task, progress.py:297): snap the partition's counter
        to its max and report unconditionally."""
        with self._lock:
            if ident is not None and ident in self._task_max:
                self._counters[ident] = self._task_max[ident]
                self._in_progress.discard(ident)
                self._complete.add(ident)
            else:
                self._anon_frames += n_frames
                self._anon_parts += 1
        self._reporter.update(self.state)

    # -- comms/message path ------------------------------------------------

    def connect(self, comms):
        """Subscribe the message handlers on a TaskCommHandler
        (reference progress.py:316)."""
        comms.subscribe("partition_start", self.handle_start_task)
        comms.subscribe("partition_complete", self.handle_end_task)
        comms.subscribe("tile_complete", self.handle_tile_update)

    def handle_start_task(self, topic: str, message: dict):
        if topic != "partition_start":
            raise RuntimeError("Unrecognized topic")
        t_id = message["ident"]
        with self._lock:
            if t_id not in self._complete:
                self._in_progress.add(t_id)
        self._reporter.update(self.state)

    def handle_end_task(self, topic: str, message: dict):
        if topic != "partition_complete":
            raise RuntimeError("Unrecognized topic")
        t_id = message["ident"]
        with self._lock:
            if t_id in self._task_max:
                self._counters[t_id] = self._task_max[t_id]
            self._in_progress.discard(t_id)
            self._complete.add(t_id)
        self._reporter.update(self.state)

    def handle_tile_update(self, topic: str, message: dict):
        if topic != "tile_complete":
            raise RuntimeError("Unrecognized topic")
        t_id = message["ident"]
        with self._lock:
            if t_id not in self._task_max:
                return
            if self._counters[t_id] >= self._task_max[t_id]:
                return
            pframes = message["elements"] / self._sig_size
            self._counters[t_id] = min(
                self._task_max[t_id],
                self._counters[t_id] + pframes,
            )
        self._reporter.update(self.state)

    def close(self, complete: Optional[bool] = None):
        """End the progress stream.  ``complete`` snaps the counters
        to the totals; by default that only happens when no exception
        is in flight — close() also runs in ``finally`` blocks of
        failed or abandoned runs, which must not report 100%."""
        if complete is None:
            complete = sys.exc_info()[0] is None
        if complete:
            with self._lock:
                for k in self._task_max:
                    self._counters[k] = self._task_max[k]
                    self._complete.add(k)
                self._in_progress.clear()
                self._anon_frames = (
                    self._num_frames_total
                    - sum(self._counters.values())
                )
                self._anon_parts = (
                    self._num_part_total - len(self._complete)
                )
        self._reporter.end(self.state)


class PartitionTrackerNoOp:
    """No-op tracker: used when the dataset has no task comms, so the
    per-frame signalling path costs nothing (reference
    progress.py:379)."""

    def signal_start(self, *a, **kw):
        pass

    def signal_frames_complete(self, *a, **kw):
        pass

    def signal_complete(self, *a, **kw):
        pass


class PartitionProgressTracker(PartitionTrackerNoOp):
    """Streams rate-limited progress messages for one partition
    through the worker context (reference progress.py:394).

    The elements-complete accounting runs per FRAME: the first frame
    of a partition is treated as free (warmup), and a message is sent
    at most once per ``min_message_interval`` carrying the elements
    accumulated since the last send."""

    def __init__(
        self,
        ident: str,
        worker_context,
        sig_size: int,
        min_message_interval: float = 1.0,
    ):
        self._ident = ident
        self._worker_context = worker_context
        self._sig_size = int(sig_size)
        self._min_message_interval = min_message_interval
        self._elements_complete = 0
        self._last_message_t = None

    def signal_start(self):
        if self._worker_context is None:
            return
        self._worker_context.signal(
            self._ident, "partition_start", {}
        )

    def _should_send(self, elements: int) -> int:
        current_t = get_time()
        self._elements_complete += elements
        if self._last_message_t is None:
            # never send for the first frame batch: it carries
            # warmup/compile overheads (reference progress.py:466)
            self._last_message_t = current_t
            return 0
        if current_t - self._last_message_t \
                > self._min_message_interval:
            out = self._elements_complete
            self._elements_complete = 0
            self._last_message_t = current_t
            return out
        return 0

    def signal_frames_complete(self, n_frames: int):
        if self._worker_context is None:
            return
        for _ in range(int(n_frames)):
            send = self._should_send(self._sig_size)
            if send:
                self._worker_context.signal(
                    self._ident, "tile_complete",
                    {"elements": send},
                )

    def signal_complete(self):
        if self._worker_context is None:
            return
        self._worker_context.signal(
            self._ident, "partition_complete", {}
        )
