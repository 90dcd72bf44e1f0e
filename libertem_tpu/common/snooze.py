"""Idle-timeout resource snoozing
(reference: libertem/common/snooze.py:22 SnoozeManager, keep_alive
decorator :158 — there it scales a dask cluster down to one worker
after an idle timeout; here it releases cached device state /
compilation-independent buffers and notifies subscribers, since JAX
devices are process-local).

Concurrency contract (mirrors the reference):
- ``_snooze_lock`` serializes the up/down TRANSITIONS themselves, so
  the user callbacks never overlap; concurrent snooze()/unsnooze()
  calls beyond the first short-circuit once they observe the state
  already changed.
- ``keep_alive`` counts in-flight tasks; snooze is refused while any
  are running.
- The background timer only ever calls :meth:`snooze`.
"""
from __future__ import annotations

import contextlib
import functools
import threading
import time
from enum import Enum
from typing import Callable, Optional


class SnoozeMessage(Enum):
    SNOOZE = "snooze"
    UNSNOOZE_START = "unsnooze_start"
    UNSNOOZE_DONE = "unsnooze_done"
    UPDATE_ACTIVITY = "update_activity"


class SnoozeManager:
    """Calls ``down()`` after ``timeout`` seconds without activity and
    ``up()`` on the next touch."""

    def __init__(
        self,
        up: Optional[Callable] = None,
        down: Optional[Callable] = None,
        timeout: float = 300.0,
        subscriptions=None,
    ):
        if timeout <= 0:
            raise ValueError(
                f"snooze timeout must be > 0, got {timeout}"
            )
        self._up = up or (lambda: None)
        self._down = down or (lambda: None)
        # reference attribute names (snooze.py:66-69): tests and
        # callers tune these directly
        self._snooze_timeout = timeout
        self._snooze_check_interval = min(
            1.0, timeout * 0.1 if timeout else 30.0
        )
        self._subs = subscriptions
        # (topics, callback) pairs added via subscribe()
        self._subscribers: list = []
        self._last_activity = time.monotonic()
        self._snoozed = False
        self._keep_alive = 0
        self._closed = False
        # guards counters / timestamps (held briefly, never across
        # user callbacks)
        self._lock = threading.Lock()
        # serializes the up/down transitions (held ACROSS the user
        # callbacks so they never overlap)
        self._snooze_lock = threading.Lock()
        self._timer: Optional[threading.Timer] = None
        self._schedule()

    @property
    def is_snoozing(self) -> bool:
        return self._snoozed

    @property
    def keep_alive(self) -> int:
        """Number of in-flight keep-alive tasks (reference
        snooze.py keep_alive counter)."""
        return self._keep_alive

    def _emit(self, msg: SnoozeMessage):
        payload = {"timestamp": time.monotonic()}
        if self._subs is not None:
            self._subs.send(msg, payload)
        for topics, callback in self._subscribers:
            if msg in topics:
                try:
                    callback(msg, payload)
                except Exception:  # pragma: no cover
                    pass

    def subscribe(self, topics, callback):
        """Register ``callback(topic, msg_dict)`` for the given
        :class:`SnoozeMessage` topics (reference executor
        ``subscribe`` API, used by the web ExecutorState)."""
        self._subscribers.append((tuple(topics), callback))

    def _schedule(self):
        with self._lock:
            if self._closed:
                return
            if self._timer is not None:
                self._timer.cancel()
            self._timer = threading.Timer(
                self._snooze_check_interval, self._check
            )
            self._timer.daemon = True
            self._timer.start()

    def _check(self):
        if self._closed:
            return
        idle = time.monotonic() - self._last_activity
        if (
            not self._snoozed
            and self._keep_alive == 0
            and idle >= self._snooze_timeout
        ):
            self.snooze()
        self._schedule()

    def snooze(self):
        """Release resources now (idle timer path / explicit call).
        Refused while keep-alive tasks run; concurrent calls beyond
        the first return without acting."""
        with self._snooze_lock:
            if self._snoozed or self._keep_alive > 0 or self._closed:
                return
            self._snoozed = True
            self._emit(SnoozeMessage.SNOOZE)
            self._down()

    def unsnooze(self):
        """Bring resources back up; concurrent calls beyond the first
        return without acting."""
        with self._snooze_lock:
            if not self._snoozed:
                return
            # flip the flag BEFORE calling up(): an up() callback may
            # re-enter touch() (which would otherwise re-enter
            # unsnooze and deadlock on the non-reentrant lock)
            self._snoozed = False
            self._emit(SnoozeMessage.UNSNOOZE_START)
            self._up()
            self._emit(SnoozeMessage.UNSNOOZE_DONE)
        with self._lock:
            self._last_activity = time.monotonic()

    def _update_last_activity(self):
        """Reset the idle timer (reference snooze.py:80)."""
        with self._lock:
            self._last_activity = time.monotonic()
        self._emit(SnoozeMessage.UPDATE_ACTIVITY)

    def touch(self):
        self._update_last_activity()
        if self._snoozed:
            self.unsnooze()

    @contextlib.contextmanager
    def in_use(self):
        """Keep-alive section: snooze is refused while inside
        (reference snooze.py:87 in_use)."""
        self.keep_alive_enter()
        try:
            yield
        finally:
            self.keep_alive_exit()

    def keep_alive_enter(self):
        with self._lock:
            self._keep_alive += 1
        self.touch()

    def keep_alive_exit(self):
        with self._lock:
            self._keep_alive = max(0, self._keep_alive - 1)
            self._last_activity = time.monotonic()

    def close(self):
        with self._lock:
            self._closed = True
            if self._timer is not None:
                self._timer.cancel()
                self._timer = None


def keep_alive(fn):
    """Method decorator: hold the owner's snooze manager awake (and
    unsnoozed) for the duration of the call (reference snooze.py:158).
    """
    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        manager = getattr(self, "snooze_manager", None)
        if manager is None:
            return fn(self, *args, **kwargs)
        manager.keep_alive_enter()
        try:
            return fn(self, *args, **kwargs)
        finally:
            manager.keep_alive_exit()
    return wrapper
