"""Idle-timeout resource snoozing
(reference: libertem/common/snooze.py:22 SnoozeManager, keep_alive
decorators :158,173 — there it scales a dask cluster down to one
worker after idle timeout; here it releases cached device state /
compilation-independent buffers and notifies subscribers, since JAX
devices are process-local).
"""
from __future__ import annotations

import functools
import threading
import time
from enum import Enum
from typing import Callable, Optional


class SnoozeMessage(str, Enum):
    SNOOZE = "SNOOZE"
    UNSNOOZE = "UNSNOOZE"
    UNSNOOZE_DONE = "UNSNOOZE_DONE"
    UPDATE_ACTIVITY = "UPDATE_ACTIVITY"


class SnoozeManager:
    """Calls ``down()`` after ``timeout`` seconds without activity and
    ``up()`` on the next touch.  User callbacks and subscriber sends
    run OUTSIDE the internal lock (a callback may re-enter the
    manager); state transitions are decided under the lock."""

    def __init__(
        self,
        up: Optional[Callable] = None,
        down: Optional[Callable] = None,
        timeout: float = 300.0,
        subscriptions=None,
    ):
        self._up = up or (lambda: None)
        self._down = down or (lambda: None)
        self._timeout = timeout
        self._subs = subscriptions
        self._last_activity = time.monotonic()
        self._snoozed = False
        self._keep_alive = 0
        self._closed = False
        self._lock = threading.Lock()
        self._timer: Optional[threading.Timer] = None
        self._schedule()

    @property
    def is_snoozing(self) -> bool:
        return self._snoozed

    def _emit(self, msg: SnoozeMessage):
        if self._subs is not None:
            self._subs.send(msg.value, {})

    def _schedule(self):
        with self._lock:
            if self._closed:
                return
            if self._timer is not None:
                self._timer.cancel()
            self._timer = threading.Timer(
                max(1.0, self._timeout / 4), self._check
            )
            self._timer.daemon = True
            self._timer.start()

    def _check(self):
        fire_down = False
        with self._lock:
            if self._closed:
                return
            idle = time.monotonic() - self._last_activity
            if (
                not self._snoozed
                and self._keep_alive == 0
                and idle >= self._timeout
            ):
                self._snoozed = True
                fire_down = True
        if fire_down:
            self._emit(SnoozeMessage.SNOOZE)
            self._down()
        self._schedule()

    def touch(self):
        fire_up = False
        with self._lock:
            self._last_activity = time.monotonic()
            if self._snoozed:
                self._snoozed = False
                fire_up = True
        self._emit(SnoozeMessage.UPDATE_ACTIVITY)
        if fire_up:
            self._emit(SnoozeMessage.UNSNOOZE)
            self._up()
            self._emit(SnoozeMessage.UNSNOOZE_DONE)

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
    """Method decorator: hold the owner's snooze manager awake for the
    duration of the call (reference snooze.py:158)."""
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
