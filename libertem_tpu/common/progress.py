"""Progress reporting subsystem
(reference: libertem/common/progress.py — ProgressReporter:100,
TQDMProgressReporter:146, ProgressManager:233,
PartitionProgressTracker:394).

Single-controller simplification: there is no worker→main message
queue; the runner drives the manager directly from the partition /
super-step loop.
"""
from __future__ import annotations

import sys
import time
from dataclasses import dataclass
from typing import Optional


@dataclass
class ProgressState:
    num_frames_complete: int
    num_frames_total: int
    num_part_complete: int
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
            self._bar.close()
            self._bar = None


class ProgressManager:
    """Tracks per-partition completion and forwards throttled updates
    to a reporter."""

    def __init__(
        self,
        num_frames_total: int,
        num_part_total: int,
        reporter: Optional[ProgressReporter] = None,
        progress_id: str = "",
        min_delta: float = 0.1,
    ):
        self._state = ProgressState(
            0, num_frames_total, 0, num_part_total, progress_id
        )
        self._reporter = reporter or ProgressReporter()
        self._min_delta = min_delta
        self._last = 0.0
        self._reporter.start(self._state)

    def frames_done(self, n: int):
        self._state.num_frames_complete += n
        now = time.monotonic()
        if now - self._last >= self._min_delta:
            self._last = now
            self._reporter.update(self._state)

    def partition_done(self, n_frames: int):
        self._state.num_part_complete += 1
        self.frames_done(n_frames)

    def close(self, complete: Optional[bool] = None):
        """End the progress stream.  ``complete`` snaps the counters
        to the totals; by default that only happens when no exception
        is in flight — close() also runs in ``finally`` blocks of
        failed or abandoned runs, which must not report 100%."""
        if complete is None:
            complete = sys.exc_info()[0] is None
        if complete:
            self._state.num_frames_complete = (
                self._state.num_frames_total
            )
            self._state.num_part_complete = self._state.num_part_total
        self._reporter.end(self._state)
