"""Live-stream dataset: process frames while a detector pushes them.

TPU-native counterpart of the reference's live-processing hooks
(common/executor.py:694 TaskCommHandler + the LiberTEM-live sibling
package): an acquisition source ``push_frames()``-es into a bounded
ring buffer while the UDF runner's prefetch thread pulls fixed-shape
blocks out — frames stream through host RAM into the device without
landing on disk.

The nav shape (total frame budget) is declared up front, keeping the
jit-compiled step static; acquisitions that stop early call
``finish()`` and the remaining frames are zero-filled with the damage
mask marking what actually arrived (same validity machinery as ROI).
"""
from __future__ import annotations

import threading
from typing import Iterator, Optional, Sequence

import numpy as np

from ...common.shape import Shape
from .base import DataSet, DataSetMeta, Partition


class FrameRing:
    """Bounded, ordered frame buffer: producers push chunks of frames,
    consumers read contiguous ranges (blocking until available)."""

    def __init__(self, n_total: int, sig_shape, dtype,
                 capacity: int = 1024):
        self._n_total = n_total
        self._sig = tuple(sig_shape)
        self._dtype = np.dtype(dtype)
        self._buf = np.zeros((capacity,) + self._sig, self._dtype)
        self._capacity = capacity
        self._written = 0   # frames pushed so far
        self._consumed = 0  # frames the reader is done with
        self._finished = False
        self._cv = threading.Condition()

    def push_frames(self, frames: np.ndarray):
        frames = np.asarray(frames, dtype=self._dtype).reshape(
            (-1,) + self._sig
        )
        i = 0
        while i < len(frames):
            with self._cv:
                self._cv.wait_for(
                    lambda: self._written - self._consumed
                    < self._capacity
                )
                space = self._capacity - (
                    self._written - self._consumed
                )
                take = min(space, len(frames) - i)
                for k in range(take):
                    self._buf[
                        (self._written + k) % self._capacity
                    ] = frames[i + k]
                self._written += take
                i += take
                self._cv.notify_all()

    def finish(self):
        with self._cv:
            self._finished = True
            self._cv.notify_all()

    @property
    def frames_received(self) -> int:
        with self._cv:
            return self._written

    def read(self, start: int, stop: int) -> np.ndarray:
        """Frames [start, stop); blocks until pushed (zeros for
        frames that never arrive before finish())."""
        if stop - start > self._capacity:
            # the producer can't get more than `capacity` frames ahead
            # of the reader, so this wait could never be satisfied
            raise ValueError(
                f"read of {stop - start} frames exceeds the ring "
                f"capacity {self._capacity}; raise ring_capacity or "
                "lower the block size"
            )
        out = np.zeros((stop - start,) + self._sig, self._dtype)
        with self._cv:
            if start < self._consumed:
                # those slots may already be overwritten — the ring
                # is a strictly in-order single-consumer structure
                # (concurrent/sharded readers are rejected upstream
                # via DataSet.supports_concurrent_reads)
                raise RuntimeError(
                    f"FrameRing read at {start} regresses behind "
                    f"already-freed frame {self._consumed}; ring "
                    "reads must be in ascending order"
                )
            # reads arrive in ascending order, so everything below
            # `start` (e.g. ROI-skipped frames or whole skipped
            # partitions) is done with: free it NOW, before waiting —
            # otherwise a ROI gap >= capacity deadlocks producer and
            # consumer
            if start > self._consumed:
                self._consumed = start
                self._cv.notify_all()
            self._cv.wait_for(
                lambda: self._written >= stop or self._finished
            )
            hi = min(stop, self._written)
            for idx in range(start, hi):
                out[idx - start] = self._buf[idx % self._capacity]
            # reader consumes in order: free the ring up to `stop`
            self._consumed = max(self._consumed, min(stop, hi))
            self._cv.notify_all()
        return out


class LivePartition(Partition):
    def __init__(self, ring: FrameRing, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._ring = ring

    def _read_raw_frames(self, start: int, stop: int) -> np.ndarray:
        return self._ring.read(start, stop)


class LiveDataSet(DataSet):
    """Declare the acquisition shape up front, then feed frames with
    ``push_frames`` (from any thread) while a UDF run consumes them.

    The runner processes partitions in order, so pushes must be in
    acquisition order; backpressure comes from the bounded ring.
    """

    # the ring is strictly in-order single-consumer: the sharded
    # loop switches to BLOCK-CYCLIC shard assignment with serial
    # in-order reads (udf/base.py _run_loop_sharded), so each mesh
    # super-step consumes the next contiguous slice of the
    # acquisition as it arrives
    supports_concurrent_reads = False

    def __init__(
        self,
        nav_shape: Sequence[int],
        sig_shape: Sequence[int],
        dtype="float32",
        ring_capacity: int = 1024,
        **kwargs,
    ):
        super().__init__(**kwargs)
        nav_shape = tuple(int(x) for x in nav_shape)
        sig_shape = tuple(int(x) for x in sig_shape)
        self._meta = DataSetMeta(
            shape=Shape(nav_shape + sig_shape,
                        sig_dims=len(sig_shape)),
            raw_dtype=np.dtype(dtype),
            sync_offset=0,
        )
        n_total = self._meta.shape.nav.size
        self.ring = FrameRing(
            n_total, sig_shape, dtype, capacity=ring_capacity
        )

    def initialize(self, executor=None) -> "LiveDataSet":
        return self

    def get_max_io_size(self) -> int:
        """Cap the negotiated block depth at half the ring capacity,
        so the producer can stay a block ahead of the reader (the
        ring hard-fails on reads larger than its capacity)."""
        frame_bytes = (
            self._meta.shape.sig.size * self._meta.raw_dtype.itemsize
        )
        return max(1, self.ring._capacity // 2) * frame_bytes

    @property
    def max_inflight_frames(self) -> int:
        """Largest read window a consumer may have outstanding: half
        the ring, so the producer can stay ahead (the sharded loop
        clamps n_dev * depth to this)."""
        return max(1, self.ring._capacity // 2)

    def frames_valid_count(self) -> int:
        """Frames actually pushed so far — the runner clips damage to
        this on early ``finish()`` (frames past it read as zeros)."""
        return self.ring.frames_received

    def push_frames(self, frames: np.ndarray):
        self.ring.push_frames(frames)

    def finish(self):
        self.ring.finish()

    def get_partitions(self) -> Iterator[LivePartition]:
        for idx, (start, stop) in enumerate(self.get_partition_ranges()):
            yield LivePartition(
                self.ring, self.meta, start, stop - start, idx=idx,
            )
