"""Frame-index -> file lookup (reference: libertem/io/dataset/base/
utils.py FileTree — a hand-balanced binary tree).  This engine's read
planner (gen_blocks) maps frame ranges directly, so the lookup here
is API compatibility for fileset-oriented consumers; the
implementation is a sorted-array bisect rather than a node tree —
same ``make``/``search_start`` contract (pinned by the reference's
tests/io/test_io_utils.py), O(log n), no recursion.
"""
from __future__ import annotations

import bisect
from typing import Any, List, Tuple


class FileTree:
    """Interval index over a fileset: ``search_start(frame)`` returns
    ``(index, file)`` of the file whose [start_idx, end_idx) covers
    the frame."""

    def __init__(self, lows: List[int], highs: List[int],
                 values: List[Any]):
        self._lows = lows
        self._highs = highs
        self._values = values

    @classmethod
    def make(cls, files) -> "FileTree":
        files = list(files)
        if not files:
            raise ValueError("empty fileset")
        lows = [f.start_idx for f in files]
        highs = [f.end_idx for f in files]
        for lo, hi in zip(lows, highs):
            if lo >= hi:
                raise ValueError("low should be < high")
        return cls(lows, highs, files)

    def search_start(self, value: int) -> Tuple[int, Any]:
        i = bisect.bisect_right(self._lows, value) - 1
        if i < 0 or value >= self._highs[i]:
            raise KeyError(
                f"no file covers frame {value}"
            )
        return i, self._values[i]

    def __str__(self):
        return "\n".join(
            f"[{lo}, {hi}) -> #{i}"
            for i, (lo, hi) in enumerate(
                zip(self._lows, self._highs)
            )
        )
