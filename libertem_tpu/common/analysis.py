"""AnalysisResult / AnalysisResultSet
(reference: libertem/common/analysis.py:10,71).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import numpy as np


class AnalysisResult:
    """One named result channel: raw data + visualized thumbnail."""

    def __init__(
        self,
        raw_data: np.ndarray,
        visualized: Union[np.ndarray, Callable, None],
        title: str,
        desc: str,
        key: str,
        include_in_download: bool = True,
    ):
        self.raw_data = raw_data
        self._visualized = visualized
        self.title = title
        self.desc = desc
        self.key = key
        self.include_in_download = include_in_download

    @property
    def visualized(self):
        if callable(self._visualized):
            self._visualized = self._visualized()
        return self._visualized

    def __array__(self, dtype=None, copy=None):
        arr = np.asarray(self.raw_data)
        if dtype is not None:
            arr = arr.astype(dtype)
        return arr

    def __repr__(self):
        return (
            f"<AnalysisResult: {self.key} "
            f"{np.asarray(self.raw_data).shape}>"
        )


class AnalysisResultSet:
    """Sequence of AnalysisResults with attribute and index access."""

    def __init__(self, results: Sequence[AnalysisResult], raw_results=None):
        self._results = list(results)
        self.raw_results = raw_results

    def __getattr__(self, key):
        for r in object.__getattribute__(self, "_results"):
            if r.key == key:
                return r
        keys = [r.key for r in object.__getattribute__(self, "_results")]
        raise AttributeError(
            "result with key '{}' not found, have: {}".format(
                key, ", ".join(keys)
            )
        )

    def __getitem__(self, k):
        if isinstance(k, str):
            return getattr(self, k)
        return self._results[k]

    def __len__(self):
        return len(self._results)

    def __iter__(self):
        return iter(self._results)

    def keys(self):
        return [r.key for r in self._results]

    def __repr__(self):
        keys = ", ".join(r.key for r in self._results)
        return f"<AnalysisResultSet: [{keys}]>"
