"""InlineJobExecutor: synchronous single-device execution — the test
backbone and the single-chip production path
(reference: libertem/executor/inline.py:32).
"""
from __future__ import annotations

from typing import Optional

import jax

from .base import JobExecutor


class InlineJobExecutor(JobExecutor):
    def __init__(self, device=None, debug: bool = False):
        if device is None:
            device = jax.devices()[0]
        super().__init__(devices=[device])
        self._debug = debug
