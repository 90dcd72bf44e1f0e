"""AsyncAdapter: wrap a sync executor for async contexts
(reference: libertem/executor/base.py:140 AsyncAdapter).
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable

from ..common.async_utils import sync_to_async


class AsyncAdapter:
    def __init__(self, wrapped, pool=None):
        self._wrapped = wrapped
        self._own_pool = pool is None
        self._pool = pool or ThreadPoolExecutor(max_workers=2)

    @property
    def devices(self):
        return self._wrapped.devices

    @property
    def main_device(self):
        return self._wrapped.main_device

    def ensure_sync(self):
        return self._wrapped

    def ensure_async(self, pool=None):
        return self

    async def run_function(self, fn: Callable, *args, **kwargs):
        return await sync_to_async(
            fn, *args, pool=self._pool, **kwargs
        )

    async def get_available_workers(self):
        return await sync_to_async(
            self._wrapped.get_available_workers, pool=self._pool
        )

    async def close(self):
        await sync_to_async(self._wrapped.close, pool=self._pool)
        if self._own_pool:
            # never shut down a caller-provided (possibly shared)
            # pool — other adapters may still use it
            self._pool.shutdown(wait=False)
