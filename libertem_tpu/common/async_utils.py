"""sync <-> async bridging
(reference: libertem/common/async_utils.py — sync_to_async,
async_generator_eager / SyncGenToQueueThread:184,
run_gen_get_last:95).
"""
from __future__ import annotations

import asyncio
import functools
import queue as queue_mod
import threading
from typing import AsyncGenerator, Callable, Generator, TypeVar

T = TypeVar("T")


async def sync_to_async(fn: Callable[..., T], *args, pool=None,
                        **kwargs) -> T:
    loop = asyncio.get_running_loop()
    return await loop.run_in_executor(
        pool, functools.partial(fn, *args, **kwargs)
    )


async def async_generator_eager(
    gen: Generator, pool=None, queue_size: int = 8,
) -> AsyncGenerator:
    """Drain a sync generator in a thread, yield asynchronously; the
    producer runs eagerly ahead up to ``queue_size`` items."""
    loop = asyncio.get_running_loop()
    q: asyncio.Queue = asyncio.Queue(maxsize=queue_size)
    _SENTINEL = object()

    def produce():
        try:
            for item in gen:
                fut = asyncio.run_coroutine_threadsafe(
                    q.put(("item", item)), loop
                )
                fut.result()
            asyncio.run_coroutine_threadsafe(
                q.put(("done", _SENTINEL)), loop
            ).result()
        except Exception as e:
            asyncio.run_coroutine_threadsafe(
                q.put(("error", e)), loop
            ).result()

    thread = threading.Thread(target=produce, daemon=True)
    thread.start()
    try:
        while True:
            kind, payload = await q.get()
            if kind == "done":
                break
            if kind == "error":
                raise payload
            yield payload
    finally:
        thread.join(timeout=5)


def run_gen_get_last(gen: Generator[T, None, None]) -> T:
    """Exhaust a generator, return its last item."""
    result = None
    have = False
    for result in gen:
        have = True
    if not have:
        raise RuntimeError("generator produced no items")
    return result
