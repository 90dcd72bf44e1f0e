"""sync <-> async bridging
(reference: libertem/common/async_utils.py — sync_to_async,
async_generator_eager / SyncGenToQueueThread:184,
run_gen_get_last:95).
"""
from __future__ import annotations

import asyncio
import queue as queue_mod
import threading
from typing import AsyncGenerator, Callable, Generator, TypeVar

T = TypeVar("T")


class MyStopIteration(Exception):
    """Carrier for ``StopIteration`` across a future/coroutine
    boundary (raising StopIteration into a Future is a TypeError;
    reference async_utils.py:18)."""


async def sync_to_async(fn: Callable[..., T], *args, pool=None,
                        **kwargs) -> T:
    loop = asyncio.get_running_loop()

    def _call():
        try:
            return fn(*args, **kwargs)
        except StopIteration as e:
            raise MyStopIteration() from e

    return await loop.run_in_executor(pool, _call)


async def async_generator(gen: Generator, pool=None) -> AsyncGenerator:
    """LAZY sync->async bridge: each ``__anext__`` advances the
    source generator by exactly one item in the pool (reference
    async_utils.py:63).  Use :func:`async_generator_eager` to let the
    producer run ahead instead."""
    loop = asyncio.get_running_loop()

    def _next():
        try:
            return next(gen)
        except StopIteration:
            raise MyStopIteration()

    while True:
        try:
            item = await loop.run_in_executor(pool, _next)
        except MyStopIteration:
            break
        yield item


async def async_generator_eager(
    gen: Generator, pool=None, queue_size: int = 0,
) -> AsyncGenerator:
    """Drain a sync generator in a thread, yield asynchronously; the
    producer runs eagerly ahead — unboundedly by default (reference
    async_utils.py:231 contract), or up to ``queue_size`` items when
    the caller wants backpressure (the engine's partial-result
    streams pass 8)."""
    # a plain thread-safe queue avoids cross-thread asyncio puts
    # entirely: put/get are atomic, so there is no timeout/cancel race
    # that could duplicate or drop an item
    q: queue_mod.Queue = queue_mod.Queue(maxsize=queue_size)
    _SENTINEL = object()
    stop = threading.Event()

    def _put(item) -> bool:
        # bounded puts that notice consumer abandonment: wait with a
        # timeout and re-check `stop`
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue_mod.Full:
                continue
        return False

    def produce():
        try:
            try:
                for item in gen:
                    if not _put(("item", item)):
                        return
                _put(("done", _SENTINEL))
            except Exception as e:
                _put(("error", e))
        finally:
            # close the source generator so its finally blocks run
            # (releases dataset readers etc.) even on abandonment
            try:
                gen.close()
            except Exception:
                pass

    thread = threading.Thread(target=produce, daemon=True)
    thread.start()

    def _get():
        # bounded gets so the worker thread can exit if the consumer
        # abandons the generator mid-wait (to_thread cancellation does
        # not interrupt a blocking q.get)
        while True:
            try:
                return q.get(timeout=0.5)
            except queue_mod.Empty:
                if stop.is_set() or not thread.is_alive():
                    # consumer abandoned, or the producer died
                    # without delivering a sentinel
                    return ("done", _SENTINEL)

    try:
        while True:
            kind, payload = await asyncio.to_thread(_get)
            if kind == "done":
                break
            if kind == "error":
                raise payload
            yield payload
    finally:
        # signal the producer instead of blocking the event loop in
        # join(): the thread notices `stop` within its put timeout
        stop.set()
        thread.join(timeout=0.01)


def run_gen_get_last(gen: Generator[T, None, None]) -> T:
    """Exhaust a generator, return its last item."""
    result = None
    have = False
    for result in gen:
        have = True
    if not have:
        raise RuntimeError("generator produced no items")
    return result


async def run_agen_get_last(gen: AsyncGenerator[T, None]) -> T:
    """Exhaust an async generator, return its last item."""
    result = None
    have = False
    async for result in gen:
        have = True
    if not have:
        raise RuntimeError("async generator produced no items")
    return result
