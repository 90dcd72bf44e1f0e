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
    stop = threading.Event()

    def _put(item) -> bool:
        # bounded puts that notice consumer abandonment: q.put blocks
        # when full, so wait with a timeout and re-check `stop`
        while not stop.is_set():
            fut = asyncio.run_coroutine_threadsafe(
                q.put(item), loop
            )
            try:
                fut.result(timeout=0.2)
                return True
            except TimeoutError:
                if not fut.cancel():
                    # completed (or failed) between timeout and
                    # cancel — don't re-put a delivered item
                    try:
                        fut.result(timeout=0)
                        return True
                    except Exception:
                        return False
                continue
            except Exception:
                return False
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
    try:
        while True:
            kind, payload = await q.get()
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
