"""AutoUDF: wrap an arbitrary jax-traceable f(frame) -> ndarray
(reference: libertem/udf/auto.py:11 — backs Context.map).

The result buffer is auto-shaped by abstract-evaluating ``f`` on a
mock frame (no FLOPs spent, unlike the reference which runs f for
real on a fake frame, auto.py:42).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import UDF


class AutoUDF(UDF):
    def __init__(self, f=None, monitor=False):
        super().__init__(f=f, monitor=monitor)

    def auto_buffer(self, var):
        return self.buffer(
            kind="nav", extra_shape=var.shape, dtype=var.dtype
        )

    def get_result_buffers(self):
        mock = jax.ShapeDtypeStruct(
            tuple(self.meta.dataset_shape.sig), self.meta.input_dtype
        )
        out = jax.eval_shape(self.params.f, mock)
        bufs = {
            "result": self.auto_buffer(out),
        }
        if self.params.monitor:
            # reference auto.py: a 'single' buffer holding the most
            # recently processed frame's result, for live monitoring
            bufs["monitor"] = self.buffer(
                kind="single", extra_shape=tuple(out.shape),
                dtype=out.dtype,
            )
        return bufs

    def process_frame(self, frame):
        res = jnp.asarray(self.params.f(frame))
        self.results.result = res.reshape(
            self.results.result.shape
        )
        if self.params.monitor:
            self.results.monitor = res.reshape(
                self.results.monitor.shape
            )

    def merge(self, dest, src):
        # only the monitor ('single') buffer reaches merge; later
        # partitions win — "some recent frame", like the reference
        if "monitor" in src:
            dest.monitor = src.monitor
