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
        return {
            "result": self.auto_buffer(out),
        }

    def process_frame(self, frame):
        res = self.params.f(frame)
        self.results.result = jnp.asarray(res).reshape(
            self.results.result.shape
        )
