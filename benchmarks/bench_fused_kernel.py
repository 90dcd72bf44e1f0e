"""Fused moments kernel: Pallas vs XLA vs per-UDF separate passes,
on the default device (counterpart of the reference's mask-dot
micro-benchmarks, benchmarks/continuous/corrections + excluded)."""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from libertem_tpu.ops.moments import (
    _fused_moments_pallas,
    _fused_moments_xla,
)

D, P, M = 2048, 128 * 128, 6
REPEATS = 20


def timed(step):
    step_j = jax.jit(step)
    carry = jnp.float32(0)
    float(step_j(xb, mb, carry))
    t0 = time.perf_counter()
    carry = jnp.float32(0)
    for _ in range(REPEATS):
        carry = step_j(xb, mb, carry)
    float(carry)
    dt = (time.perf_counter() - t0) / REPEATS
    return xb.nbytes / dt / 1e9


def separate(a, m, c):
    m = m + c * 1e-30
    y = jax.lax.dot_general(
        a, m, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ss = a.sum(axis=1)
    cs = a.sum(axis=0)
    mean = cs / D
    d = a - mean
    cv = (d * d).sum(axis=0)
    return y.sum() + ss.sum() + cs.sum() + cv.sum()


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    xb = jax.device_put(
        rng.normal(loc=100, size=(D, P)).astype(np.float32)
    )
    mb = jax.device_put(rng.normal(size=(M, P)).astype(np.float32))
    results = {
        "separate_passes_GBps": round(timed(separate), 1),
        "xla_fused_GBps": round(timed(
            lambda a, m, c: sum(o.sum() for o in _fused_moments_xla(
                a, m + c * 1e-30, jnp.int32(D)
            ))
        ), 1),
    }
    if jax.default_backend() in ("tpu", "axon"):
        results["pallas_fused_GBps"] = round(timed(
            lambda a, m, c: sum(
                o.sum() for o in _fused_moments_pallas(
                    a, m + c * 1e-30, jnp.int32(D)
                )
            )
        ), 1)
    print(json.dumps(results))
