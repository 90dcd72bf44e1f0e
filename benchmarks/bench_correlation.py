"""Correlation peak-finding throughput (BASELINE config #4):
FullFrameCorrelationUDF — batched FFT -> spectrum multiply -> IFFT ->
argmax + subpixel refine, all on device."""
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

from libertem_tpu.io.dataset.memory import MemoryDataSet
from libertem_tpu.udf.base import UDFRunner
from libertem_tpu.udf.blobfinder import (
    FullFrameCorrelationUDF, RadialGradient,
)

NAV = (64, 64)
SIG = (128, 128)


def main():
    rng = np.random.default_rng(0)
    data = rng.poisson(8.0, size=NAV + SIG).astype(np.float32)
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=1
    ).initialize()
    runner = UDFRunner([
        FullFrameCorrelationUDF(
            match_pattern=RadialGradient(radius=4)
        ),
    ])
    prep = runner._prepare(ds, None, None, None)
    depth = prep["scheme"].depth
    n_blocks = max(1, data.reshape((-1,) + SIG).shape[0] // depth)
    total = n_blocks * depth * int(np.prod(SIG)) * 4
    blocks = jax.random.poisson(
        jax.random.PRNGKey(0), 8.0, (n_blocks, depth) + SIG
    ).astype(jnp.float32)
    goffs = jnp.arange(n_blocks, dtype=jnp.int32) * depth
    valids = jnp.full((n_blocks,), depth, dtype=jnp.int32)
    coords = jnp.zeros((depth, 2), dtype=jnp.int32)

    def one_pass(blocks, goffs, valids, salt):
        state = runner._init_state(prep)
        part = runner._init_part_state(prep)
        state = jax.tree.map(lambda x: x + salt, state)

        def body(carry, xs):
            st, pt = carry
            blk, goff, valid = xs
            st, pt = runner._step_body(
                prep, st, pt, blk, goff, goff, coords, valid
            )
            return (st, pt), None

        (state, part), _ = jax.lax.scan(
            body, (state, part), (blocks, goffs, valids)
        )
        return state

    def many(blocks, goffs, valids, n):
        def body(i, salt):
            st = one_pass(blocks, goffs, valids, salt)
            return jax.tree.leaves(st)[0].ravel()[0] * 1e-37

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    mj = jax.jit(many, static_argnames=("n",))
    float(mj(blocks, goffs, valids, n=5))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(mj(blocks, goffs, valids, n=5))
        best = min(best, (time.perf_counter() - t0) / 5)
    frames = n_blocks * depth
    print(json.dumps({
        "correlation_GBps": round(total / best / 1e9, 1),
        "correlation_frames_per_sec": round(frames / best, 1),
    }))


if __name__ == "__main__":
    main()
