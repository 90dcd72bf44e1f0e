"""Within-one-window decomposition of the headline bench: the full
engine pipeline (UDFRunner._step_body), the bare fused kernel, and
the cast+sum read roofline, interleaved on the same chip so tunnel
bandwidth drift cancels.  Splits the e2e gap into engine overhead
vs kernel compute vs ingest bound.

Usage: python benchmarks/bench_e2e_decomp.py
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

NAV = (256, 64)
SIG = (128, 128)
REPEATS = 20


def main():
    import jax
    import jax.numpy as jnp

    import bench
    bench._setup_compile_cache()

    from libertem_tpu.io.dataset.memory import MemoryDataSet
    from libertem_tpu.udf.base import UDFRunner
    from libertem_tpu.ops.moments import _fused_moments_pallas

    rng = np.random.default_rng(7)
    data = rng.poisson(8.0, size=NAV + SIG).astype(np.uint16)
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=1
    ).initialize()
    runner = UDFRunner(bench.make_udfs())
    prep = runner._prepare(ds, None, None, None)
    assert prep["fused"] is not None
    depth = prep["scheme"].depth
    n_pix = int(np.prod(SIG))
    n_blocks = max(1, int(np.prod(NAV)) // depth)
    total_bytes = n_blocks * depth * n_pix * 2

    @jax.jit
    def make_blocks(key):
        return jax.random.poisson(
            key, 8.0, (n_blocks, depth, n_pix)
        ).astype(jnp.uint16)

    blocks = make_blocks(jax.random.PRNGKey(0))
    goffs = jnp.arange(n_blocks, dtype=jnp.int32) * depth
    valids = jnp.full((n_blocks,), depth, dtype=jnp.int32)
    coords = jnp.zeros((depth, 2), dtype=jnp.int32)
    masks_t = jnp.asarray(prep["fused"]["masks_t"])

    def pipeline_many(blocks, goffs, valids, n):
        def body(i, salt):
            state = runner._init_state(prep)
            part_state = runner._init_part_state(prep)

            def sbody(carry, xs):
                state, part_state = carry
                blk, goff, valid = xs
                valid = valid + salt.astype(jnp.int32)
                state, part_state = runner._step_body(
                    prep, state, part_state, blk,
                    goff, goff, coords, valid,
                )
                return (state, part_state), None

            (state, part_state), _ = jax.lax.scan(
                sbody, (state, part_state), (blocks, goffs, valids)
            )
            leaves = (
                jax.tree.leaves(state) + jax.tree.leaves(part_state)
            )
            tot = jnp.float32(0.0)
            for leaf in leaves:
                tot = tot + leaf.ravel()[0].astype(jnp.float32)
            return tot * 1e-37

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def kernel_many(blocks, goffs, valids, n):
        def body(i, salt):
            def sbody(carry, xs):
                blk, valid = xs
                valid = valid + salt.astype(jnp.int32)
                y, cs, cv = _fused_moments_pallas(
                    blk, masks_t, valid, precision=None,
                    split_matmul=True,
                )
                return carry + y.sum() + cs.sum() + cv.sum(), None

            acc, _ = jax.lax.scan(
                sbody, jnp.float32(0.0), (blocks, valids)
            )
            return acc * 1e-37

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def roofline_many(blocks, goffs, valids, n):
        def body(i, salt):
            def sbody(carry, blk):
                return carry + (
                    blk.astype(jnp.float32) * (1 + salt)
                ).sum() * 1e-30, None
            out, _ = jax.lax.scan(sbody, salt, blocks)
            return out * 1e-37
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    jits = {
        'pipeline': jax.jit(
            pipeline_many, static_argnames=("n",)
        ),
        'kernel': jax.jit(kernel_many, static_argnames=("n",)),
        'roofline': jax.jit(
            roofline_many, static_argnames=("n",)
        ),
    }
    for f in jits.values():
        float(f(blocks, goffs, valids, n=1))
    best = {k: float('inf') for k in jits}
    for _ in range(5):
        for k, f in jits.items():
            t0 = time.perf_counter()
            float(f(blocks, goffs, valids, n=REPEATS))
            best[k] = min(
                best[k], (time.perf_counter() - t0) / REPEATS
            )
    out = {
        k: round(total_bytes / v / 1e9, 1) for k, v in best.items()
    }
    out['pipeline_vs_kernel'] = round(
        out['pipeline'] / out['kernel'], 3
    )
    out['kernel_vs_roofline'] = round(
        out['kernel'] / out['roofline'], 3
    )
    print(json.dumps(out))


if __name__ == '__main__':
    main()
