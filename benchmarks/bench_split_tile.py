"""Tile-budget x colsum-strategy sweep for the VMEM split-matmul
kernel, at the headline bench shape (depth 1024, 128x128 u16,
6 masks).  Found the round-3 VMEM OOM: the MXU-colsum + cond-variance
additions pushed the 4 MB-budget tile (td=64) to a 17.01M scoped
VMEM stack vs the 16M limit.  Anti-DCE harnessed like
bench_fused_variants.py.

Usage: python benchmarks/bench_split_tile.py [budgets_mb ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

DEPTH = int(os.environ.get('BT_DEPTH', 1024))
N_PIX = 128 * 128
N_BLOCKS = int(os.environ.get('BT_BLOCKS', 8))
N_MASKS = 6
REPEATS = int(os.environ.get('BT_REPEATS', 40))
# BT_DATA_TERMS=1 sweeps the value-specialized one-term path
# (Poisson(8) fixture values are < 256, so the certificate holds)
DATA_TERMS = (
    int(os.environ['BT_DATA_TERMS'])
    if os.environ.get('BT_DATA_TERMS') else None
)


def main():
    import jax
    import jax.numpy as jnp

    import bench
    bench._setup_compile_cache()

    from libertem_tpu.ops import moments

    key = jax.random.PRNGKey(0)

    @jax.jit
    def make_blocks(key):
        return jax.random.poisson(
            key, 8.0, (N_BLOCKS, DEPTH, N_PIX)
        ).astype(jnp.uint16)

    blocks = make_blocks(key)
    masks_t = jnp.asarray(
        np.random.default_rng(0).random(
            (N_MASKS, N_PIX)
        ).astype(np.float32)
    )
    valid = jnp.int32(DEPTH)

    def run(budget_mb: int, mxu_colsum: bool):
        os.environ['LIBERTEM_TPU_MOMENTS_TILE_MB'] = str(budget_mb)

        def one_pass(bl, salt):
            def body(carry, blk):
                blk = blk + salt.astype(blk.dtype)
                y, cs, cv = moments._fused_moments_pallas(
                    blk, masks_t, valid, precision=None,
                    split_matmul=True, mxu_colsum=mxu_colsum,
                    data_terms=DATA_TERMS,
                )
                return carry + y.sum() + cs.sum() + cv.sum(), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), bl)
            return acc

        @jax.jit
        def many(bl, n):
            def body(i, salt):
                return one_pass(bl, salt) * jnp.float32(1e-37)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        try:
            float(many(blocks, 1))
        except Exception as e:
            return {'error': str(e).splitlines()[0][:160]}
        t0 = time.perf_counter()
        float(many(blocks, REPEATS))
        dt = time.perf_counter() - t0
        total = REPEATS * N_BLOCKS * DEPTH * N_PIX * 2
        return {'gbps': round(total / dt / 1e9, 1)}

    budgets = [int(b) for b in sys.argv[1:]] or [2, 3, 4]
    out = {}
    for b in budgets:
        for mxu in (True, False):
            tag = f'budget{b}MB_mxu{int(mxu)}'
            out[tag] = run(b, mxu)
            print(json.dumps({tag: out[tag]}), flush=True)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
