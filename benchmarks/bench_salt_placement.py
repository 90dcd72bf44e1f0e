"""Does the anti-DCE input salt (`blk + salt` feeding the opaque
pallas_call) materialize a full salted block copy in HBM?

XLA cannot fuse an elementwise producer INTO a custom call, so the
salted block may cost write+read of the whole block — a handicap the
roofline probe (salt on the carry only) does not pay.  Compare:

  * blk_salt:   blk + salt  -> pallas split kernel   (current bench)
  * mask_salt:  masks_t + salt -> pallas split kernel (tiny operand)
  * no_salt:    un-salted (hoisting-legal — upper bound only)
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

DEPTH = 1024
N_PIX = 128 * 128
N_BLOCKS = 8
N_MASKS = 6
REPEATS = 40


def main():
    import jax
    import jax.numpy as jnp

    import bench
    bench._setup_compile_cache()

    from libertem_tpu.ops.moments import _fused_moments_pallas

    @jax.jit
    def make_blocks(key):
        return jax.random.poisson(
            key, 8.0, (N_BLOCKS, DEPTH, N_PIX)
        ).astype(jnp.uint16)

    blocks = make_blocks(jax.random.PRNGKey(0))
    masks_t = jnp.asarray(
        np.random.default_rng(0).random(
            (N_MASKS, N_PIX)
        ).astype(np.float32)
    )
    valid = jnp.int32(DEPTH)

    def run(mode: str):
        def one_pass(bl, salt):
            def body(carry, blk):
                vc = valid
                if mode in ('blk_salt', 'isalt'):
                    blk = blk + salt.astype(blk.dtype)
                    mt = masks_t
                elif mode == 'mask_salt':
                    mt = masks_t + salt
                elif mode == 'valid_salt':
                    # scalar-operand salt: loop-variant (unhoistable,
                    # un-CSE-able) but ZERO extra HBM traffic — the
                    # honest anti-DCE for an opaque pallas consumer.
                    # salt ~ 1e-37 casts to int32 0 at runtime.
                    vc = valid + salt.astype(jnp.int32)
                    mt = masks_t
                else:
                    mt = masks_t
                y, cs, cv = _fused_moments_pallas(
                    blk, mt, vc, precision=None,
                    split_matmul=True,
                )
                return carry + y.sum() + cs.sum() + cv.sum(), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), bl)
            return acc

        @jax.jit
        def many(bl, n):
            if mode == 'isalt':
                # pass-index-dependent input salt: inputs differ per
                # pass (CSE/hoisting illegal) but do NOT depend on
                # previous outputs — cross-pass DMA overlap stays
                # legal, like production streaming where each block
                # is fresh data.  Outputs still consumed via carry.
                def body(i, acc):
                    salt = i.astype(jnp.float32) * jnp.float32(1e-37)
                    return acc + one_pass(bl, salt)

                return jax.lax.fori_loop(
                    0, n, body, jnp.float32(0.0)
                )

            def body(i, salt):
                return one_pass(bl, salt) * jnp.float32(1e-37)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(many(blocks, 1))
        t0 = time.perf_counter()
        float(many(blocks, REPEATS))
        dt = time.perf_counter() - t0
        total = REPEATS * N_BLOCKS * DEPTH * N_PIX * 2
        return round(total / dt / 1e9, 1)

    out = {}
    for mode in ('blk_salt', 'mask_salt', 'valid_salt', 'no_salt'):
        out[mode] = run(mode)
        print(json.dumps({mode: out[mode]}), flush=True)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
