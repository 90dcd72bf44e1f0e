"""Cost isolation for the VMEM split-matmul kernel at the headline
shape: which term costs what?

Cells (all anti-DCE harnessed like bench_fused_variants.py):

  u16/split/var      the production default (headline path)
  u16/split/novar    minus the two-pass variance
  u8/split/var       one data term instead of two (u8 is bf16-exact)
  u8/split/novar
  u16/native/var     precision=None single-pass (accuracy ~1e-4)
  u16/native/novar
  f32/split/var      three data terms (corrected-data path)

Throughput is input GB/s (so u8 cells move half the bytes of u16 at
equal pixel rate — compare px/s across dtypes, GB/s within).

Usage: python benchmarks/bench_split_costs.py
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

DEPTH = int(os.environ.get('BC_DEPTH', 1024))
N_PIX = 128 * 128
N_BLOCKS = int(os.environ.get('BC_BLOCKS', 8))
N_MASKS = 6
REPEATS = int(os.environ.get('BC_REPEATS', 40))


def main():
    import jax
    import jax.numpy as jnp

    import bench
    bench._setup_compile_cache()

    from libertem_tpu.ops.moments import _fused_moments_pallas

    key = jax.random.PRNGKey(0)

    @jax.jit
    def make_u16(key):
        return jax.random.poisson(
            key, 8.0, (N_BLOCKS, DEPTH, N_PIX)
        ).astype(jnp.uint16)

    blocks_u16 = make_u16(key)
    blocks_u8 = (blocks_u16 & 0xFF).astype(jnp.uint8)
    blocks_f32 = blocks_u16.astype(jnp.float32) * jnp.float32(1.7)
    masks_t = jnp.asarray(
        np.random.default_rng(0).random(
            (N_MASKS, N_PIX)
        ).astype(np.float32)
    )
    valid = jnp.int32(DEPTH)

    def run(blocks, split, compute_var):
        itemsize = np.dtype(blocks.dtype).itemsize

        def one_pass(bl, salt):
            def body(carry, blk):
                blk = blk + salt.astype(blk.dtype)
                y, cs, cv = _fused_moments_pallas(
                    blk, masks_t, valid, precision=None,
                    split_matmul=split, compute_var=compute_var,
                )
                return carry + y.sum() + cs.sum() + cv.sum(), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), bl)
            return acc

        import functools

        @functools.partial(jax.jit, static_argnums=(1,))
        def many(bl, n):
            def body(carry, _):
                salt = carry * jnp.float32(1e-37)
                return one_pass(bl, salt), None

            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0), None, length=n
            )
            return acc

        float(many(blocks, REPEATS))  # compile
        t0 = time.perf_counter()
        float(many(blocks, REPEATS))
        dt = time.perf_counter() - t0
        nbytes = N_BLOCKS * DEPTH * N_PIX * itemsize * REPEATS
        npx = N_BLOCKS * DEPTH * N_PIX * REPEATS
        return {
            'gbps': round(nbytes / dt / 1e9, 1),
            'gpx_s': round(npx / dt / 1e9, 1),
        }

    out = {}
    cells = [
        ('u16/split/var', blocks_u16, True, True),
        ('u16/split/novar', blocks_u16, True, False),
        ('u8/split/var', blocks_u8, True, True),
        ('u8/split/novar', blocks_u8, True, False),
        ('u16/native/var', blocks_u16, False, True),
        ('u16/native/novar', blocks_u16, False, False),
        ('f32/split/var', blocks_f32, True, True),
    ]
    for name, bl, split, var in cells:
        try:
            out[name] = run(bl, split, var)
        except Exception as e:
            out[name] = {'error': str(e).splitlines()[0][:160]}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
