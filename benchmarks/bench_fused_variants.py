"""Honest apples-to-apples comparison of the fused-moments kernel
variants on the real chip.

Every variant runs inside one jitted fori_loop with (a) the input
block salted by the loop carry (hoisting/CSE across passes illegal,
numerically a no-op for u16) and (b) every output leaf consumed into
the carry (nothing is dead code) — the guards bench.py gained after
the DCE finding.  Prints one JSON line with GB/s of raw u16 input
per variant.
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


DEPTH = int(os.environ.get('BV_DEPTH', 512))
SIG = (128, 128)
N_BLOCKS = int(os.environ.get('BV_BLOCKS', 16))
N_MASKS = 5
REPEATS = 60


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    ))
    import bench
    bench._setup_compile_cache()

    from libertem_tpu.ops.moments import (
        _fused_moments_pallas,
        _fused_moments_xla,
        _fused_moments_xla_onepass,
    )

    n_pix = int(np.prod(SIG))
    key = jax.random.PRNGKey(0)

    @jax.jit
    def make_blocks(key):
        return jax.random.poisson(
            key, 8.0, (N_BLOCKS, DEPTH, n_pix)
        ).astype(jnp.uint16)

    blocks = make_blocks(key)
    # CLAUDE.md: mask operands are TRANSPOSED (M, P)
    masks_t = jnp.asarray(
        np.random.default_rng(0).random(
            (N_MASKS, n_pix)
        ).astype(np.float32)
    )
    valid = jnp.int32(DEPTH)

    blocks_f32 = (blocks.astype(jnp.float32) - 7.5) * 1.013

    def run_variant(fn, itemsize=2, use_blocks=None):
        bl_in = blocks if use_blocks is None else use_blocks

        def one_pass(blocks, salt):
            def body(carry, blk):
                blk = blk + salt.astype(blk.dtype)
                y, cs, cv = fn(blk)
                # consume via FULL reductions: a single element of a
                # freshly produced per-block output lets XLA compute
                # just that element (partial DCE of the matmul)
                acc = carry + y.sum() + cs.sum() + cv.sum()
                return acc, None

            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0), blocks
            )
            return acc

        @jax.jit
        def many(bl, n):
            # blocks as an ARGUMENT — a closed-over device array
            # would bake into the program as a literal constant
            # (multi-hundred-MB compile payloads)
            def body(i, salt):
                return one_pass(bl, salt) * jnp.float32(1e-37)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        # warm up / compile
        print("compiling...", flush=True)
        float(many(bl_in, 1))
        print("compiled, timing...", flush=True)
        t0 = time.perf_counter()
        float(many(bl_in, REPEATS))
        dt = time.perf_counter() - t0
        total = REPEATS * N_BLOCKS * DEPTH * n_pix * itemsize
        return total / dt

    # masks argument is closed over; variants:
    def xla2(blk):
        return _fused_moments_xla(blk, masks_t, valid)

    def xla1(blk):
        return _fused_moments_xla_onepass(blk, masks_t, valid)

    def xla_novar(blk):
        return _fused_moments_xla(
            blk, masks_t, valid, compute_var=False
        )

    def pallas(blk):
        from libertem_tpu.ops.moments import _matmul_precision
        # honor the precision env var like the XLA variants do —
        # otherwise the comparison silently mixes precision classes
        return _fused_moments_pallas(
            blk, masks_t, valid, precision=_matmul_precision()
        )

    def stats_only(blk):
        xt = blk.astype(jnp.float32)
        cs = xt.sum(axis=0)
        n = jnp.float32(DEPTH)
        mean = cs / n
        diff = xt - mean
        cv = (diff * diff).sum(axis=0)
        return cs[:1], cs, cv

    def read_only(blk):
        s = blk.astype(jnp.float32).sum(axis=0)
        return s[:1], s, s

    def read_raw(blk):
        # pure-bandwidth probe: no u16->f32 widening relayout — u16
        # pairs bitcast to i32 words, integer sum
        w = jax.lax.bitcast_convert_type(
            blk.reshape(blk.shape[0], -1, 2), jnp.int32
        )
        s = w.sum(axis=0).astype(jnp.float32)
        return s[:1], s, s

    def pallas_split(blk):
        return _fused_moments_pallas(
            blk, masks_t, valid, precision=None, split_matmul=True
        )

    def pallas_split_novar(blk):
        return _fused_moments_pallas(
            blk, masks_t, valid, precision=None, split_matmul=True,
            compute_var=False,
        )

    def pallas_native(blk):
        return _fused_moments_pallas(
            blk, masks_t, valid, precision=None, split_matmul=False
        )

    def xla2_f32(blk):
        import jax.lax
        return _fused_moments_xla(
            blk, masks_t, valid, precision=jax.lax.Precision.HIGHEST
        )

    # (name, fn, itemsize, blocks) — *_f32 variants time the
    # corrected-data path: f32 blocks, f32 bytes in the denominator
    all_variants = {
        "read_only_sum": (read_only, 2, None),
        "read_raw": (read_raw, 2, None),
        "xla_twopass": (xla2, 2, None),
        "xla_onepass": (xla1, 2, None),
        "xla_masks_only": (xla_novar, 2, None),
        "stats_only": (stats_only, 2, None),
        "pallas": (pallas, 2, None),
        "pallas_split": (pallas_split, 2, None),
        "pallas_split_novar": (pallas_split_novar, 2, None),
        "pallas_native": (pallas_native, 2, None),
        "pallas_split_f32": (pallas_split, 4, blocks_f32),
        "xla_twopass_f32": (xla2_f32, 4, blocks_f32),
    }
    wanted = sys.argv[1:] or list(all_variants)
    out = {}
    for name in wanted:
        fn, itemsize, bl = all_variants[name]
        try:
            bps = run_variant(fn, itemsize=itemsize, use_blocks=bl)
            out[name + "_gbps"] = round(bps / 1e9, 2)
        except Exception as e:
            out[name + "_error"] = str(e)[:120]
        # print incrementally: tunnel hangs must not lose results
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
