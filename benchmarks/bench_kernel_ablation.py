"""Stage-by-stage ablation of the split-moments kernel at the
headline shape (u16, depth 1024, 128x128, 6 masks): each stage adds
one piece of the production kernel so the per-piece cost on real
hardware is the successive difference.

  load      u16 block in, colsum of a cheap int widen out
  cast      + i32 -> f32 convert (the production _cast_f32)
  dec       + bf16 round-trip two-term decomposition
  dot1      + one MXU pass (term0 x 3-term mask concat)
  dot2      + second MXU pass (the full exact product)
  var       + two-pass centered variance (the production kernel)

Anti-DCE: every stage consumes all live values into outputs; blocks
are salted per pass.  Usage: python benchmarks/bench_kernel_ablation.py
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

DEPTH = 1024
N_PIX = 128 * 128
N_BLOCKS = 8
N_MASKS = 6
REPEATS = 40
TD = 64


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import bench
    bench._setup_compile_cache()

    @functools.partial(jax.jit, static_argnames=("stage",))
    def ablated(x, mcat, valid_count, stage: str):
        depth, pixels = x.shape
        nm = N_MASKS
        td = TD
        n_steps = depth // td

        def kernel(valid_ref, x_ref, masks_ref, y_ref, colsum_ref,
                   colvar_ref):
            d = pl.program_id(0)
            valid = valid_ref[0]
            raw = x_ref[:]
            stages = ("load", "cast", "dec", "dot1", "dot2", "var")
            if stage == "load_min":
                # touch only two rows: the DMA still moves the whole
                # block, so this is the pure pallas ingest floor
                local_sum = (
                    raw[0:1, :] + raw[td - 1:td, :]
                ).astype(jnp.int32).astype(jnp.float32)
                y_ref[:] = jnp.zeros((td, nm), jnp.float32)
                local_var = jnp.zeros((1, pixels), jnp.float32)

                @pl.when(d == 0)
                def _():
                    colsum_ref[:] = local_sum
                    colvar_ref[:] = local_var

                @pl.when(d != 0)
                def _():
                    colsum_ref[:] = colsum_ref[:] + local_sum
                return
            if stage == "load_i32":
                # widen-accumulate in one reduce op, no explicit cast
                local_sum = jnp.sum(
                    raw, axis=0, keepdims=True, dtype=jnp.int32
                ).astype(jnp.float32)
                y_ref[:] = jnp.zeros((td, nm), jnp.float32)
                local_var = jnp.zeros((1, pixels), jnp.float32)

                @pl.when(d == 0)
                def _():
                    colsum_ref[:] = local_sum
                    colvar_ref[:] = local_var

                @pl.when(d != 0)
                def _():
                    colsum_ref[:] = colsum_ref[:] + local_sum
                return
            lvl = stages.index(stage)

            if lvl == 0:
                # widen only; sum in i32 then one convert of the
                # (1, P) accumulator — isolates the load+reduce
                xt = raw.astype(jnp.int32)
                local_sum = jnp.sum(
                    xt, axis=0, keepdims=True
                ).astype(jnp.float32)
            else:
                xt = raw.astype(jnp.int32).astype(jnp.float32)
                local_sum = jnp.sum(xt, axis=0, keepdims=True)

            y = jnp.zeros((td, nm), jnp.float32)
            if lvl >= 2:
                x0 = xt.astype(jnp.bfloat16).astype(jnp.float32)
                rx = xt - x0
                terms = [x0, rx]

                def dot(a, b):
                    return jax.lax.dot_general(
                        a, b,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                if lvl == 2:
                    # consume the terms without a dot
                    local_sum = local_sum + jnp.sum(
                        rx, axis=0, keepdims=True
                    )
                if lvl >= 3:
                    acc = dot(terms[0], mcat if False else masks_ref[:])
                    if lvl >= 4:
                        acc = acc + dot(terms[1], masks_ref[:])
                    y = (
                        acc[:, :nm] + acc[:, nm:2 * nm]
                        + acc[:, 2 * nm:]
                    )
            y_ref[:] = y

            if lvl >= 5:
                n1 = jnp.clip(valid - d * td, 0, td).astype(
                    jnp.float32
                )
                n0 = jnp.minimum(d * td, valid).astype(jnp.float32)
                local_mean = local_sum / jnp.maximum(n1, 1.0)

                def _var_full(_):
                    diff = xt - local_mean
                    return jnp.sum(diff * diff, axis=0,
                                   keepdims=True)

                def _var_masked(_):
                    row_ids = (
                        d * td
                        + jax.lax.broadcasted_iota(
                            jnp.int32, (td, 1), 0
                        )
                    )
                    row_valid = (row_ids < valid).astype(
                        jnp.float32
                    )
                    diff = (xt - local_mean) * row_valid
                    return jnp.sum(diff * diff, axis=0,
                                   keepdims=True)

                local_var = jax.lax.cond(
                    (d + 1) * td <= valid, _var_full, _var_masked, 0
                )
            else:
                local_var = jnp.zeros((1, pixels), jnp.float32)

            @pl.when(d == 0)
            def _():
                colsum_ref[:] = local_sum
                colvar_ref[:] = local_var

            @pl.when(d != 0)
            def _():
                if lvl >= 5:
                    prev_sum = colsum_ref[:]
                    prev_var = colvar_ref[:]
                    n1 = jnp.clip(valid - d * td, 0, td).astype(
                        jnp.float32
                    )
                    n0 = jnp.minimum(d * td, valid).astype(
                        jnp.float32
                    )
                    n = jnp.maximum(n0 + n1, 1.0)
                    mean0 = prev_sum / jnp.maximum(n0, 1.0)
                    mean1 = local_sum / jnp.maximum(n1, 1.0)
                    delta = mean1 - mean0
                    corr = delta * delta * (n0 * n1 / n)
                    colvar_ref[:] = prev_var + local_var + corr
                else:
                    colvar_ref[:] = colvar_ref[:] + local_var
                colsum_ref[:] = colsum_ref[:] + local_sum

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((td, pixels), lambda i, *_: (i, 0)),
                pl.BlockSpec(
                    (3 * nm, pixels), lambda i, *_: (0, 0)
                ),
            ],
            out_specs=(
                pl.BlockSpec((td, nm), lambda i, *_: (i, 0)),
                pl.BlockSpec((1, pixels), lambda i, *_: (0, 0)),
                pl.BlockSpec((1, pixels), lambda i, *_: (0, 0)),
            ),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((depth, nm), jnp.float32),
                jax.ShapeDtypeStruct((1, pixels), jnp.float32),
                jax.ShapeDtypeStruct((1, pixels), jnp.float32),
            ),
        )(valid_count.reshape(1).astype(jnp.int32), x, mcat)

    key = jax.random.PRNGKey(0)

    @jax.jit
    def make_blocks(key):
        return jax.random.poisson(
            key, 8.0, (N_BLOCKS, DEPTH, N_PIX)
        ).astype(jnp.uint16)

    blocks = make_blocks(key)
    m = jnp.asarray(
        np.random.default_rng(0).random(
            (N_MASKS, N_PIX)
        ).astype(np.float32)
    )
    m0 = m.astype(jnp.bfloat16).astype(jnp.float32)
    rm = m - m0
    m1 = rm.astype(jnp.bfloat16).astype(jnp.float32)
    mcat = jnp.concatenate([m0, m1, rm - m1], axis=0)
    valid = jnp.int32(DEPTH)

    def run(stage):
        def one_pass(bl, salt):
            def body(carry, blk):
                blk = blk + salt.astype(blk.dtype)
                y, cs, cv = ablated(blk, mcat, valid, stage)
                return carry + y.sum() + cs.sum() + cv.sum(), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), bl)
            return acc

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
        npx = N_BLOCKS * DEPTH * N_PIX * REPEATS
        return {
            'gbps': round(npx * 2 / dt / 1e9, 1),
            'ps_per_px': round(dt / npx * 1e12, 2),
        }

    def run_prod():
        os.environ['LIBERTEM_TPU_MOMENTS_TILE_MB'] = str(
            TD * N_PIX * 4 // (1024 * 1024)
        )
        from libertem_tpu.ops.moments import _fused_moments_pallas

        def one_pass(bl, salt):
            def body(carry, blk):
                blk = blk + salt.astype(blk.dtype)
                y, cs, cv = _fused_moments_pallas(
                    blk, m, valid, precision=None,
                    split_matmul=True,
                )
                return carry + y.sum() + cs.sum() + cv.sum(), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), bl)
            return acc

        @functools.partial(jax.jit, static_argnums=(1,))
        def many(bl, n):
            def body(carry, _):
                salt = carry * jnp.float32(1e-37)
                return one_pass(bl, salt), None

            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0), None, length=n
            )
            return acc

        float(many(blocks, REPEATS))
        t0 = time.perf_counter()
        float(many(blocks, REPEATS))
        dt = time.perf_counter() - t0
        npx = N_BLOCKS * DEPTH * N_PIX * REPEATS
        return {
            'gbps': round(npx * 2 / dt / 1e9, 1),
            'ps_per_px': round(dt / npx * 1e12, 2),
        }

    out = {}
    for stage in ("load_min", "load_i32", "load", "cast", "dec",
                  "dot1", "dot2", "var"):
        try:
            out[stage] = run(stage)
        except Exception as e:
            out[stage] = {'error': str(e).splitlines()[0][:160]}
        print(json.dumps({stage: out[stage]}), flush=True)
    try:
        out['prod'] = run_prod()
    except Exception as e:
        out['prod'] = {'error': str(e).splitlines()[0][:160]}
    print(json.dumps({'prod': out['prod']}), flush=True)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
