"""HBM roofline + fused-moments variant shootout (real chip).

Measures, with the single-dispatch fori_loop method (tunnel-safe):
  1. pure-stream rooflines: u16 read (bitcast i32 sum), f32 read,
     f32 copy (read+write)
  2. fused-moments variants over identical data:
       xla2   — current default (two-pass variance)
       xla1   — one-pass shifted variance (candidate)
       pallas — hand kernel
       nomask — matmul+colsum only (no variance) upper bound

Usage: python benchmarks/bench_roofline.py [--quick]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


DEPTH = 512
SIG = (128, 128)
N_BLOCKS = 32  # 512 MB u16 total
REPEATS = 8


def timed_loop(jitted, *args, n=REPEATS):
    """best seconds per iteration of a jitted f(args, n) scalar fn."""
    float(jitted(*args, n=1))  # compile+warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jitted(*args, n=n))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


class Contender:
    """Deferred-timing entry for interleaved rounds: the remote chip's
    effective bandwidth drifts minute-to-minute, so all contenders are
    timed round-robin and each reports its best round."""

    def __init__(self, name, jitted, args, nbytes, n=REPEATS):
        self.name = name
        self.jitted = jitted
        self.args = args
        self.nbytes = nbytes
        self.n = n
        self.best = float("inf")

    def warm(self):
        float(self.jitted(*self.args, n=1))

    def round(self):
        t0 = time.perf_counter()
        float(self.jitted(*self.args, n=self.n))
        self.best = min(self.best, (time.perf_counter() - t0) / self.n)

    @property
    def gbps(self):
        return self.nbytes / self.best / 1e9



def _cache():
    import jax
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"),
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

def main():
    _cache()
    import jax
    import jax.numpy as jnp

    quick = "--quick" in sys.argv
    n_blocks = 8 if quick else N_BLOCKS
    pixels = int(np.prod(SIG))

    @jax.jit
    def make_blocks(key):
        return jax.random.poisson(
            key, 8.0, (n_blocks, DEPTH, pixels)
        ).astype(jnp.uint16)

    blocks = make_blocks(jax.random.PRNGKey(0))
    u16_bytes = n_blocks * DEPTH * pixels * 2

    # ---- rooflines: per-block scan (matches the pipeline's access
    # pattern; a whole-array reduce measures reduction codegen, not
    # bandwidth) -----------------------------------------------------
    def scan_loop(per_block):
        def many(blocks, n):
            def body(i, salt):
                def scan_body(carry, blk):
                    return carry + per_block(blk) * 1e-30, None
                out, _ = jax.lax.scan(scan_body, salt, blocks)
                return out
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return jax.jit(many, static_argnames=("n",))

    contenders = [
        Contender(
            "u16 cast+sum roofline",
            scan_loop(lambda blk: blk.astype(jnp.float32).sum()),
            (blocks,), u16_bytes,
        ),
    ]
    f32_blocks = (blocks[: max(1, n_blocks // 2)]).astype(jnp.float32)
    contenders.append(Contender(
        "f32 read roofline",
        scan_loop(lambda blk: blk.sum()),
        (f32_blocks,), f32_blocks.size * 4,
    ))

    # ---- fused-moments variants ------------------------------------
    from libertem_tpu.ops import moments

    n_masks = 6
    rng = np.random.default_rng(1)
    masks_t = jnp.asarray(
        rng.random((n_masks, pixels), dtype=np.float32)
    )
    valid = jnp.int32(DEPTH)

    def variant_loop(step):
        def many(blocks, n):
            def body(i, salt):
                def scan_body(carry, blk):
                    y, cs, cv = step(blk, masks_t, valid)
                    return carry + cv.ravel()[0] * 1e-30, None
                out, _ = jax.lax.scan(scan_body, salt, blocks)
                return out
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return jax.jit(many, static_argnames=("n",))

    variants = [
        ("xla2 (default)",
         lambda b, m, v: moments._fused_moments_xla(b, m, v)),
        ("xla-novar",
         lambda b, m, v: moments._fused_moments_xla(
             b, m, v, compute_var=False)),
        ("xla1 (shifted)",
         lambda b, m, v: moments._fused_moments_xla_onepass(b, m, v)),
        ("pallas",
         lambda b, m, v: moments._fused_moments_pallas(b, m, v)),
    ]
    for name, step in variants:
        try:
            c = Contender(name, variant_loop(step), (blocks,),
                          u16_bytes)
            c.warm()
            contenders.append(c)
        except Exception as e:
            print(f"{name} failed to compile: {e}")

    rounds = 3 if quick else 6
    for c in contenders:
        c.warm()
    for r in range(rounds):
        for c in contenders:
            c.round()
    print(f"\nbest of {rounds} interleaved rounds:")
    for c in contenders:
        print(f"  {c.name:24s} {c.gbps:8.1f} GB/s raw input")


if __name__ == "__main__":
    main()
