"""Dense vs block-compacted mask stacks on the real chip.

Scenario: blobfinder/cluster-style feature extraction — hundreds of
tiny templates clustered near the diffraction-pattern center on
256x256 u16 frames.  The dense matmul pays 2*P*M flops/frame and
streams an (M, P) operand; the compacted path gathers the union
support (static indices) and runs a small MXU matmul.

Interleaved best-of rounds (the shared chip's bandwidth drifts).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

DEPTH = 256
SIG = (256, 256)
N_BLOCKS = 4
N_MASKS = 512
REPEATS = 4



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

    from libertem_tpu import masks as mask_lib
    from libertem_tpu.ops.sparse_masks import (
        gather_blocks, plan_compaction,
    )

    h, w = SIG
    pixels = h * w
    rng = np.random.default_rng(0)
    # peaks clustered in the central third of the pattern
    py = rng.integers(h // 3, 2 * h // 3, N_MASKS)
    px = rng.integers(w // 3, 2 * w // 3, N_MASKS)
    stack = mask_lib.sparse_template_multi_stack(
        mask_index=np.arange(N_MASKS),
        offsetY=py - 2, offsetX=px - 2,
        template=np.ones((5, 5), np.float32),
        imageSizeY=h, imageSizeX=w,
    )
    stack = np.asarray(stack, dtype=np.float32).reshape(N_MASKS, -1)
    plan = plan_compaction(stack)
    assert plan is not None, "expected compactable stack"
    print(f"masks: {N_MASKS}, union support fill: {plan['fill']:.3f} "
          f"({plan['support'].size} of {plan['n_blocks']} blocks)")

    @jax.jit
    def make(key):
        return jax.random.poisson(
            key, 8.0, (N_BLOCKS, DEPTH, pixels)
        ).astype(jnp.uint16)

    blocks = make(jax.random.PRNGKey(0))
    nbytes = blocks.size * 2

    dense_op = jnp.asarray(stack.T)           # (P, M)
    comp_op = jnp.asarray(plan["operand_c"])  # (S*B, M)
    support = plan["support"]

    def dense_step(blk):
        flat = blk.astype(jnp.float32)
        return jnp.matmul(
            flat, dense_op, preferred_element_type=jnp.float32
        ).sum()

    def compact_step(blk):
        flat = gather_blocks(blk, support).astype(jnp.float32)
        return jnp.matmul(
            flat, comp_op, preferred_element_type=jnp.float32
        ).sum()

    def loop(step):
        def many(blocks, n):
            def body(i, salt):
                def scan_body(carry, blk):
                    return carry + step(blk) * 1e-30, None
                out, _ = jax.lax.scan(scan_body, salt, blocks)
                return out
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return jax.jit(many, static_argnames=("n",))

    contenders = [
        ("dense matmul", loop(dense_step)),
        ("block-compacted", loop(compact_step)),
    ]
    best = {}
    for name, jitted in contenders:
        t0 = time.perf_counter()
        float(jitted(blocks, n=1))
        print(f"{name}: warm {time.perf_counter()-t0:.1f}s")
        best[name] = float("inf")
    for _ in range(3):
        for name, jitted in contenders:
            t0 = time.perf_counter()
            float(jitted(blocks, n=REPEATS))
            best[name] = min(
                best[name], (time.perf_counter() - t0) / REPEATS
            )
    for name, dt in best.items():
        print(f"{name:18s} {nbytes / dt / 1e9:8.1f} GB/s raw-u16 "
              f"({nbytes / 2 / dt / 1e9:6.1f} Gpx/s)")
    print(f"speedup: {best['dense matmul'] / best['block-compacted']:.2f}x")


if __name__ == "__main__":
    main()
