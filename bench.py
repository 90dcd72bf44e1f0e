"""Headline benchmark: fused virtual-detector + CoM + statistics
pipeline throughput on one chip.

Measures the steady-state on-device processing rate of the
jit-compiled tile step (cast + 5-column mask-stack MXU matmul
(ApplyMasks BF/ADF + CoM) + Sum/SumSig/StdDev reductions + nav
scatter) over a synthetic 4D-STEM dataset — the TPU equivalent of the
reference's CPU-bound virtual-detector benchmark
(docs/source/performance.rst:12, BASELINE.json configs 1–3).

Baseline: the same math with numpy/BLAS on the host CPU (all cores),
standing in for the reference's single-node CPU path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np


NAV = (256, 64)
SIG = (128, 128)
# uint16 counting-detector data, like the reference's medium_raw
# benchmark fixture (conftest.py:417) — cast to f32 happens in VMEM
DTYPE = np.uint16


def make_udfs():
    from libertem_tpu import masks as mask_lib
    from libertem_tpu.udf import (
        ApplyMasksUDF, CoMUDF, StdDevUDF, SumSigUDF, SumUDF,
    )

    h, w = SIG
    return [
        ApplyMasksUDF(mask_factories=[
            lambda: mask_lib.circular(w / 2, h / 2, w, h, h / 8),
            lambda: mask_lib.ring(w / 2, h / 2, w, h, h / 2.2, h / 3),
        ]),
        CoMUDF.with_params(),
        SumUDF(),
        SumSigUDF(),
        StdDevUDF(),
    ]


def _setup_compile_cache():
    """Persistent XLA compile cache: repeated bench invocations skip
    the 20-200 s compiles (timings always exclude compile anyway)."""
    import os

    import jax

    cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )
    except Exception:
        pass


def bench_tpu(data: np.ndarray, repeats: int = 20):
    """Return (pipeline_bytes_per_sec, roofline_bytes_per_sec).

    ALL ``repeats`` passes run inside ONE jitted lax.fori_loop: one
    dispatch + one sync for the whole measurement, immune to
    host/tunnel jitter.  Two honesty guards against XLA optimizing
    the measured work away: (a) each pass's INPUT blocks carry a
    data dependence on the loop carry (`blk + cast(salt)`, salt ~
    1e-37 so u16 numerics are unchanged but hoisting/CSE across
    passes is illegal), and (b) the carried value consumes one
    element of EVERY output leaf — nav scatters and the fused mask
    matmul included — so no state is dead.  Blocks are generated on
    device (over the development tunnel H2D runs at ~20 MB/s; on
    directly-attached TPUs the streaming pipeline feeds from the
    host instead).
    """
    import jax
    import jax.numpy as jnp

    from libertem_tpu.io.dataset.memory import MemoryDataSet
    from libertem_tpu.udf.base import UDFRunner

    _setup_compile_cache()
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=1
    ).initialize()
    runner = UDFRunner(make_udfs())
    prep = runner._prepare(ds, None, None, None)
    assert prep["fused"] is not None, "bench UDFs must hit fused path"
    depth = prep["scheme"].depth
    n_blocks = max(1, data.reshape((-1,) + SIG).shape[0] // depth)
    itemsize = data.dtype.itemsize
    total_bytes = n_blocks * depth * int(np.prod(SIG)) * itemsize

    @jax.jit
    def make_blocks(key):
        # flat (depth, n_pix) blocks — matching the engine's
        # flat_feed layout for the fused path (the host uploads
        # row-major frames, so flat is what the device receives)
        vals = jax.random.poisson(
            key, 8.0, (n_blocks, depth, int(np.prod(SIG)))
        )
        return vals.astype(DTYPE)

    blocks = make_blocks(jax.random.PRNGKey(0))
    goffs = jnp.arange(n_blocks, dtype=jnp.int32) * depth
    valids = jnp.full((n_blocks,), depth, dtype=jnp.int32)
    coords = jnp.zeros((depth, 2), dtype=jnp.int32)

    # value-range certificate for the split kernel: in production the
    # host feed probes each block's min/max while assembling it
    # (UDFRunner._block_data_terms); bench blocks are device-generated
    # (tunnel H2D is too slow), so probe once up front, outside the
    # timed region — the same information at the same honesty level.
    # Poisson(8) counts sit far below 256, so the certificate holds
    # and the kernel runs ONE exact MXU pass per tile.
    probe = np.asarray(jnp.max(blocks))
    dterms = UDFRunner._block_data_terms(
        prep, np.zeros((1,), DTYPE) + probe
    )

    def one_pass(blocks, goffs, valids, salt):
        state = runner._init_state(prep)
        part_state = runner._init_part_state(prep)

        def body(carry, xs):
            state, part_state = carry
            blk, goff, valid = xs
            # real data dependence on the loop carry; numerically a
            # no-op for u16 input (salt ~ 1e-37 casts to 0)
            blk = blk + salt.astype(blk.dtype)
            state, part_state = runner._step_body(
                prep, state, part_state, blk,
                goff, goff, coords, valid, data_terms=dterms,
            )
            return (state, part_state), None

        (state, part_state), _ = jax.lax.scan(
            body, (state, part_state), (blocks, goffs, valids)
        )
        return state, part_state

    def many_passes(blocks, goffs, valids, n):
        def body(i, salt):
            state, part_state = one_pass(
                blocks, goffs, valids, salt
            )
            # consume every output leaf: nothing is dead code
            leaves = (
                jax.tree.leaves(state) + jax.tree.leaves(part_state)
            )
            tot = jnp.float32(0.0)
            for leaf in leaves:
                tot = tot + leaf.ravel()[0].astype(jnp.float32)
            return tot * 1e-37

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    # Roofline contender: the cheapest possible same-pattern consumer
    # of the same blocks (scan over blocks, u16 -> f32 cast + full
    # reduce).  Measured interleaved with the pipeline because the
    # shared remote chip's effective bandwidth drifts minute-to-minute
    # (observed 35-246 GB/s across sessions); the pipeline/roofline
    # *fraction* is the load-invariant quality metric.
    def roofline_passes(blocks, goffs, valids, n):
        def body(i, salt):
            def scan_body(carry, blk):
                return carry + blk.astype(
                    jnp.float32
                ).sum() * 1e-30, None
            out, _ = jax.lax.scan(scan_body, salt, blocks)
            return out
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    many_jit = jax.jit(many_passes, static_argnames=("n",))
    roof_jit = jax.jit(roofline_passes, static_argnames=("n",))
    float(many_jit(blocks, goffs, valids, n=1))  # compile + warm
    float(roof_jit(blocks, goffs, valids, n=1))
    best = float("inf")
    best_roof = float("inf")
    # 5 interleaved attempts: the shared chip's effective bandwidth
    # drifts minute-to-minute; more attempts raise the chance of
    # catching a representative window
    for _ in range(5):
        t0 = time.perf_counter()
        float(many_jit(blocks, goffs, valids, n=repeats))
        best = min(best, (time.perf_counter() - t0) / repeats)
        t0 = time.perf_counter()
        float(roof_jit(blocks, goffs, valids, n=repeats))
        best_roof = min(
            best_roof, (time.perf_counter() - t0) / repeats
        )
    return total_bytes / best, total_bytes / best_roof


def bench_cpu_baseline(data: np.ndarray) -> float:
    """Same outputs with numpy/BLAS on host CPU; returns bytes/sec."""
    from libertem_tpu import masks as mask_lib

    h, w = SIG
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    mask_stack = np.stack([
        mask_lib.circular(w / 2, h / 2, w, h, h / 8),
        mask_lib.ring(w / 2, h / 2, w, h, h / 2.2, h / 3),
        np.ones(SIG, np.float32),
        y, x,
    ], axis=0)
    operand = mask_stack.reshape(5, -1).T.astype(np.float32)
    flat = data.reshape(-1, h * w).astype(np.float32)
    n = flat.shape[0]
    depth = 512
    t0 = time.perf_counter()
    sum_sig = np.zeros(h * w, np.float32)
    varsum = np.zeros(h * w, np.float32)
    count = 0
    intensities = np.empty((n, 5), np.float32)
    sumsig = np.empty(n, np.float32)
    for off in range(0, n, depth):
        tile = flat[off:off + depth]
        intensities[off:off + depth] = tile @ operand
        sumsig[off:off + depth] = tile.sum(axis=1)
        s = tile.sum(axis=0)
        m = s / tile.shape[0]
        d = tile - m
        c0 = count
        count += tile.shape[0]
        if c0 == 0:
            sum_sig = s
            varsum = (d * d).sum(axis=0)
        else:
            mean0 = sum_sig / c0
            delta = m - mean0
            varsum = (
                varsum + (d * d).sum(axis=0)
                + delta * delta * (c0 * tile.shape[0] / count)
            )
            sum_sig = sum_sig + s
    dt = time.perf_counter() - t0
    return data.nbytes / dt


def main():
    import os

    rng = np.random.default_rng(7)
    data = rng.poisson(8.0, size=NAV + SIG).astype(DTYPE)
    tpu_bps, roof_bps = bench_tpu(data)
    cpu_bps = bench_cpu_baseline(data)
    frames = int(np.prod(NAV))
    frame_bytes = data.nbytes // frames
    ncores = os.cpu_count() or 1
    # the BASELINE bar is ">20x an 8-core dask baseline"; this host
    # has few cores, so extrapolate the measured per-core numpy rate
    # linearly to 8 cores (optimistic for the CPU -> conservative for
    # our ratio)
    cpu8_bps = cpu_bps * max(1.0, 8.0 / ncores)
    print(json.dumps({
        "metric": "virtual-detector+CoM+stats throughput (single chip)",
        "value": round(tpu_bps / 1e9, 3),
        "unit": "GB/s",
        "vs_baseline": round(tpu_bps / cpu8_bps, 3),
        "frames_per_sec": round(tpu_bps / frame_bytes, 1),
        "roofline_gbps": round(roof_bps / 1e9, 3),
        "roofline_fraction": round(tpu_bps / roof_bps, 3),
        "cpu_baseline_gbps": round(cpu_bps / 1e9, 4),
        "cpu_baseline_cores": ncores,
        "cpu_baseline_8core_extrapolated_gbps": round(
            cpu8_bps / 1e9, 4
        ),
    }))


if __name__ == "__main__":
    main()
