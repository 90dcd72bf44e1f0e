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


NAV = (64, 64)
SIG = (128, 128)
DTYPE = np.float32


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


def bench_tpu(data: np.ndarray, repeats: int = 3) -> float:
    """Return steady-state bytes/sec of the fused tile step."""
    import jax
    import jax.numpy as jnp

    from libertem_tpu.io.dataset.memory import MemoryDataSet
    from libertem_tpu.udf.base import UDFRunner

    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=1
    ).initialize()
    runner = UDFRunner(make_udfs())
    prep = runner._prepare(ds, None, None, None)
    scheme = prep["scheme"]
    step = runner._make_step(prep)
    device = prep["device"]

    # preload all blocks to device HBM: the bench measures the compute
    # path (the streaming pipeline is benchmarked separately)
    blocks = []
    for part in prep["partitions"]:
        for blk in part.gen_blocks(scheme, None):
            blocks.append((
                jax.device_put(blk.data, device),
                jnp.int32(blk.global_offset),
                jax.device_put(blk.coords, device),
                jnp.int32(blk.valid),
            ))

    def one_pass():
        state = runner._init_state(prep)
        part_state = runner._init_part_state(prep)
        for dev_block, goff, coords, valid in blocks:
            state, part_state = step(
                state, part_state, dev_block, goff, coords, valid
            )
        jax.block_until_ready(state)
        return state

    one_pass()  # compile + warm up
    t0 = time.perf_counter()
    for _ in range(repeats):
        one_pass()
    dt = (time.perf_counter() - t0) / repeats
    return data.nbytes / dt


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
    flat = data.reshape(-1, h * w)
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
    rng = np.random.default_rng(7)
    data = rng.normal(loc=1.0, scale=2.0, size=NAV + SIG).astype(DTYPE)
    tpu_bps = bench_tpu(data)
    cpu_bps = bench_cpu_baseline(data)
    frames = int(np.prod(NAV))
    frame_bytes = data.nbytes // frames
    print(json.dumps({
        "metric": "virtual-detector+CoM+stats throughput (single chip)",
        "value": round(tpu_bps / 1e9, 3),
        "unit": "GB/s",
        "vs_baseline": round(tpu_bps / cpu_bps, 3),
        "frames_per_sec": round(tpu_bps / frame_bytes, 1),
        "cpu_baseline_gbps": round(cpu_bps / 1e9, 3),
    }))


if __name__ == "__main__":
    main()
