"""Config-#3 benchmark: radial Fourier series mask projection
(complex mask stack, BASELINE.json config 3) + live partial-merge
cadence.

Two device-side variants of the complex projection, anti-DCE
harnessed like bench_fused_variants.py:

* ``complex``  — the block is cast to complex64 and multiplied by the
  complex operand (one complex matmul = 4 real MXU passes, plus an
  8-byte/px materialized complex block copy);
* ``reim``     — x @ (A + iB) = x@A + i·x@B: ONE real matmul against
  the horizontally stacked real operand [Re | Im] on the raw f32
  block, results recombined lazily (identical products, no complex
  block copy).

Partial-merge latency runs the real engine (`run_udf_iter`) over a
small host dataset and reports seconds per partial yield.

Usage: python benchmarks/bench_radial_fourier.py
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

DEPTH = int(os.environ.get("BRF_DEPTH", 512))
SIG = (128, 128)
N_BLOCKS = int(os.environ.get("BRF_BLOCKS", 4))
N_BINS = 8
MAX_ORDER = 8
REPEATS = int(os.environ.get("BRF_REPEATS", 10))


def main():
    import jax
    import jax.numpy as jnp

    import bench
    bench._setup_compile_cache()

    from libertem_tpu.analysis.radialfourier import (
        radial_fourier_masks,
    )

    h, w = SIG
    n_pix = h * w
    stack = radial_fourier_masks(
        SIG, w / 2, h / 2, 2.0, h / 2.2, N_BINS, MAX_ORDER
    ).reshape(-1, n_pix)  # (M, P) complex64
    m = stack.shape[0]
    # complex arrays must not cross the tunnel (H2D/D2H/constants
    # all raise UNIMPLEMENTED on the axon backend) — build the
    # complex operand ON DEVICE from its real planes
    op_re = jnp.asarray(
        np.ascontiguousarray(stack.real.T).astype(np.float32)
    )
    op_im = jnp.asarray(
        np.ascontiguousarray(stack.imag.T).astype(np.float32)
    )
    op_r = jnp.concatenate([op_re, op_im], axis=1)  # (P, 2M) f32

    @jax.jit
    def make_blocks(key):
        return jax.random.poisson(
            key, 8.0, (N_BLOCKS, DEPTH, n_pix)
        ).astype(jnp.uint16)

    blocks = make_blocks(jax.random.PRNGKey(0))
    total = REPEATS * N_BLOCKS * DEPTH * n_pix * 2

    def harness(project):
        def one_pass(bl, salt):
            def body(carry, blk):
                blk = blk + salt.astype(blk.dtype)
                y = project(blk)
                return carry + jnp.abs(y).sum() * 1e-30, None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), bl)
            return acc

        @jax.jit
        def many(bl, n):
            def body(i, salt):
                return one_pass(bl, salt) * jnp.float32(1e-37)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return many

    def project_complex(blk):
        # the complex operand is built INSIDE the trace from its f32
        # planes: a complex closure constant would need a D2H fetch
        # at lowering, which this backend cannot do
        op_c = jax.lax.complex(op_re, op_im)
        return jnp.matmul(
            blk.astype(jnp.complex64), op_c,
            preferred_element_type=jnp.complex64,
        )

    def project_reim(blk):
        y = jnp.matmul(
            blk.astype(jnp.float32), op_r,
            preferred_element_type=jnp.float32,
        )
        return jax.lax.complex(y[:, :m], y[:, m:])

    out = {}
    runs = {
        "complex": harness(project_complex),
        "reim": harness(project_reim),
    }
    for tag, many in runs.items():
        t0 = time.perf_counter()
        float(many(blocks, 1))
        print(f"# compiled {tag} in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
    for _ in range(3):  # interleaved best-of
        for tag, many in runs.items():
            t0 = time.perf_counter()
            float(many(blocks, REPEATS))
            gbps = total / (time.perf_counter() - t0) / 1e9
            out[tag] = max(out.get(tag, 0.0), round(gbps, 1))
        print(f"# {json.dumps(out)}", flush=True)

    # numerical parity of the two variants (compared on device —
    # complex D2H is unavailable over the tunnel)
    rel = float(jax.jit(
        lambda b: jnp.max(jnp.abs(
            project_complex(b) - project_reim(b)
        )) / jnp.maximum(
            jnp.max(jnp.abs(project_complex(b))), 1e-30
        )
    )(blocks[0]))
    out["reim_vs_complex_rel_err"] = rel

    # live partial-merge cadence through the real engine: small host
    # dataset (tunnel H2D is slow; the cadence, not the rate, is the
    # point here)
    from libertem_tpu.api import Context
    from libertem_tpu.io.dataset.memory import MemoryDataSet

    ctx = Context()
    data = np.random.default_rng(0).poisson(
        8.0, (8, 8, 64, 64)
    ).astype(np.uint16)
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=4
    ).initialize()
    analysis = ctx.create_radial_fourier_analysis(
        dataset=ds, cx=32, cy=32, ri=2.0, ro=28.0,
        n_bins=N_BINS, max_order=MAX_ORDER,
    )
    udf = analysis.get_udf()
    t0 = time.perf_counter()
    stamps = []
    for _ in ctx.run_udf_iter(ds, udf):
        stamps.append(time.perf_counter() - t0)
    out["partial_merge_latency_s"] = round(
        float(np.diff([0.0] + stamps).mean()), 4
    )
    out["n_partials"] = len(stamps)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
