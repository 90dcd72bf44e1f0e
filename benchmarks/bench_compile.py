"""Compilation-cost benchmark: trace + XLA compile time of the tile
step (counterpart of the reference's numba compile-time benchmark,
benchmarks/continuous/common)."""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from libertem_tpu.io.dataset.memory import MemoryDataSet
    from libertem_tpu.udf import (
        ApplyMasksUDF, CoMUDF, StdDevUDF, SumSigUDF, SumUDF,
    )
    from libertem_tpu import masks as mask_lib
    from libertem_tpu.udf.base import UDFRunner

    rng = np.random.default_rng(0)
    data = rng.poisson(
        8.0, size=(16, 16, 64, 64)
    ).astype(np.uint16)
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=2
    ).initialize()
    results = {}
    for label, udfs in (
        ("single_sum", lambda: [SumUDF()]),
        ("fused_5udf", lambda: [
            ApplyMasksUDF(mask_factories=[
                lambda: mask_lib.circular(32, 32, 64, 64, 8),
            ]),
            CoMUDF.with_params(), SumUDF(), SumSigUDF(),
            StdDevUDF(),
        ]),
    ):
        runner = UDFRunner(udfs())
        prep = runner._prepare(ds, None, None, None)
        step = runner._make_step(prep)
        state = runner._init_state(prep)
        part = runner._init_part_state(prep)
        depth = prep["scheme"].depth
        blk = jnp.zeros(
            (depth,) + tuple(ds.shape.sig), dtype=ds.raw_dtype
        )
        coords = jnp.zeros((depth, 2), dtype=jnp.int32)
        t0 = time.perf_counter()
        out = step(
            state, part, blk, jnp.int32(0), coords, jnp.int32(depth)
        )
        jax.block_until_ready(out)
        results[f"{label}_first_call_s"] = round(
            time.perf_counter() - t0, 3
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
