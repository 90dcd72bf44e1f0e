"""Host block-feed throughput: file -> RangeReader preadv ->
zero-padded Block stream (the path that feeds H2D on directly-attached
TPUs; counterpart of the reference's excluded/io throughput
benchmarks).

Measures the warm-page-cache rate, i.e. the host-side software
ceiling; cold rates are bounded by the storage device instead.
"""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import json
import time

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import libertem_tpu  # noqa: F401  (applies the malloc tuning)
    from libertem_tpu.io.dataset.raw import RawFileDataSet
    from libertem_tpu.io.tiling import Negotiator
    from libertem_tpu.udf import SumUDF

    NAV = (64, 64)
    SIG = (256, 256)
    path = "/tmp/bench_host_feed.raw"
    data = np.random.default_rng(0).integers(
        0, 4096, size=(int(np.prod(NAV)),) + SIG
    ).astype(np.uint16)
    data.tofile(path)
    with open(path, "rb") as f:  # warm the page cache
        while f.read(64 * 1024 * 1024):
            pass
    try:
        ds = RawFileDataSet(
            path=path, dtype="uint16",
            nav_shape=NAV, sig_shape=SIG,
        ).initialize()
        scheme = Negotiator().get_scheme(
            [SumUDF()], ds.shape, np.dtype("float32"),
            max(p.num_frames for p in ds.get_partitions()),
        )
        best = 0.0
        for _ in range(4):
            t0 = time.perf_counter()
            nb = 0
            for part in ds.get_partitions():
                for blk in part.gen_blocks(scheme):
                    nb += blk.data.nbytes
            best = max(best, nb / (time.perf_counter() - t0))
        print(json.dumps({
            "metric": "host block-feed rate (warm cache)",
            "value": round(best / 1e9, 2),
            "unit": "GB/s",
            "depth": scheme.depth,
        }))
    finally:
        os.unlink(path)


if __name__ == "__main__":
    main()
