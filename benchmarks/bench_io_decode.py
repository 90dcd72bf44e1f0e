"""Host decode throughput: MIB bit-unpack kernels (native C++ vs
numpy fallback) and K2IS 12-bit
(counterpart of the reference's excluded/io benchmarks)."""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import json
import time

import numpy as np

import libertem_tpu.native as native


def timeit(fn, *args, repeats=5):
    fn(*args)  # warm
    t0 = time.perf_counter()
    for _ in range(repeats):
        fn(*args)
    return (time.perf_counter() - t0) / repeats


def main():
    n_frames, n_pix = 64, 256 * 256
    rng = np.random.default_rng(0)
    results = {}
    r1 = rng.integers(0, 256, (n_frames, n_pix // 8)).astype(np.uint8)
    r6 = rng.integers(0, 256, (n_frames, n_pix)).astype(np.uint8)
    r12 = rng.integers(
        0, 256, (n_frames, n_pix * 2)
    ).astype(np.uint8)
    k2 = rng.integers(0, 256, n_pix * 3 // 2).astype(np.uint8)

    for use_native in (True, False):
        if use_native and native.get_lib() is None:
            continue
        if not use_native:
            native._lib, native._tried = None, True
        tag = "native" if use_native else "numpy"
        dt = timeit(native.decode_r1, r1, n_pix)
        results[f"r1_{tag}_MBps"] = round(
            n_frames * n_pix / 8 / dt / 1e6, 1
        )
        dt = timeit(native.decode_r6, r6, n_pix)
        results[f"r6_{tag}_MBps"] = round(
            n_frames * n_pix / dt / 1e6, 1
        )
        dt = timeit(native.decode_r12, r12, n_pix)
        results[f"r12_{tag}_MBps"] = round(
            n_frames * n_pix * 2 / dt / 1e6, 1
        )
        dt = timeit(native.decode_uint12_le, k2)
        results[f"k2_uint12_{tag}_MBps"] = round(
            len(k2) / dt / 1e6, 1
        )
        if not use_native:
            native._tried = False
    print(json.dumps(results))


if __name__ == "__main__":
    main()
