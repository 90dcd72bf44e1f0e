"""End-to-end example: virtual detectors + CoM + statistics over a
synthetic 4D-STEM dataset, single pass, with live partial results.

Run: python examples/virtual_detector.py
"""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

from libertem_tpu import Context, masks
from libertem_tpu.io.dataset.memory import MemoryDataSet
from libertem_tpu.udf import (
    ApplyMasksUDF, CoMUDF, StdDevUDF, SumSigUDF, SumUDF,
)
from libertem_tpu.utils.generate import cbed_frame


def make_dataset(nav=(32, 32), sig=(64, 64)):
    """Simulated CBED scan with a wobbling zero beam."""
    rng = np.random.default_rng(0)
    frames = np.zeros(nav + sig, dtype=np.float32)
    for i in range(nav[0]):
        for j in range(nav[1]):
            zy = sig[0] // 2 + (i - nav[0] // 2) * 0.1
            zx = sig[1] // 2 + (j - nav[1] // 2) * 0.1
            frame, _, _ = cbed_frame(
                fy=sig[0], fx=sig[1], zero=(zy, zx),
                a=(sig[0] // 4, 0), radius=3,
            )
            frames[i, j] = frame[0] + rng.poisson(
                0.5, sig
            ).astype(np.float32)
    return MemoryDataSet(data=frames, sig_dims=2).initialize()


def main():
    ctx = Context.make_with("sharded")
    ds = make_dataset()
    h, w = tuple(ds.shape.sig)

    udfs = [
        ApplyMasksUDF(mask_factories=[
            lambda: masks.circular(w / 2, h / 2, w, h, h / 8),
            lambda: masks.ring(w / 2, h / 2, w, h, h / 2.2, h / 4),
        ]),
        CoMUDF.with_params(cy=h / 2, cx=w / 2, r=h / 4),
        SumUDF(),
        SumSigUDF(),
        StdDevUDF(),
    ]
    print("running", len(udfs), "UDFs in one pass over",
          ds.shape, "...")
    for partial in ctx.run_udf_iter(ds, udfs):
        done = partial.damage.data.sum()
        print(f"  merged {done} / {ds.shape.nav.size} frames")
    bf = partial.buffers[0]["intensity"].data[..., 0]
    com_mag = partial.buffers[1]["magnitude"].data
    print("bright field:", bf.shape, "mean", float(bf.mean()))
    print("CoM magnitude:", com_mag.shape, "max",
          float(np.nanmax(com_mag)))
    print("std image:", partial.buffers[4]["std"].data.shape)


if __name__ == "__main__":
    main()
