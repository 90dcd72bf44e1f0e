"""Strain mapping end-to-end: sparse correlation peak refinement +
per-frame affine lattice fit (blobfinder workflow, BASELINE config
#4).

Run: python examples/strain_mapping.py
"""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

from libertem_tpu import Context
from libertem_tpu.io.dataset.memory import MemoryDataSet
from libertem_tpu.udf.blobfinder import (
    RadialGradient, SparseCorrelationUDF, fit_lattice,
)
from libertem_tpu.utils.generate import cbed_frame


def main():
    fy = fx = 64
    nav = (8, 8)
    zero = np.array([32.0, 32.0])
    a0 = np.array([16.0, 0.0])
    b0 = np.array([0.0, 16.0])

    # scan with a linear strain ramp along the slow axis
    frames = np.zeros(nav + (fy, fx), dtype=np.float32)
    true_strain = np.zeros(nav)
    for i in range(nav[0]):
        for j in range(nav[1]):
            strain = 0.01 * i / (nav[0] - 1)
            true_strain[i, j] = strain
            frame, _, _ = cbed_frame(
                fy=fy, fx=fx, zero=zero, a=a0 * (1 + strain),
                radius=3, all_equal=True,
            )
            frames[i, j] = frame[0]
    ds = MemoryDataSet(data=frames, sig_dims=2).initialize()
    ctx = Context.make_with("sharded")

    hk = np.array([[0, 0], [1, 0], [0, 1], [-1, 0], [0, -1]])
    peaks = (zero + hk @ np.stack([a0, b0])).astype(int)
    udf = SparseCorrelationUDF(
        match_pattern=RadialGradient(radius=3), peaks=peaks, steps=3,
    )
    res = ctx.run_udf(ds, udf)
    fit = fit_lattice(
        res["refineds"].data, peaks, zero, a0, b0
    )
    err = np.abs(fit["da_rel"] - true_strain)
    print("recovered strain (row means):",
          np.round(fit["da_rel"].mean(axis=1), 4))
    print("true strain      (row means):",
          np.round(true_strain.mean(axis=1), 4))
    print("max abs error:", float(err.max()))


if __name__ == "__main__":
    main()
