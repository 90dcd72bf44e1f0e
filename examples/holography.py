"""Off-axis electron holography: reconstruct a phase object from
synthetic holograms (counterpart of the reference's holography
workflow; the UDF here is a working implementation,
libertem_tpu/udf/holography.py).

Run: python examples/holography.py
"""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

from libertem_tpu import Context
from libertem_tpu.io.dataset.memory import MemoryDataSet
from libertem_tpu.udf.holography import (
    HoloReconstructUDF,
    estimate_sideband_position,
    estimate_sideband_size,
)
from libertem_tpu.utils.generate import hologram_frame


def make_holograms(n=8, sy=128, sx=128):
    """A stack of holograms of a Gaussian phase bump whose height
    grows frame by frame, plus a flat reference hologram."""
    y, x = np.mgrid[0:sy, 0:sx]
    bump = np.exp(-((y - sy / 2) ** 2 + (x - sx / 2) ** 2) / 600.0)
    amp = np.ones((sy, sx))
    frames = [
        hologram_frame(amp, 0.25 * (i + 1) * bump, sampling=4.0)
        for i in range(n - 1)
    ]
    ref = hologram_frame(amp, np.zeros((sy, sx)), sampling=4.0)
    frames.append(ref)
    return np.stack(frames).astype(np.float32), bump


def main():
    frames, bump = make_holograms()
    n = len(frames)
    ds = MemoryDataSet(
        data=frames.reshape(n, 1, *frames.shape[1:]), sig_dims=2,
        num_partitions=2,
    ).initialize()

    with Context.make_with("inline") as ctx:
        # estimate carrier-fringe parameters from the reference
        # hologram (the last frame)
        sb_pos = estimate_sideband_position(frames[-1])
        sb_size = estimate_sideband_size(sb_pos, frames.shape[1:])
        print(f"sideband at {sb_pos}, size {sb_size:.1f} px")

        udf = HoloReconstructUDF(
            out_shape=(64, 64), sb_position=sb_pos, sb_size=sb_size,
        )
        res = ctx.run_udf(ds, udf, progress=True)
        wave = np.asarray(res["wave"].data).reshape(n, 64, 64)

        # phase relative to the reference wave (the last frame);
        # sideband cropping attenuates the absolute phase by a
        # constant factor, so the RATIO across frames is what the
        # reconstruction must preserve
        for i in (0, 3, 6):
            dphi = -np.angle(wave[i] / wave[-1])
            center = dphi[24:40, 24:40].mean()
            built = 0.25 * (i + 1) * bump[56:72, 56:72].mean()
            print(
                f"frame {i}: reconstructed {center:+.3f} rad, "
                f"built {built:+.3f} -> recovery ratio "
                f"{center / built:.2f}"
            )


if __name__ == "__main__":
    main()
