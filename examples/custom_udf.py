"""Writing custom UDFs: the device (jax-traced) path, the host
(numpy) path, aux data, ROIs and live partial results — everything a
reference UDF port touches (see docs/migration.md for the porting
rules).

Run: python examples/custom_udf.py
"""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

from libertem_tpu import Context
from libertem_tpu.io.dataset.memory import MemoryDataSet
from libertem_tpu.udf.base import UDF


class MaxFrameUDF(UDF):
    """Device-path UDF: per-pixel maximum over all frames.

    Traced under jax.jit — buffers update by ASSIGNMENT (jax arrays
    are immutable), and `self.xp` is jax.numpy here.
    """

    def get_result_buffers(self):
        return {
            "max_frame": self.buffer(kind="sig", dtype="float32"),
        }

    def process_tile(self, tile):
        self.results.max_frame = self.xp.maximum(
            self.results.max_frame,
            tile.max(axis=0).astype("float32"),
        )

    def merge(self, dest, src):
        # merge runs traced on device too — use self.xp, not numpy
        dest.max_frame = self.xp.maximum(
            dest.max_frame, src.max_frame
        )


class WeightedSumUDF(UDF):
    """Aux-data UDF: one weight per scan position rides along with
    the frames (UDF.aux_data, sliced per tile automatically)."""

    def get_result_buffers(self):
        return {
            "weighted": self.buffer(kind="nav", dtype="float32"),
        }

    def process_frame(self, frame):
        self.results.weighted = frame.sum() * self.params.weight


class HistogramUDF(UDF):
    """Host-path UDF: numpy code that can't trace (data-dependent
    bincount) — declare the numpy backend and keep the reference's
    mutable-view semantics (`[:]` writes work here)."""

    def __init__(self, bins=16, range_max=1.0):
        super().__init__(bins=bins, range_max=range_max)

    def get_backends(self):
        return (self.BACKEND_NUMPY,)

    def get_result_buffers(self):
        return {
            "hist": self.buffer(
                kind="single", extra_shape=(self.params.bins,),
                dtype="int64",
            ),
        }

    def process_frame(self, frame):
        h, _ = np.histogram(
            frame, bins=self.params.bins,
            range=(0.0, self.params.range_max),
        )
        self.results.hist[:] += h

    def merge(self, dest, src):
        dest.hist[:] += src.hist


def main():
    rng = np.random.default_rng(7)
    data = rng.random((16, 16, 32, 32)).astype(np.float32)
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=4
    ).initialize()

    with Context.make_with("inline") as ctx:
        # one pass, three UDFs, two execution engines
        weights = np.linspace(0, 1, 256).astype(np.float32)
        res_max, res_w, res_h = ctx.run_udf(ds, [
            MaxFrameUDF(),
            WeightedSumUDF(weight=WeightedSumUDF.aux_data(
                weights, kind="nav", dtype="float32",
            )),
            HistogramUDF(bins=8),
        ])
        assert np.allclose(
            res_max["max_frame"].data,
            data.reshape(-1, 32, 32).max(axis=0),
        )
        assert np.allclose(
            res_w["weighted"].data.reshape(-1),
            data.reshape(256, -1).sum(axis=1) * weights,
            rtol=1e-4,
        )
        assert res_h["hist"].data.sum() == data.size
        print("combined run ok:", res_h["hist"].data)

        # ROI + partial results: process only the center scan rows,
        # watching damage grow
        roi = np.zeros((16, 16), dtype=bool)
        roi[6:10] = True
        for partial in ctx.run_udf_iter(ds, MaxFrameUDF(), roi=roi):
            done = int(partial.damage.raw_data.sum())
            print(f"  partial: {done}/{roi.sum()} frames merged")
        print("roi run ok")


if __name__ == "__main__":
    main()
