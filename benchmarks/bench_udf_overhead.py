"""Framework overhead: NoOpUDF over many small in-memory partitions
(counterpart of the reference's continuous UDF-overhead benchmark,
benchmarks/continuous/udf/base/test_udf_base.py:35 and the
scheduling-overhead bench excluded/udf/test_simple_udf.py:94)."""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import json
import time

import numpy as np

from libertem_tpu.io.dataset.memory import MemoryDataSet
from libertem_tpu.udf import NoOpUDF, SumSigUDF
from libertem_tpu.udf.base import UDFRunner


def main():
    data = np.zeros((32, 64, 64, 64), dtype=np.uint16)
    results = {}
    for n_part in (1, 8, 32):
        ds = MemoryDataSet(
            data=data, sig_dims=2, num_partitions=n_part
        ).initialize()
        runner = UDFRunner([NoOpUDF()])
        runner.run_for_dataset(ds)  # warm
        t0 = time.perf_counter()
        runner.run_for_dataset(ds)
        results[f"noop_{n_part}_partitions_s"] = round(
            time.perf_counter() - t0, 4
        )
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=8
    ).initialize()
    runner = UDFRunner([SumSigUDF()])
    runner.run_for_dataset(ds)
    t0 = time.perf_counter()
    runner.run_for_dataset(ds)
    results["sumsig_8_partitions_s"] = round(
        time.perf_counter() - t0, 4
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
