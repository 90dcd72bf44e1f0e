"""Worker process for the simulated multi-host (DCN) test.

Each of two processes owns 4 virtual CPU devices; jax.distributed
glues them into one 8-device mesh (collectives over gloo/TCP — the
CPU stand-in for ICI+DCN).  Both processes run the SAME sharded UDF
pass; each feeds only its local shards and both must produce the full,
correct, replicated results.

Usage: multihost_worker.py <coordinator_port> <process_id> <n_procs>
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

port, pid, n_procs = (int(a) for a in sys.argv[1:4])
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=n_procs,
    process_id=pid,
)

import numpy as np  # noqa: E402

from libertem_tpu.io.dataset.memory import MemoryDataSet  # noqa: E402
from libertem_tpu.udf import (  # noqa: E402
    ApplyMasksUDF, StdDevUDF, SumSigUDF, SumUDF,
)
from libertem_tpu.udf.base import UDFRunner  # noqa: E402


def main():
    devices = jax.devices()
    assert len(devices) == 4 * n_procs, devices
    assert len(jax.local_devices()) == 4

    rng = np.random.default_rng(42)
    data = rng.normal(
        loc=1.0, size=(8, 8, 16, 16)
    ).astype(np.float32)
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=4
    ).initialize()
    mask = rng.random((16, 16)).astype(np.float32)
    runner = UDFRunner([
        SumUDF(), SumSigUDF(), StdDevUDF(),
        ApplyMasksUDF(mask_factories=[lambda: mask]),
    ])
    res = runner.run_for_dataset(ds, devices=devices)
    flat = data.reshape(-1, 16, 16)
    assert np.allclose(
        res.buffers[0]["intensity"].data, flat.sum(axis=0),
        rtol=1e-4,
    ), "multihost SumUDF mismatch"
    assert np.allclose(
        res.buffers[1]["intensity"].data.reshape(-1),
        flat.sum(axis=(1, 2)), rtol=1e-4,
    ), "multihost SumSigUDF mismatch"
    assert np.allclose(
        res.buffers[2]["var"].data, flat.var(axis=0),
        rtol=1e-2, atol=1e-3,
    ), "multihost StdDevUDF mismatch"
    expected_masks = flat.reshape(-1, 256) @ mask.reshape(-1)
    assert np.allclose(
        res.buffers[3]["intensity"].data.reshape(-1),
        expected_masks, rtol=1e-4,
    ), "multihost ApplyMasksUDF mismatch"
    assert res.damage.raw_data.all()

    # roi + iter over the same mesh
    roi = rng.random(64) > 0.4
    runner2 = UDFRunner([SumUDF()])
    last = None
    for last in runner2.run_for_dataset_iter(
        ds, roi=roi, devices=devices
    ):
        pass
    assert np.allclose(
        last.buffers[0]["intensity"].data, flat[roi].sum(axis=0),
        rtol=1e-4,
    ), "multihost roi SumUDF mismatch"
    print(f"MULTIHOST_WORKER_{pid}_OK", flush=True)


if __name__ == "__main__":
    main()
