"""Executor x dataset-format matrix: canonical UDFs over every format
on both the single-device and sharded executors
(counterpart of the reference's tests/executor/test_functional.py:40).
"""
import struct

import jax
import numpy as np
import pytest

from libertem_tpu.udf import PickUDF, SumSigUDF, SumUDF
from libertem_tpu.udf.base import UDFRunner

from conftest import _mk_random

NAV = (3, 4)
SIG = (8, 8)
N = 12


def _flat(data):
    return data.reshape((-1,) + SIG).astype(np.float64)


def make_memory(tmp_path, lt_ctx, data):
    from libertem_tpu.io.dataset.memory import MemoryDataSet
    return MemoryDataSet(
        data=data, sig_dims=2, num_partitions=2
    ).initialize()


def make_raw(tmp_path, lt_ctx, data):
    path = str(tmp_path / "t.raw")
    data.astype(np.uint16).tofile(path)
    return lt_ctx.load("raw", path=path, dtype="uint16",
                       nav_shape=NAV, sig_shape=SIG)


def make_npy(tmp_path, lt_ctx, data):
    path = str(tmp_path / "t.npy")
    np.save(path, data.astype(np.uint16))
    return lt_ctx.load("npy", path=path)


def make_hdf5(tmp_path, lt_ctx, data):
    import h5py
    path = str(tmp_path / "t.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=data.astype(np.uint16))
    return lt_ctx.load("hdf5", path=path)


def make_mib(tmp_path, lt_ctx, data):
    path = str(tmp_path / "t.mib")
    hb = 384
    with open(path, "wb") as f:
        for i, fr in enumerate(data.reshape((-1,) + SIG)):
            head = (
                f"MQ1,{i+1},{hb},1,{SIG[1]},{SIG[0]},U16,1x1,2x2,12"
            ).encode()
            f.write(head.ljust(hb, b"\x00"))
            f.write(fr.astype(">u2").tobytes())
    return lt_ctx.load("mib", path=path, nav_shape=NAV)


def make_empad(tmp_path, lt_ctx, data):
    raw = np.zeros((N, 130, 128), dtype=np.float32)
    raw[:, :128, :SIG[1]] = 0
    big = np.zeros((N, 128, 128), dtype=np.float32)
    big[:, :SIG[0], :SIG[1]] = data.reshape((-1,) + SIG)
    raw[:, :128, :] = big
    path = str(tmp_path / "t.raw")
    raw.tofile(path)
    ds = lt_ctx.load("empad", path=path, nav_shape=NAV)
    return ds


def make_seq(tmp_path, lt_ctx, data):
    from libertem_tpu.io.dataset.seq import _FIELDS, _HEADER_STRUCT
    w, h = SIG[1], SIG[0]
    tis = w * h * 2
    defaults = dict(
        magic=0xFEED, name=b"s", version=5, header_size=8192,
        description=b"", width=w, height=h, bit_depth=16,
        bit_depth_real=12, image_size_bytes=w * h * 2,
        image_format=0, allocated_frames=N, origin=0,
        true_image_size=tis, suggested_frame_rate=1.0,
        description_format=0, reference_frame=0, fixed_size=0,
        flags=0, bayer_pattern=0, time_offset_us=0,
        extended_header_size=0, compression_format=0,
        reference_time_s=0, reference_time_ms=0,
        reference_time_us=0,
    )
    head = struct.pack(
        _HEADER_STRUCT, *[defaults[k] for k in _FIELDS]
    )
    path = str(tmp_path / "t.seq")
    with open(path, "wb") as f:
        f.write(head.ljust(8192, b"\x00"))
        for fr in data.reshape((-1,) + SIG):
            f.write(fr.astype("<u2").tobytes())
    return lt_ctx.load("seq", path=path, nav_shape=NAV)


def make_mrc(tmp_path, lt_ctx, data):
    path = str(tmp_path / "t.mrc")
    head = bytearray(1024)
    head[0:16] = struct.pack("<4i", SIG[1], SIG[0], N, 6)
    with open(path, "wb") as f:
        f.write(bytes(head))
        f.write(data.astype("<u2").tobytes())
    return lt_ctx.load("mrc", path=path, nav_shape=NAV)


FORMATS = {
    "memory": make_memory,
    "raw": make_raw,
    "npy": make_npy,
    "hdf5": make_hdf5,
    "mib": make_mib,
    "seq": make_seq,
    "mrc": make_mrc,
}


@pytest.fixture
def data():
    return _mk_random(NAV + SIG, dtype="uint16")


@pytest.mark.parametrize("fmt", sorted(FORMATS))
@pytest.mark.parametrize("executor", ["inline", "sharded"])
def test_matrix(fmt, executor, lt_ctx, tmp_path, data):
    ds = FORMATS[fmt](tmp_path, lt_ctx, data)
    assert tuple(ds.shape) == NAV + SIG
    devices = jax.devices() if executor == "sharded" else None
    runner = UDFRunner([SumUDF(), SumSigUDF()])
    res = runner.run_for_dataset(ds, devices=devices)
    flat = _flat(data)
    assert np.allclose(
        res.buffers[0]["intensity"].data, flat.sum(axis=0),
        rtol=1e-4,
    )
    assert np.allclose(
        res.buffers[1]["intensity"].data.reshape(-1),
        flat.sum(axis=(1, 2)), rtol=1e-4,
    )
    roi = np.zeros(N, dtype=bool)
    roi[[2, 9]] = True
    res2 = UDFRunner([PickUDF()]).run_for_dataset(
        ds, roi=roi, devices=devices
    )
    assert np.allclose(
        res2.buffers[0]["intensity"].data,
        data.reshape((-1,) + SIG)[[2, 9]],
    )


def test_streaming_soak(lt_ctx, tmp_path):
    """A few hundred MB through the full file->blocks->device->merge
    pipeline: exercises prefetch, partitioning and memory behavior
    at a realistic scale (scaled-down soak)."""
    path = str(tmp_path / "soak.raw")
    nav, sig = (64, 64), (128, 128)
    n = nav[0] * nav[1]
    rng = np.random.default_rng(0)
    chunk = rng.poisson(8.0, size=(1024,) + sig).astype(np.uint16)
    with open(path, "wb") as f:
        for off in range(0, n, 1024):
            f.write(chunk[:min(1024, n - off)].tobytes())
    ds = lt_ctx.load(
        "raw", path=path, dtype="uint16",
        nav_shape=nav, sig_shape=sig,
    )
    from libertem_tpu.udf import StdDevUDF, SumUDF
    res = lt_ctx.run_udf(ds, [SumUDF(), StdDevUDF()])
    reps = n // 1024
    expected = chunk.astype(np.float64).sum(axis=0) * reps
    assert np.allclose(
        res[0]["intensity"].data, expected, rtol=1e-3
    )
    assert float(res[1]["num_frames"].data) == n
