"""Executor x dataset-format matrix: canonical UDFs over EVERY format
on both the single-device and sharded executors
(counterpart of the reference's tests/executor/test_functional.py:40).

Each maker writes a synthetic file and returns ``(ds, expected)``
where ``expected`` is the float64 (n, *sig) frame stack the dataset
should decode to.
"""
import os
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


def make_memory(tmp_path, lt_ctx, data):
    from libertem_tpu.io.dataset.memory import MemoryDataSet
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=2
    ).initialize()
    return ds, data.reshape((-1,) + SIG).astype(np.float64)


def make_raw(tmp_path, lt_ctx, data):
    path = str(tmp_path / "t.raw")
    data.astype(np.uint16).tofile(path)
    ds = lt_ctx.load("raw", path=path, dtype="uint16",
                     nav_shape=NAV, sig_shape=SIG)
    return ds, data.reshape((-1,) + SIG).astype(np.float64)


def make_npy(tmp_path, lt_ctx, data):
    path = str(tmp_path / "t.npy")
    np.save(path, data.astype(np.uint16))
    ds = lt_ctx.load("npy", path=path)
    return ds, data.reshape((-1,) + SIG).astype(np.float64)


def make_hdf5(tmp_path, lt_ctx, data):
    import h5py
    path = str(tmp_path / "t.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=data.astype(np.uint16))
    ds = lt_ctx.load("hdf5", path=path)
    return ds, data.reshape((-1,) + SIG).astype(np.float64)


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
    ds = lt_ctx.load("mib", path=path, nav_shape=NAV)
    return ds, data.reshape((-1,) + SIG).astype(np.float64)


def make_empad(tmp_path, lt_ctx, data):
    raw = np.zeros((N, 130, 128), dtype=np.float32)
    big = np.zeros((N, 128, 128), dtype=np.float32)
    big[:, :SIG[0], :SIG[1]] = data.reshape((-1,) + SIG)
    raw[:, :128, :] = big
    path = str(tmp_path / "t.raw")
    raw.tofile(path)
    ds = lt_ctx.load("empad", path=path, nav_shape=NAV)
    return ds, big.astype(np.float64)


def make_seq(tmp_path, lt_ctx, data):
    from test_formats import _write_seq
    path = str(tmp_path / "t.seq")
    _write_seq(path, data.reshape((-1,) + SIG).astype(np.uint16))
    ds = lt_ctx.load("seq", path=path, nav_shape=NAV)
    return ds, data.reshape((-1,) + SIG).astype(np.float64)


def make_mrc(tmp_path, lt_ctx, data):
    path = str(tmp_path / "t.mrc")
    head = bytearray(1024)
    head[0:16] = struct.pack("<4i", SIG[1], SIG[0], N, 6)
    with open(path, "wb") as f:
        f.write(bytes(head))
        f.write(data.astype("<u2").tobytes())
    ds = lt_ctx.load("mrc", path=path, nav_shape=NAV)
    return ds, data.reshape((-1,) + SIG).astype(np.float64)


def make_blo(tmp_path, lt_ctx, data):
    from libertem_tpu.io.dataset.blo import (
        FRAME_HEADER_BYTES, blo_header_dtype,
    )
    frames = (data.reshape((-1,) + SIG) % 256).astype(np.uint8)
    hdr = np.zeros(1, dtype=blo_header_dtype())
    hdr["ID"] = b"IMGBLO"
    hdr["MAGIC"] = 258
    hdr["Data_offset_1"] = 1024
    hdr["Data_offset_2"] = 2048
    hdr["DP_SZ"] = SIG[0]
    hdr["NX"] = NAV[1]
    hdr["NY"] = NAV[0]
    path = str(tmp_path / "t.blo")
    with open(path, "wb") as f:
        f.write(hdr.tobytes().ljust(2048, b"\x00"))
        for fr in frames:
            f.write(b"\x00" * FRAME_HEADER_BYTES)
            f.write(fr.tobytes())
    ds = lt_ctx.load("blo", path=path)
    return ds, frames.astype(np.float64)


def make_tvips(tmp_path, lt_ctx, data):
    frames = data.reshape((-1,) + SIG).astype(np.uint16)
    img_header = 12
    head = struct.pack(
        "<13i", 256, 2, SIG[1], SIG[0], 16, 0, 0, 1, 1, 10, 200, 1,
        img_header,
    )
    path = str(tmp_path / "ser_000.tvips")
    with open(path, "wb") as f:
        f.write(head.ljust(256, b"\x00"))
        for fr in frames:
            f.write(b"\x00" * img_header)
            f.write(fr.astype("<u2").tobytes())
    ds = lt_ctx.load("tvips", path=path, nav_shape=NAV)
    return ds, frames.astype(np.float64)


def make_ser(tmp_path, lt_ctx, data):
    from test_formats2 import _write_ser
    frames = data.reshape((-1,) + SIG).astype(np.uint16)
    path = str(tmp_path / "t.ser")
    _write_ser(path, frames)
    ds = lt_ctx.load("ser", path=path, nav_shape=NAV)
    return ds, frames.astype(np.float64)


def make_dm4(tmp_path, lt_ctx, data):
    from test_formats2 import _write_dm4
    frames = data.reshape((-1,) + SIG).astype(np.uint16)
    path = str(tmp_path / "t.dm4")
    _write_dm4(path, frames)
    ds = lt_ctx.load("dm", path=path, nav_shape=NAV)
    return ds, frames.astype(np.float64)


def make_dm3(tmp_path, lt_ctx, data):
    from test_formats2 import _write_dm3
    frames = data.reshape((-1,) + SIG).astype(np.uint16)
    path = str(tmp_path / "t.dm3")
    _write_dm3(path, frames)
    ds = lt_ctx.load("dm", path=path, nav_shape=NAV)
    return ds, frames.astype(np.float64)


def make_frms6(tmp_path, lt_ctx, data):
    from test_formats2 import _write_frms6
    from libertem_tpu.io.dataset.frms6 import unfold
    # folded (h/2, 2w) storage -> unfolded SIG frames
    folded = data.reshape(
        (-1, SIG[0] // 2, SIG[1] * 2)
    ).astype(np.uint16)
    dark = np.zeros((2,) + folded.shape[1:], dtype=np.uint16)
    _write_frms6(str(tmp_path / "acq_000.frms6"), dark)
    _write_frms6(str(tmp_path / "acq_001.frms6"), folded)
    ds = lt_ctx.load(
        "frms6", path=str(tmp_path / "acq_001.frms6"),
        nav_shape=NAV,
    )
    return ds, unfold(folded).astype(np.float64)


def make_raw_csr(tmp_path, lt_ctx, data):
    import scipy.sparse as sp
    dense = data.reshape(N, -1).astype(np.int32)
    dense[dense % 3 != 0] = 0  # make it sparse-ish
    csr = sp.csr_matrix(dense)
    (tmp_path / "rowind.dat").write_bytes(
        csr.indptr.astype("<i4").tobytes()
    )
    (tmp_path / "coords.dat").write_bytes(
        csr.indices.astype("<i4").tobytes()
    )
    (tmp_path / "values.dat").write_bytes(
        csr.data.astype("<i4").tobytes()
    )
    toml_path = str(tmp_path / "sparse.toml")
    with open(toml_path, "w") as f:
        f.write(
            '[params]\nfiletype = "raw_csr"\n'
            f"nav_shape = [{NAV[0]}, {NAV[1]}]\n"
            f"sig_shape = [{SIG[0]}, {SIG[1]}]\n\n"
            '[raw_csr]\nindptr_file = "rowind.dat"\n'
            'indptr_dtype = "<i4"\n'
            'indices_file = "coords.dat"\nindices_dtype = "<i4"\n'
            'data_file = "values.dat"\ndata_dtype = "<i4"\n'
        )
    ds = lt_ctx.load("raw_csr", path=toml_path)
    return ds, dense.reshape((-1,) + SIG).astype(np.float64)


def make_k2is(tmp_path, lt_ctx, data):
    from test_k2is import _block_header, _pack_uint12_le
    from libertem_tpu.io.dataset.k2is import (
        BLOCK_SHAPE, DATA_SIZE, NUM_SECTORS, SECTOR_SIZE,
    )
    rng = np.random.default_rng(11)
    n_frames = 4
    h, w = SECTOR_SIZE
    frames = rng.integers(
        0, 4096, (n_frames, h, NUM_SECTORS * w)
    ).astype(np.uint16)
    bh, bw = BLOCK_SHAPE
    pad = DATA_SIZE - (bh * bw * 3 // 2)
    for s in range(NUM_SECTORS):
        path = tmp_path / f"testfile{s}.bin"
        with open(path, "wb") as f:
            for fi in range(n_frames):
                for ys in (0, bh):
                    for xi in range(w // bw):
                        xs = xi * bw
                        block = frames[
                            fi, ys:ys + bh,
                            s * w + xs:s * w + xs + bw,
                        ]
                        f.write(_block_header(100 + fi, xs, ys))
                        f.write(_pack_uint12_le(block))
                        f.write(b"\x00" * pad)
    ds = lt_ctx.load(
        "k2is", path=str(tmp_path / "testfile0.bin"),
        nav_shape=(2, 2),
    )
    return ds, frames.astype(np.float64)


def make_dask(tmp_path, lt_ctx, data):
    pytest.importorskip("dask")
    import dask.array as da
    arr = da.from_array(data, chunks=(1, NAV[1]) + SIG)
    ds = lt_ctx.load("dask", arr, sig_dims=2)
    return ds, data.reshape((-1,) + SIG).astype(np.float64)


FORMATS = {
    "memory": make_memory,
    "raw": make_raw,
    "npy": make_npy,
    "hdf5": make_hdf5,
    "mib": make_mib,
    "empad": make_empad,
    "seq": make_seq,
    "mrc": make_mrc,
    "blo": make_blo,
    "tvips": make_tvips,
    "ser": make_ser,
    "dm3": make_dm3,
    "dm4": make_dm4,
    "frms6": make_frms6,
    "raw_csr": make_raw_csr,
    "k2is": make_k2is,
    "dask": make_dask,
}


@pytest.fixture
def data():
    return _mk_random(NAV + SIG, dtype="uint16")


@pytest.mark.parametrize("fmt", sorted(FORMATS))
@pytest.mark.parametrize("executor", ["inline", "sharded"])
def test_matrix(fmt, executor, lt_ctx, tmp_path, data):
    ds, expected = FORMATS[fmt](tmp_path, lt_ctx, data)
    n = expected.shape[0]
    devices = jax.devices() if executor == "sharded" else None
    runner = UDFRunner([SumUDF(), SumSigUDF()])
    res = runner.run_for_dataset(ds, devices=devices)
    assert np.allclose(
        res.buffers[0]["intensity"].data, expected.sum(axis=0),
        rtol=1e-4, atol=1e-2,
    )
    assert np.allclose(
        res.buffers[1]["intensity"].data.reshape(-1),
        expected.sum(axis=(1, 2)), rtol=1e-4,
    )
    picks = [min(2, n - 1), n - 1]
    roi = np.zeros(n, dtype=bool)
    roi[picks] = True
    res2 = UDFRunner([PickUDF()]).run_for_dataset(
        ds, roi=roi, devices=devices
    )
    got = np.asarray(res2.buffers[0]["intensity"].data, np.float64)
    assert np.allclose(got, expected[sorted(set(picks))], rtol=1e-6)


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


@pytest.mark.slow
def test_large_nav_stress(lt_ctx):
    """BASELINE config #5 nav scale (512x512 = 262144 frames) through
    the full streaming loop with a generate-on-read dataset: exercises
    nav bookkeeping, damage, partitioning and offsets at scale without
    materializing the 34 GB dataset (sig reduced to 64x64)."""
    from libertem_tpu.common.shape import Shape
    from libertem_tpu.io.dataset.base import (
        DataSet, DataSetMeta, Partition,
    )
    from libertem_tpu.udf import StdDevUDF, SumSigUDF, SumUDF

    NAVS = (512, 512)
    SIGS = (64, 64)

    class GenPartition(Partition):
        def _read_raw_frames(self, start, stop):
            # frame i has constant value (i % 7) + 1
            ids = np.arange(start, stop, dtype=np.int64)
            vals = (ids % 7 + 1).astype(np.uint16)
            return np.broadcast_to(
                vals[:, None, None], (stop - start,) + SIGS
            ).copy()

    class GenDataSet(DataSet):
        def initialize(self, executor=None):
            self._meta = DataSetMeta(
                shape=Shape(NAVS + SIGS, sig_dims=2),
                raw_dtype=np.dtype(np.uint16),
                sync_offset=0,
                image_count=int(np.prod(NAVS)),
            )
            return self

        def get_partitions(self):
            for idx, (start, stop) in enumerate(
                self.get_partition_ranges()
            ):
                yield GenPartition(
                    self.meta, start, stop - start, idx=idx
                )

    ds = GenDataSet(num_partitions=16).initialize()
    res = lt_ctx.run_udf(ds, [SumUDF(), SumSigUDF(), StdDevUDF()])
    n = int(np.prod(NAVS))
    ids = np.arange(n, dtype=np.float64)
    vals = ids % 7 + 1
    # SumUDF: every pixel = sum of all per-frame constants
    assert np.allclose(
        res[0]["intensity"].data, vals.sum(), rtol=1e-6
    )
    # SumSigUDF: per-frame constant x n_pix
    sumsig = np.asarray(res[1]["intensity"].data).reshape(-1)
    assert np.allclose(
        sumsig, vals * np.prod(SIGS), rtol=1e-4,
    )
    # StdDev across frames: variance of the 1..7 cycle
    assert np.allclose(
        res[2]["var"].data, vals.var(), rtol=1e-3,
    )
    assert int(res[2]["num_frames"].data) == n


@pytest.mark.slow
def test_full_scale_sparse_roi_stress(lt_ctx, tmp_path):
    """BASELINE config #5 at full single-node shape: a
    512x512x256x256 uint16 RAW dataset (34 GB) written as a *sparse*
    file (holes read back as zeros), streamed with a sparse ROI.

    Exercises what the reduced-sig stress cannot: byte offsets past
    2^31 (frame 200000 sits at ~26 GB), partition/ROI bookkeeping at
    the full frame count, sig tiling at 256x256, and the selected-
    frame sparse-ROI read path — while only physically reading the
    ~1.5k selected frames.
    """
    NAV = (512, 512)
    SIG = (256, 256)
    n = int(np.prod(NAV))
    frame_bytes = int(np.prod(SIG)) * 2
    path = str(tmp_path / "huge.raw")
    marked = {0: 3, 1: 5, 131072: 7, 200000: 11, n - 1: 13}
    with open(path, "wb") as f:
        f.truncate(n * frame_bytes)
        for fid, val in marked.items():
            f.seek(fid * frame_bytes)
            f.write(np.full(SIG, val, np.uint16).tobytes())
    assert os.path.getsize(path) == n * frame_bytes
    ds = lt_ctx.load(
        "raw", path=path, dtype="uint16",
        nav_shape=NAV, sig_shape=SIG,
    )
    rng = np.random.default_rng(42)
    roi = np.zeros(n, dtype=bool)
    roi[rng.choice(n, size=1500, replace=False)] = True
    for fid in marked:
        roi[fid] = True
    n_sel = int(roi.sum())
    res = lt_ctx.run_udf(ds, [SumUDF(), SumSigUDF()], roi=roi)
    # every marked frame is constant; everything else is zero
    assert np.allclose(
        res[0]["intensity"].data, float(sum(marked.values())),
        rtol=1e-6,
    )
    sumsig = np.asarray(res[1]["intensity"].data).reshape(-1)
    sel_ids = np.flatnonzero(roi)
    expected = np.zeros(n_sel, dtype=np.float64)
    for fid, val in marked.items():
        expected[np.searchsorted(sel_ids, fid)] = (
            float(val) * np.prod(SIG)
        )
    got = sumsig[roi]
    assert np.allclose(got, expected, rtol=1e-6)
    assert np.isnan(sumsig[~roi]).all()
