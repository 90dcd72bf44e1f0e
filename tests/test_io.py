import os

import numpy as np
import pytest

from libertem_tpu.io.corrections import CorrectionSet
from libertem_tpu.io.dataset.hdf5 import H5DataSet
from libertem_tpu.io.dataset.memory import MemoryDataSet
from libertem_tpu.io.dataset.npy import NPYDataSet
from libertem_tpu.io.dataset.raw import RawFileDataSet
from libertem_tpu.udf import PickUDF, SumSigUDF, SumUDF

from conftest import _mk_random


@pytest.fixture
def data():
    return _mk_random((13, 17, 19, 21), dtype="uint16")


def _check(lt_ctx, ds, data):
    res_sum, res_ss = lt_ctx.run_udf(ds, [SumUDF(), SumSigUDF()])
    ref = data.astype(np.float32)
    assert np.allclose(
        res_sum["intensity"].data, ref.sum(axis=(0, 1)), rtol=1e-4
    )
    assert np.allclose(
        res_ss["intensity"].data, ref.sum(axis=(2, 3)), rtol=1e-4
    )


def test_raw_ds(lt_ctx, tmp_path, data):
    path = str(tmp_path / "test.raw")
    data.tofile(path)
    ds = lt_ctx.load(
        "raw", path=path, dtype="uint16",
        nav_shape=(13, 17), sig_shape=(19, 21),
    )
    assert tuple(ds.shape) == (13, 17, 19, 21)
    _check(lt_ctx, ds, data)


def test_raw_sync_offset(lt_ctx, tmp_path, data):
    path = str(tmp_path / "test.raw")
    data.tofile(path)
    ds = lt_ctx.load(
        "raw", path=path, dtype="uint16",
        nav_shape=(13, 17), sig_shape=(19, 21), sync_offset=2,
    )
    res = lt_ctx.run_udf(ds, SumSigUDF())
    flat = data.reshape(-1, 19, 21).astype(np.float32)
    expected = np.zeros(13 * 17, dtype=np.float32)
    expected[:13 * 17 - 2] = flat[2:].sum(axis=(1, 2))
    assert np.allclose(
        res["intensity"].data.reshape(-1), expected, rtol=1e-4
    )


def test_npy_ds(lt_ctx, tmp_path, data):
    path = str(tmp_path / "test.npy")
    np.save(path, data)
    ds = lt_ctx.load("npy", path=path, sig_dims=2)
    assert tuple(ds.shape) == (13, 17, 19, 21)
    _check(lt_ctx, ds, data)


def test_npy_autodetect(lt_ctx, tmp_path, data):
    path = str(tmp_path / "test.npy")
    np.save(path, data)
    ds = lt_ctx.load("auto", path)
    assert tuple(ds.shape) == (13, 17, 19, 21)


def test_hdf5_ds(lt_ctx, tmp_path, data):
    import h5py
    path = str(tmp_path / "test.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=data, chunks=(1, 4, 19, 21))
    ds = lt_ctx.load("hdf5", path=path, ds_path="data")
    assert tuple(ds.shape) == (13, 17, 19, 21)
    _check(lt_ctx, ds, data)


def test_hdf5_autodetect_dspath(lt_ctx, tmp_path, data):
    import h5py
    path = str(tmp_path / "t2.h5")
    with h5py.File(path, "w") as f:
        grp = f.create_group("nested")
        grp.create_dataset("frames", data=data)
    ds = lt_ctx.load("hdf5", path=path)
    assert tuple(ds.shape) == (13, 17, 19, 21)


def test_corrections_roundtrip(lt_ctx, data):
    """Corrections applied on device match the numpy reference
    (counterpart of dataset_correction_verification,
    reference tests/utils.py:259)."""
    rng = np.random.default_rng(5)
    dark = rng.normal(size=(19, 21)).astype(np.float32)
    gain = (1 + 0.1 * rng.random((19, 21))).astype(np.float32)
    excluded = np.zeros((19, 21), dtype=bool)
    excluded[3, 4] = excluded[10, 15] = excluded[3, 5] = True
    corr = CorrectionSet(dark=dark, gain=gain,
                         excluded_pixels=excluded)
    ds = MemoryDataSet(data=data, sig_dims=2, num_partitions=2)
    ds.initialize()
    res = lt_ctx.run_udf(ds, SumUDF(), corrections=corr)
    flat = data.reshape(-1, 19, 21)
    expected = corr.apply_numpy(flat).sum(axis=0)
    assert np.allclose(
        res["intensity"].data, expected, rtol=1e-3, atol=1e-2
    )


def test_record_and_export(lt_ctx, tmp_path, data):
    ds = MemoryDataSet(data=data, sig_dims=2, num_partitions=2)
    ds.initialize()
    out = str(tmp_path / "exported.npy")
    lt_ctx.export_dataset(ds, path=out)
    written = np.load(out)
    # the npy header carries the FULL nav dims (reference
    # record.py:49)
    assert written.shape == (13, 17, 19, 21)
    assert np.array_equal(written, data)


def test_dataset_registry_unknown(lt_ctx):
    from libertem_tpu.io.dataset.base import DataSetException
    with pytest.raises(DataSetException):
        lt_ctx.load("nosuchformat", path="/nonexistent")


def test_export_from_sharded_context(tmp_path, data):
    """export_dataset works from a multi-device Context (records
    run single-device to preserve frame order)."""
    from libertem_tpu.api import Context
    ctx = Context.make_with("sharded")
    ds = MemoryDataSet(data=data, sig_dims=2, num_partitions=2)
    ds.initialize()
    out = str(tmp_path / "exported.npy")
    ctx.export_dataset(ds, path=out)
    written = np.load(out)
    assert np.array_equal(written, data)


def test_raw_buffered_backend(lt_ctx, tmp_path, data):
    from libertem_tpu.io.dataset.base import (
        BufferedBackend, DirectBackend,
    )
    path = str(tmp_path / "buf.raw")
    data.tofile(path)
    for backend in (BufferedBackend(), DirectBackend()):
        ds = lt_ctx.load(
            "raw", path=path, dtype="uint16",
            nav_shape=(13, 17), sig_shape=(19, 21),
            io_backend=backend,
        )
        res = lt_ctx.run_udf(ds, SumUDF())
        assert np.allclose(
            res["intensity"].data,
            data.astype(np.float32).sum(axis=(0, 1)), rtol=1e-4,
        )


def test_backend_strategies_mib_seq_npy(lt_ctx, tmp_path):
    """Buffered / O_DIRECT read paths are real for MIB, SEQ and NPY
    (shared RangeReader, reference backend_buffered.py:208): the
    requested strategy is actually exercised and results are
    identical to the mmap path."""
    from libertem_tpu.io.dataset.base import (
        BufferedBackend, DirectBackend, MMapBackend,
    )
    from test_mib import _encode_r12
    rng = np.random.default_rng(3)

    # --- MIB (r12) ---
    mib_frames = rng.integers(0, 4096, (12, 16, 16)).astype(np.uint16)
    mib_path = str(tmp_path / "b.mib")
    hb = 384
    with open(mib_path, "wb") as f:
        for i, fr in enumerate(mib_frames):
            payload = _encode_r12(fr.reshape(1, -1)).tobytes()
            head = (
                f"MQ1,{i + 1},{hb},1,16,16,R64,1x1,2x2,12"
            ).encode("ascii")
            f.write(head.ljust(hb, b"\x00"))
            f.write(payload)

    # --- SEQ ---
    seq_frames = rng.integers(0, 65535, (10, 8, 12)).astype("<u2")
    seq_path = str(tmp_path / "b.seq")
    from test_formats import _write_seq
    _write_seq(seq_path, seq_frames)

    # --- NPY ---
    npy_data = rng.random((3, 4, 8, 8)).astype(np.float32)
    npy_path = str(tmp_path / "b.npy")
    np.save(npy_path, npy_data)

    cases = [
        ("mib", dict(path=mib_path, nav_shape=(3, 4)),
         mib_frames.astype(np.float32).sum(axis=0)),
        ("seq", dict(path=seq_path, nav_shape=(2, 5)),
         seq_frames.astype(np.float32).sum(axis=0)),
        ("npy", dict(path=npy_path),
         npy_data.sum(axis=(0, 1))),
    ]
    for fmt, kwargs, expected in cases:
        for backend, want in (
            (MMapBackend(), "mmap"),
            (BufferedBackend(), "buffered"),
            (DirectBackend(), "direct"),
        ):
            ds = lt_ctx.load(fmt, io_backend=backend, **kwargs)
            part = next(ds.get_partitions())
            # read through the partition so the reader exists
            res = lt_ctx.run_udf(ds, SumUDF())
            assert np.allclose(
                res["intensity"].data, expected, rtol=1e-4
            ), (fmt, want)
            readers = getattr(part, "_readers", None)
            if readers is None:
                readers = {"_": part._reader}
            # strategy attribute proves the path taken
            strategies = set()
            for p in ds.get_partitions():
                p._read_raw_frames(
                    p.start_frame, p.start_frame + 1
                )
                rd = getattr(p, "_reader", None)
                if rd is None:
                    rd = next(iter(p._readers.values()))
                strategies.add(rd.strategy)
            assert strategies == {want}, (fmt, want, strategies)


def test_h5_sparse_roi_fast_path(lt_ctx, tmp_path, monkeypatch):
    """A sparse roi on HDF5 reads only the selected frames
    (reference hdf5.py:875 roi fast path), not covering spans."""
    import h5py
    from libertem_tpu.io.dataset.hdf5 import H5Partition
    data = _mk_random((10, 10, 8, 8), dtype="float32")
    path = str(tmp_path / "roi.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=data, chunks=(1, 10, 8, 8))
    calls = {"selected": 0, "cover": 0}
    orig_sel = H5Partition.read_selected_frames
    orig_cover = H5Partition._read_raw_frames

    def sel(self, ids):
        calls["selected"] += 1
        return orig_sel(self, ids)

    def cover(self, start, stop):
        calls["cover"] += 1
        return orig_cover(self, start, stop)

    monkeypatch.setattr(H5Partition, "read_selected_frames", sel)
    monkeypatch.setattr(H5Partition, "_read_raw_frames", cover)
    ds = lt_ctx.load("hdf5", path=path)
    roi = np.zeros(100, dtype=bool)
    # several sparse frames within one partition's span so a
    # single block covers a wide gap
    roi[[3, 22, 47, 68, 91]] = True
    res = lt_ctx.run_udf(ds, PickUDF(), roi=roi)
    picked = np.asarray(res["intensity"].data)
    flat = data.reshape(-1, 8, 8)
    assert np.array_equal(picked, flat[[3, 22, 47, 68, 91]])
    assert calls["selected"] >= 1
    # nD-nav check: 4D nav file also works with the fast path
    res2 = lt_ctx.run_udf(ds, SumUDF(), roi=roi)
    assert np.allclose(
        res2["intensity"].data,
        flat[[3, 22, 47, 68, 91]].astype(np.float64).sum(axis=0), rtol=1e-5,
    )


def test_backend_strategy_threaded_all_formats(lt_ctx, tmp_path):
    """Every file-backed format honors a non-default io_backend
    (regression for formats whose lazy RangeReaders used to ignore
    it): load with MMapBackend and assert the partitions' readers
    run the mmap strategy."""
    import struct as _struct
    from libertem_tpu.io.dataset.base import MMapBackend

    # --- MRC ---
    frames = _mk_random((4, 8, 12), dtype="int16")
    mrc_path = str(tmp_path / "s.mrc")
    head = bytearray(1024)
    head[0:16] = _struct.pack("<4i", 12, 8, 4, 1)
    with open(mrc_path, "wb") as f:
        f.write(bytes(head))
        f.write(frames.astype("<i2").tobytes())

    # --- SER ---
    from test_formats2 import _write_ser
    ser_frames = _mk_random((4, 6, 8), dtype="uint16")
    ser_path = str(tmp_path / "s.ser")
    _write_ser(ser_path, ser_frames)

    # --- DM4 ---
    from test_formats2 import _write_dm4
    dm_data = _mk_random((4, 6, 6), dtype="uint16")
    dm_path = str(tmp_path / "s.dm4")
    _write_dm4(dm_path, dm_data)

    cases = [
        ("mrc", dict(path=mrc_path)),
        ("ser", dict(path=ser_path)),
        ("dm", dict(path=dm_path)),
    ]
    for fmt, kwargs in cases:
        ds = lt_ctx.load(fmt, io_backend=MMapBackend(), **kwargs)
        for p in ds.get_partitions():
            p._read_raw_frames(p.start_frame, p.start_frame + 1)
            rd = getattr(p, "_reader", None)
            if rd is None:
                rd = next(iter(p._readers.values()))
            assert rd.strategy == "mmap", fmt


def test_from_json_default_is_buffered():
    from libertem_tpu.io.dataset.base import (
        BufferedBackend, IOBackend,
    )
    backend = IOBackend.from_json({})
    assert isinstance(backend, BufferedBackend)


def test_hdf5_gzip_compressed(lt_ctx, tmp_path):
    """Compressed (gzip) chunked HDF5 reads correctly, including via
    load('auto')."""
    import h5py
    data = _mk_random((4, 5, 16, 16), dtype="float32")
    path = str(tmp_path / "c.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset(
            "data", data=data, chunks=(1, 1, 16, 16),
            compression="gzip",
        )
    from libertem_tpu.udf import SumUDF
    for load_args in (("hdf5",), ("auto",)):
        ds = lt_ctx.load(*load_args, path=path)
        res = lt_ctx.run_udf(ds, SumUDF())
        assert np.allclose(
            res["intensity"].data, data.sum(axis=(0, 1)), rtol=1e-4
        )


def test_range_reader_growing_file(tmp_path):
    """The cached st_size must refresh when a read lands past it: a
    dataset opened while acquisition software is still appending
    (live .seq/.tvips series) grows between reads."""
    from libertem_tpu.io.dataset.base import RangeReader

    path = str(tmp_path / "grow.bin")
    first = bytes(range(256)) * 16   # 4096 B
    with open(path, "wb") as f:
        f.write(first)
    rr = RangeReader(path)
    got = rr.read(0, 4096)
    assert bytes(got) == first
    # file grows after the reader cached st_size
    second = b"\xab" * 4096
    with open(path, "ab") as f:
        f.write(second)
    got = rr.read(4096, 4096)
    assert bytes(got) == second
    rr.close()


def test_corrections_force_float_input(lt_ctx):
    """Integer-dtype runs with active corrections must be upgraded
    to float: dark subtraction in uint16 wraps around and gain maps
    truncate (the reference forces >= float32 when
    corrections.have_corrections())."""
    from libertem_tpu.udf.raw import PickUDF

    data = np.full((2, 2, 4, 4), 100, dtype=np.uint16)
    ds = MemoryDataSet(data=data, sig_dims=2, num_partitions=1)
    ds.initialize()
    roi = np.zeros(4, dtype=bool)
    roi[1] = True
    corr = CorrectionSet(dark=np.full((4, 4), 150.0, np.float32))
    res = lt_ctx.run_udf(ds, PickUDF(), roi=roi, corrections=corr)
    picked = np.asarray(res["intensity"].data)
    assert np.issubdtype(picked.dtype, np.floating)
    assert np.allclose(picked, -50.0)  # not 65486

    corr = CorrectionSet(gain=np.full((4, 4), 1.5, np.float32))
    res = lt_ctx.run_udf(ds, PickUDF(), roi=roi, corrections=corr)
    assert np.allclose(np.asarray(res["intensity"].data), 150.0)


def test_corrections_validation():
    """Shape and emptiness validation with clear messages."""
    from libertem_tpu.io.corrections import RepairValueError
    # reference allow_empty semantics (corrset.py:105): default
    # validates repair environments — a pixel whose whole radius-1
    # neighborhood is excluded raises at construction
    mask = np.zeros((19,), bool)
    mask[[1, 2, 3]] = True
    with pytest.raises(RepairValueError):
        CorrectionSet(excluded_pixels=mask)
    CorrectionSet(excluded_pixels=mask, allow_empty=True)
    # an empty CorrectionSet is fine (the reference default too)
    CorrectionSet()
    corr = CorrectionSet(dark=np.zeros((1, 21), np.float32))
    with pytest.raises(ValueError, match="dark frame shape"):
        corr.make_plan((19, 21))
    corr = CorrectionSet(gain=np.ones(21, np.float32))
    with pytest.raises(ValueError, match="gain frame shape"):
        corr.make_plan((19, 21))


def test_corrections_square_coords_reference_convention():
    """A square (2, 2) integer coordinate array follows the
    reference's sparse.COO (ndim, n) convention: columns are
    points."""
    # points (1, 3) and (2, 0) in COO layout [[y0, y1], [x0, x1]]
    corr = CorrectionSet(
        excluded_pixels=np.array([[1, 2], [3, 0]])
    )
    got = {tuple(c) for c in corr.excluded_coords}
    assert got == {(1, 3), (2, 0)}


def test_detect_extension_priority(lt_ctx, tmp_path):
    """Auto-detection handles dotted directories and extensionless
    files (os.path.splitext, not split('.'))."""
    import os
    d = tmp_path / "run.v1"
    os.makedirs(d)
    p = str(d / "t.npy")
    np.save(p, np.zeros((2, 3, 4, 4), np.float32))
    ds = lt_ctx.load("auto", path=p)
    assert type(ds).__name__ == "NPYDataSet"


def test_corrections_out_of_bounds_excluded_raise():
    """Out-of-bounds excluded-pixel coordinates must fail loudly
    (reference np.ravel_multi_index default mode='raise'), not be
    clipped onto a valid pixel (advisor round-3 finding)."""
    from libertem_tpu.io.corrections import check_repair_environments
    with pytest.raises(ValueError):
        check_repair_environments((8, 8), np.array([[9, 3]]))
    with pytest.raises(ValueError):
        check_repair_environments((8, 8), np.array([[3, -9]]))
    # in-bounds: fine
    check_repair_environments((8, 8), np.array([[3, 3]]))


def test_run_for_dataset_rejects_ambiguous_positionals(lt_ctx):
    """run_for_dataset's post-executor params are keyword-only: the
    reference's positional order differs (roi, progress, corrections,
    ...), so a reference-style positional call must raise TypeError
    instead of silently misbinding (advisor round-3 finding)."""
    from libertem_tpu.io.dataset.memory import MemoryDataSet
    from libertem_tpu.udf import SumUDF
    from libertem_tpu.udf.base import UDFRunner
    data = np.ones((2, 2, 4, 4), np.float32)
    ds = MemoryDataSet(data=data, num_partitions=1)
    ds.initialize(lt_ctx.executor)
    runner = UDFRunner([SumUDF()])
    with pytest.raises(TypeError):
        runner.run_for_dataset(ds, None, None, True)
