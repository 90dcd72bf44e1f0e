"""Correctness matrix: every file-backed format x
{sync_offset +/-, roi dense/sparse, corrections on/off, io backend}
against the ValidationUDF tile-stream oracle (the reference's matrix:
tests/executor/test_functional.py:40).

Each format gets a curated cell set rather than the full cross
product — the baseline cell (no roi/sync/corrections) is already
covered by the per-format tests in test_formats*.py and the
reference-golden parity tests; here every cell bends at least one
axis, and the kitchen-sink cell bends them all at once.
"""
import os
import struct

import numpy as np
import pytest

import format_encoders as fe
from conftest import _mk_random
from utils import ValidationUDF

from libertem_tpu.io.corrections import CorrectionSet


# ---- per-format writers -------------------------------------------
# each returns (loader_id, load_kwargs, flat_frames) where
# flat_frames is the (n, h, w) array the file stream contains, in
# file order

def make_raw(tmp):
    data = _mk_random((12, 10, 12), dtype="float32")
    path = str(tmp / "t.raw")
    data.tofile(path)
    return "raw", {
        "path": path, "dtype": "float32",
        "nav_shape": (3, 4), "sig_shape": (10, 12),
    }, data


def make_npy(tmp):
    data = _mk_random((3, 4, 10, 12), dtype="float32")
    path = str(tmp / "t.npy")
    np.save(path, data)
    return "npy", {"path": path}, data.reshape(-1, 10, 12)


def make_hdf5(tmp):
    import h5py
    data = _mk_random((3, 4, 10, 12), dtype="float32")
    path = str(tmp / "t.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=data)
    return "hdf5", {"path": path}, data.reshape(-1, 10, 12)


def make_mrc(tmp):
    data = _mk_random((12, 20, 24), dtype="int16")
    path = str(tmp / "t.mrc")
    head = bytearray(1024)
    head[0:16] = struct.pack("<4i", 24, 20, 12, 1)
    head[92:96] = struct.pack("<i", 0)
    with open(path, "wb") as f:
        f.write(bytes(head))
        f.write(data.astype("<i2").tobytes())
    return "mrc", {"path": path, "nav_shape": (3, 4)}, data


def make_seq(tmp):
    data = _mk_random((12, 12, 16), dtype="uint16")
    path = str(tmp / "t.seq")
    fe.write_seq(path, data)
    return "seq", {"path": path, "nav_shape": (3, 4)}, data


def make_tvips(tmp):
    data = _mk_random((12, 14, 16), dtype="uint16")
    path = str(tmp / "ser_000.tvips")
    fe.write_tvips(path, data)
    return "tvips", {"path": path, "nav_shape": (3, 4)}, data


def make_blo(tmp):
    data = _mk_random((12, 16, 16), dtype="uint8")
    path = str(tmp / "t.blo")
    fe.write_blo(path, data, nav=(3, 4))
    return "blo", {"path": path}, data


def make_empad(tmp):
    data = _mk_random((12, 128, 128), dtype="float32")
    xml = fe.write_empad(str(tmp), data, nav=(3, 4))
    return "empad", {"path": xml}, data


def make_frms6(tmp):
    folded = _mk_random((12, 6, 16), dtype="uint16")
    fe.write_frms6(str(tmp / "acq_001.frms6"), folded)
    from libertem_tpu.io.dataset.frms6 import unfold
    return "frms6", {
        "path": str(tmp / "acq_001.frms6"), "nav_shape": (3, 4),
    }, unfold(folded)


def make_mib(tmp):
    data = _mk_random((12, 256, 256), dtype="uint16") & 0xFFF
    path = str(tmp / "acq1.mib")
    fe.write_mib(
        path, data, "U16", 12,
        lambda fr: fr.reshape(fr.shape[0], -1).astype(">u2"),
    )
    return "mib", {"path": path, "nav_shape": (3, 4)}, data


def make_ser(tmp):
    from test_formats2 import _write_ser
    data = _mk_random((12, 8, 10), dtype="uint16")
    path = str(tmp / "t.ser")
    _write_ser(path, data)
    return "ser", {"path": path, "nav_shape": (3, 4)}, data


def make_dm(tmp):
    from test_formats2 import _write_dm4
    data = _mk_random((12, 8, 10), dtype="uint16")
    path = str(tmp / "t.dm4")
    _write_dm4(path, data)
    return "dm", {"path": path, "nav_shape": (3, 4)}, data


def make_raw_csr(tmp):
    rng = np.random.default_rng(13)
    n, sig = 12, (8, 9)
    n_pix = sig[0] * sig[1]
    dense = (
        (rng.random((n, n_pix)) < 0.2)
        * rng.integers(1, 90, (n, n_pix))
    ).astype(np.int32)
    toml = fe.write_raw_csr(str(tmp), dense, nav=(3, 4), sig=sig)
    return "raw_csr", {"path": toml}, dense.reshape(n, *sig)


def make_k2is(tmp):
    data = (_mk_random((4, 1860, 2048), dtype="uint16") & 0xFFF)
    p0 = fe.write_k2is_sectors(str(tmp), data)
    return "k2is", {"path": p0, "nav_shape": (4,)}, data


MAKERS = {
    "raw": make_raw, "npy": make_npy, "hdf5": make_hdf5,
    "mrc": make_mrc, "seq": make_seq, "tvips": make_tvips,
    "blo": make_blo, "empad": make_empad, "frms6": make_frms6,
    "mib": make_mib, "ser": make_ser, "dm": make_dm,
    "raw_csr": make_raw_csr, "k2is": make_k2is,
}

# cells: (sync_offset, roi_kind, corrections, io_backend)
CELLS = {
    "sync_plus": (2, None, False, None),
    "sync_minus": (-2, None, False, None),
    "roi_sparse": (0, "sparse", False, None),
    "roi_single": (0, "single", False, None),
    "roi_empty": (0, "empty", False, None),
    "roi_dense_corr": (0, "dense", True, None),
    "kitchen": (2, "sparse", True, None),
    "kitchen_mmap": (-2, "dense", True, "mmap"),
    "mmap_backend": (0, None, False, "mmap"),
}

# formats whose readers don't go through RangeReader-style file IO
# (h5py / in-memory densify) reject or ignore io_backend — skip the
# backend cell there
NO_BACKEND_CELL = {"hdf5", "raw_csr"}


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    cache = {}

    def get(fmt):
        if fmt not in cache:
            tmp = tmp_path_factory.mktemp(f"matrix_{fmt}")
            cache[fmt] = MAKERS[fmt](tmp)
        return cache[fmt]

    return get


def _run_cell(lt_ctx, built, fmt, sync, roi_kind, corr_on, backend,
              label):
    if backend is not None and fmt in NO_BACKEND_CELL:
        pytest.skip("no byte-range io backend for this reader")
    if fmt == "k2is" and abs(sync) > 1:
        sync = int(np.sign(sync))  # only 4 frames
    loader, kwargs, flat = built(fmt)
    kwargs = dict(kwargs)
    n = len(flat)
    sig = flat.shape[1:]
    if sync:
        kwargs["sync_offset"] = sync
    if backend:
        from libertem_tpu.io.dataset.base import IOBackend
        kwargs["io_backend"] = IOBackend.from_json({"id": backend})
    ds = lt_ctx.load(loader, **kwargs)

    # expected stream after sync_offset (positive: skip leading
    # frames; negative: blank frames inserted at the start)
    expected = np.zeros_like(flat, dtype=np.float64)
    if sync >= 0:
        expected[:n - sync] = flat[sync:]
    else:
        expected[-sync:] = flat[:n + sync]

    roi = None
    if roi_kind == "sparse":
        roi = np.zeros(n, dtype=bool)
        roi[[1, n // 2, n - 2]] = True
    elif roi_kind == "single":
        roi = np.zeros(n, dtype=bool)
        roi[n // 2] = True
    elif roi_kind == "empty":
        roi = np.zeros(n, dtype=bool)
    elif roi_kind == "dense":
        rng = np.random.default_rng(3)
        roi = rng.random(n) > 0.45
    if roi is not None:
        expected = expected[roi]

    corrections = None
    rtol = 1e-6
    if corr_on:
        rng = np.random.default_rng(4)
        dark = rng.normal(2.0, 0.5, sig).astype(np.float32)
        gain = (1 + 0.1 * rng.random(sig)).astype(np.float32)
        corrections = CorrectionSet(dark=dark, gain=gain)
        expected = (expected - dark) * gain
        rtol = 1e-4

    udf = ValidationUDF(ref_flat=expected, rtol=rtol)
    res = lt_ctx.run_udf(ds, udf, roi=roi, corrections=corrections)
    seen = res["seen"].raw_data
    assert seen.shape[0] == len(expected), f"{fmt}/{label}"
    assert (seen == 1.0).all(), f"{fmt}/{label}: frames not validated"


@pytest.mark.parametrize("cell", sorted(CELLS))
@pytest.mark.parametrize("fmt", sorted(MAKERS))
def test_matrix(lt_ctx, built, fmt, cell):
    sync, roi_kind, corr_on, backend = CELLS[cell]
    _run_cell(
        lt_ctx, built, fmt, sync, roi_kind, corr_on, backend, cell
    )


# -- full cross product for representative formats -------------------
# The curated CELLS bend one axis per cell across ALL formats; here
# three representative readers (plain binary, chunked h5py, header-
# framed MIB) get the ENTIRE sync x roi x corrections x backend cube
# (the reference's per-format depth, tests/io/datasets/*).

FULL_FORMATS = ("raw", "hdf5", "mib")


@pytest.mark.parametrize("backend", (None, "mmap"))
@pytest.mark.parametrize("corr_on", (False, True))
@pytest.mark.parametrize("roi_kind", (None, "dense", "sparse"))
@pytest.mark.parametrize("sync", (-2, 0, 2))
@pytest.mark.parametrize("fmt", FULL_FORMATS)
def test_matrix_full_cross(lt_ctx, built, fmt, sync, roi_kind,
                           corr_on, backend):
    label = f"full:{sync}/{roi_kind}/{corr_on}/{backend}"
    _run_cell(
        lt_ctx, built, fmt, sync, roi_kind, corr_on, backend, label
    )


@pytest.mark.parametrize("nav", [(12,), (2, 6), (2, 2, 3)])
@pytest.mark.parametrize("fmt", sorted(MAKERS))
def test_matrix_reshape_nav(lt_ctx, built, fmt, nav):
    """nav_shape override reshapes the scan grid without changing
    the flat frame order (reference: every format's test_reshape —
    e.g. tests/io/datasets/test_seq.py)."""
    loader, kwargs, flat = built(fmt)
    if "nav_shape" not in kwargs:
        pytest.skip("nav shape comes from the file for this format")
    n = len(flat)
    if int(np.prod(nav)) != n:
        pytest.skip("fixture frame count mismatch")
    kwargs = dict(kwargs)
    kwargs["nav_shape"] = nav
    ds = lt_ctx.load(loader, **kwargs)
    assert tuple(ds.shape.nav) == nav
    udf = ValidationUDF(
        ref_flat=flat.astype(np.float64), rtol=1e-6
    )
    res = lt_ctx.run_udf(ds, udf)
    assert (res["seen"].raw_data == 1.0).all()
    # result buffers take the overridden nav shape
    from libertem_tpu.udf import SumSigUDF
    r2 = lt_ctx.run_udf(ds, SumSigUDF())
    assert r2["intensity"].data.shape == nav


SIG_OVERRIDE_FMTS = (
    "seq", "tvips", "blo", "empad", "frms6", "mib", "ser", "mrc",
    "dm", "k2is",
)


@pytest.mark.parametrize("fmt", SIG_OVERRIDE_FMTS)
def test_matrix_reshape_sig(lt_ctx, built, fmt):
    """sig_shape override re-factorizes the frame pixels row-major
    (reference semantics: 'sig_shape must be of size: N' on product
    mismatch, e.g. reference blo.py:174); the flat pixel stream is
    unchanged."""
    loader, kwargs, flat = built(fmt)
    n = len(flat)
    native = flat.shape[1:]
    n_pix = int(np.prod(native))
    # a flat 1D sig and a (2, n_pix // 2) re-factorization
    for sig in ((n_pix,), (2, n_pix // 2)):
        if int(np.prod(sig)) != n_pix:
            continue
        kw = dict(kwargs)
        kw["sig_shape"] = sig
        ds = lt_ctx.load(loader, **kw)
        assert tuple(ds.shape.sig) == sig
        udf = ValidationUDF(
            ref_flat=flat.reshape((n,) + sig).astype(np.float64),
            rtol=1e-6,
        )
        res = lt_ctx.run_udf(ds, udf)
        assert (res["seen"].raw_data == 1.0).all(), f"{fmt}/{sig}"
    # product mismatch is the reference's exact error
    from libertem_tpu.io.dataset.base import DataSetException
    kw = dict(kwargs)
    kw["sig_shape"] = (3, n_pix)
    with pytest.raises(DataSetException, match="sig_shape"):
        ds = lt_ctx.load(loader, **kw)
        ds.initialize()


@pytest.mark.parametrize("sync", [12, -12, 40])
@pytest.mark.parametrize("fmt", ["raw", "seq", "mib"])
def test_matrix_sync_offset_out_of_range(lt_ctx, built, fmt, sync):
    """|sync_offset| >= image_count is a configuration error, not a
    valid sync: loud DataSetException (reference:
    io/dataset/base/dataset.py:74 get_sync_offset_info)."""
    from libertem_tpu.io.dataset.base import DataSetException

    loader, kwargs, flat = built(fmt)
    kwargs = dict(kwargs)
    kwargs["sync_offset"] = sync
    with pytest.raises(DataSetException, match="sync_offset"):
        ds = lt_ctx.load(loader, **kwargs)
        # some loaders defer meta construction to initialize()
        ds.initialize()


@pytest.mark.parametrize("fmt", sorted(MAKERS))
def test_matrix_dataset_pickles_small(lt_ctx, built, fmt):
    """Datasets pickle (executors ship them to workers) and stay
    small — no file payload baked in (reference: each format's
    test_pickle asserts the same via pickle round trip)."""
    import pickle

    loader, kwargs, flat = built(fmt)
    ds = lt_ctx.load(loader, **kwargs)
    blob = pickle.dumps(ds)
    assert len(blob) < 512 * 1024, f"{fmt}: {len(blob)} bytes"
    ds2 = pickle.loads(blob)
    assert tuple(ds2.shape) == tuple(ds.shape)
    udf = ValidationUDF(
        ref_flat=flat.astype(np.float64), rtol=1e-6
    )
    res = lt_ctx.run_udf(ds2, udf)
    assert (res["seen"].raw_data == 1.0).all()


BIG_ENDIAN_DTYPES = (">u2", ">i2", ">u4", ">i4", ">f4", ">f8", ">u8")


@pytest.mark.parametrize("dt", BIG_ENDIAN_DTYPES)
def test_matrix_big_endian_raw(lt_ctx, tmp_path, dt):
    """Big-endian on-disk dtypes byteswap to native at the read
    boundary (reference: Decoder byteswap kernels,
    io/dataset/base/decode.py:8; here native/decode.cpp
    byteswap16/32 via Partition._to_sig)."""
    data = _mk_random(
        (6, 8, 8), dtype=np.dtype(dt).newbyteorder("=")
    ).astype(dt)
    path = str(tmp_path / "be.raw")
    data.tofile(path)
    ds = lt_ctx.load(
        "raw", path=path, dtype=dt,
        nav_shape=(2, 3), sig_shape=(8, 8),
    )
    assert ds.meta.native_dtype.isnative
    udf = ValidationUDF(ref_flat=data.astype(np.float64))
    res = lt_ctx.run_udf(ds, udf)
    assert (res["seen"].raw_data == 1.0).all()
    from libertem_tpu.udf import SumUDF
    r2 = lt_ctx.run_udf(ds, SumUDF())
    assert np.allclose(
        r2["intensity"].data, data.astype(np.float64).sum(axis=0),
        rtol=1e-5, atol=1e-4,
    )


def test_matrix_big_endian_npy(lt_ctx, tmp_path):
    data = _mk_random((2, 3, 8, 8), dtype="float32").astype(">f4")
    path = str(tmp_path / "be.npy")
    np.save(path, data)
    ds = lt_ctx.load("npy", path=path)
    udf = ValidationUDF(
        ref_flat=data.reshape(-1, 8, 8).astype(np.float64)
    )
    res = lt_ctx.run_udf(ds, udf)
    assert (res["seen"].raw_data == 1.0).all()


def test_matrix_big_endian_hdf5_sparse_roi(lt_ctx, tmp_path):
    """H5Partition.read_selected_frames (the sparse-roi selective
    read) must pass the same byteswap boundary as the dense path —
    big-endian H5 data reaching the device feed non-native raises in
    jax.device_put (round-3 review finding)."""
    import h5py

    from libertem_tpu.udf import SumUDF

    data = _mk_random((4, 4, 8, 8), dtype="uint16").astype(">u2")
    path = str(tmp_path / "be.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=data, dtype=">u2")
    ds = lt_ctx.load("hdf5", path=path, ds_path="data")
    flat64 = data.astype(np.float64).reshape(-1, 8, 8)
    # unit-level: the override must return NATIVE dtype (the base
    # default wraps each run in _to_sig; the H5 override must too)
    part = next(iter(ds.get_partitions()))
    sel = part.read_selected_frames(np.array([1, 11]))
    assert sel.dtype.isnative
    assert np.allclose(sel, flat64[[1, 11]])
    roi = np.zeros((4, 4), dtype=bool)
    # 2 selected out of a span of 11 -> valid*2 < hi-lo triggers the
    # selective-read fast path (io/dataset/base.py gen_blocks)
    roi[0, 1] = roi[2, 3] = True
    res = lt_ctx.run_udf(ds, SumUDF(), roi=roi)
    flat = data.astype(np.float64).reshape(-1, 8, 8)
    expected = flat[[1, 11]].sum(axis=0)
    assert np.allclose(res["intensity"].data, expected, rtol=1e-6)


def test_matrix_big_endian_raw_csr(lt_ctx, tmp_path):
    """The sparse CSR triple feed has no _to_sig boundary — vals must
    byteswap to native when assembled (round-3 review finding:
    big-endian data_dtype reached jax.device_put raw)."""
    from libertem_tpu.udf import SumUDF

    rng = np.random.default_rng(42)
    dense = (
        (rng.random((12, 64)) < 0.2)
        * rng.integers(1, 100, (12, 64))
    ).astype(np.int64)
    toml_path = fe.write_raw_csr(
        str(tmp_path), dense, nav=(3, 4), sig=(8, 8), dtype=">i4"
    )
    ds = lt_ctx.load("raw_csr", path=toml_path)
    assert ds.meta.native_dtype.isnative
    res = lt_ctx.run_udf(ds, SumUDF())
    assert np.allclose(
        res["intensity"].data,
        dense.astype(np.float64).sum(axis=0).reshape(8, 8),
        rtol=1e-6,
    )


def test_matrix_frms6_gain_sig_override(lt_ctx, tmp_path):
    """A user sig_shape re-factorization applies to the GAIN map the
    same way it applies to the dark frame (round-3 review finding:
    the unfolded-native gain shape tripped CorrectionSet.make_plan
    under an override)."""
    from libertem_tpu.io.dataset.frms6 import unfold
    from libertem_tpu.udf import SumUDF

    folded = _mk_random((12, 6, 16), dtype="uint16")
    fe.write_frms6(str(tmp_path / "acq_001.frms6"), folded)
    data = unfold(folded).astype(np.float64)  # (12, 12, 8) native
    gain = np.linspace(
        0.5, 2.0, data[0].size
    ).astype(np.float32).reshape(data.shape[1:])
    np.save(str(tmp_path / "gain.npy"), gain)
    flat_sig = (data.shape[1] * data.shape[2],)
    ds = lt_ctx.load(
        "frms6", path=str(tmp_path / "acq_001.frms6"),
        nav_shape=(3, 4), sig_shape=flat_sig,
        gain_map_path=str(tmp_path / "gain.npy"),
        enable_offset_correction=False,
    )
    res = lt_ctx.run_udf(ds, SumUDF())
    expected = (
        data.reshape(12, -1) * gain.astype(np.float64).reshape(-1)
    ).sum(axis=0)
    assert res["intensity"].data.shape == flat_sig
    assert np.allclose(res["intensity"].data, expected, rtol=1e-5)
