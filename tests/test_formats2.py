import os
import struct

import numpy as np
import pytest

from libertem_tpu.udf import SumUDF

from conftest import _mk_random


def _write_ser(path, frames):
    """Minimal SER writer (version 0x0220, 2D elements)."""
    n, h, w = frames.shape
    dtype_code = 2  # uint16
    head = struct.pack(
        "<hhhiiii", 0x4949, 0x0197, 0x0220, 0x4122, 0x4152, n, n
    )
    # header(22) + offset_array_offset(8) + ndims(4) = 34; dims record
    dim_record = struct.pack("<i", n) + struct.pack(
        "<ddi", 0.0, 1.0, 0
    ) + struct.pack("<i", 0) + struct.pack("<i", 0)
    data_start = 34 + len(dim_record)
    elem_bytes = 50 + h * w * 2
    offsets = [data_start + 16 * n + i * elem_bytes for i in range(n)]
    with open(path, "wb") as f:
        f.write(head)
        f.write(struct.pack("<qi", data_start, 1))
        f.write(dim_record)
        f.write(np.array(offsets, dtype="<i8").tobytes())
        f.write(np.zeros(n, dtype="<i8").tobytes())  # tag offsets
        for fr in frames:
            f.write(struct.pack("<ddi", 0.0, 1.0, 0))
            f.write(struct.pack("<ddi", 0.0, 1.0, 0))
            f.write(struct.pack("<hii", dtype_code, w, h))
            f.write(fr.astype("<u2").tobytes())


def test_ser(lt_ctx, tmp_path):
    frames = _mk_random((6, 10, 12), dtype="uint16")
    path = str(tmp_path / "t.ser")
    _write_ser(path, frames)
    ds = lt_ctx.load("ser", path=path, nav_shape=(2, 3))
    assert tuple(ds.shape) == (2, 3, 10, 12)
    res = lt_ctx.run_udf(ds, SumUDF())
    assert np.allclose(
        res["intensity"].data,
        frames.astype(np.float32).sum(axis=0), rtol=1e-4,
    )


def _write_dm4(path, data, thumbnail=None):
    """Minimal DM4 writer: root group with ImageList entries holding
    ImageData.Data (array) and Dimensions; optional 2D thumbnail as
    ImageList.0 like real DM files."""
    import io

    def tag_data_simple(name, value, code, fmt, size):
        payload = b"%%%%" + struct.pack(">q", 1) + struct.pack(
            ">q", code
        ) + struct.pack("<" + fmt, value)
        return (
            bytes([0x15]) + struct.pack(">h", len(name))
            + name.encode() + struct.pack(">q", len(payload))
            + payload
        )

    def tag_data_array(name, arr, code, npdtype):
        body = arr.astype(npdtype).tobytes()
        payload = b"%%%%" + struct.pack(">q", 3) + struct.pack(
            ">qqq", 20, code, arr.size
        ) + body
        return (
            bytes([0x15]) + struct.pack(">h", len(name))
            + name.encode() + struct.pack(">q", len(payload))
            + payload
        )

    def tag_group(name, children):
        inner = bytes([1, 0]) + struct.pack(">q", len(children))
        inner += b"".join(children)
        return (
            bytes([0x14]) + struct.pack(">h", len(name))
            + name.encode() + struct.pack(">q", len(inner)) + inner
        )

    def image_entry(idx, arr):
        dim_tags = [
            tag_data_simple(str(d), s, 3, "i", 4)
            for d, s in enumerate(reversed(arr.shape))
        ]
        image_data = tag_group("ImageData", [
            tag_data_array("Data", arr.reshape(-1), 4, "<u2"),
            tag_group("Dimensions", dim_tags),
        ])
        return tag_group(str(idx), [image_data])

    entries = []
    if thumbnail is not None:
        # real DM files store a thumbnail as ImageList.0
        entries.append(image_entry(0, thumbnail))
    entries.append(image_entry(len(entries), data))
    image_list = tag_group("ImageList", entries)
    root_children = [image_list]
    root = bytes([1, 0]) + struct.pack(
        ">q", len(root_children)
    ) + b"".join(root_children)
    with open(path, "wb") as f:
        f.write(struct.pack(">i", 4))
        f.write(struct.pack(">q", len(root)))
        f.write(struct.pack(">i", 1))  # little-endian data
        f.write(root)


def test_dm4(lt_ctx, tmp_path):
    data = _mk_random((12, 8, 10), dtype="uint16")
    path = str(tmp_path / "t.dm4")
    _write_dm4(path, data)
    ds = lt_ctx.load("dm", path=path, nav_shape=(3, 4))
    assert tuple(ds.shape) == (3, 4, 8, 10)
    res = lt_ctx.run_udf(ds, SumUDF())
    assert np.allclose(
        res["intensity"].data,
        data.astype(np.float32).sum(axis=0), rtol=1e-4,
    )


def _write_frms6(path, folded_frames, num_frames_field=None):
    n, h, w = folded_frames.shape
    head = bytearray(1024)
    head[0:4] = struct.pack("<HH", 1024, 64)
    head[7] = 6
    head[88:92] = struct.pack("<HH", w, h)
    head[1020:1024] = struct.pack(
        "<I", num_frames_field if num_frames_field is not None else n
    )
    with open(path, "wb") as f:
        f.write(bytes(head))
        for fr in folded_frames:
            f.write(b"\x00" * 64)
            f.write(fr.astype("<u2").tobytes())


def test_frms6(lt_ctx, tmp_path):
    from libertem_tpu.io.dataset.frms6 import unfold
    rng = np.random.default_rng(3)
    # stored folded frames: (h=6, w=16) -> unfolded (12, 8)
    dark = rng.integers(0, 50, (2, 6, 16)).astype(np.uint16)
    data = rng.integers(100, 1000, (12, 6, 16)).astype(np.uint16)
    _write_frms6(str(tmp_path / "acq_000.frms6"), dark)
    _write_frms6(str(tmp_path / "acq_001.frms6"), data)
    ds = lt_ctx.load(
        "frms6", path=str(tmp_path / "acq_001.frms6"),
        nav_shape=(3, 4),
    )
    assert tuple(ds.shape) == (3, 4, 12, 8)
    res = lt_ctx.run_udf(ds, SumUDF())
    unfolded = unfold(data).astype(np.float64)
    dark_mean = unfold(dark).astype(np.float64).mean(axis=0)
    expected = (unfolded - dark_mean).sum(axis=0)
    assert np.allclose(
        res["intensity"].data, expected, rtol=1e-3, atol=1e-2
    )


def test_convert_transposed(tmp_path):
    from libertem_tpu.contrib.convert_transposed import (
        convert_transposed_to_npy,
    )
    rng = np.random.default_rng(4)
    nav, sig = (3, 4), (5, 6)
    c_order = rng.random(nav + sig).astype(np.float32)
    transposed = np.moveaxis(
        c_order.reshape(12, 30), 0, 1
    )  # (sig_flat, nav_flat)
    src = str(tmp_path / "transposed.bin")
    np.ascontiguousarray(transposed).tofile(src)
    out = str(tmp_path / "converted.npy")
    convert_transposed_to_npy(
        src, out, nav_shape=nav, sig_shape=sig, dtype=np.float32
    )
    assert np.array_equal(np.load(out), c_order)


def test_dm_stack(lt_ctx, tmp_path):
    """Stack of single-frame DM4 files via files=[...]."""
    frames = _mk_random((6, 8, 10), dtype="uint16")
    paths = []
    for i, fr in enumerate(frames):
        p = str(tmp_path / f"frame_{i:03d}.dm4")
        _write_dm4(p, fr[None])
        paths.append(p)
    ds = lt_ctx.load("dm", files=paths, nav_shape=(2, 3))
    assert tuple(ds.shape) == (2, 3, 8, 10)
    res = lt_ctx.run_udf(ds, SumUDF())
    assert np.allclose(
        res["intensity"].data,
        frames.astype(np.float32).sum(axis=0), rtol=1e-4,
    )


def _write_dm3(path, data):
    """Minimal DM3 writer (4-byte lengths, no per-tag byte counts)."""
    def tag_data_simple(name, value, code):
        payload = b"%%%%" + struct.pack(">i", 1) + struct.pack(
            ">i", code
        ) + struct.pack("<i", value)
        return (
            bytes([0x15]) + struct.pack(">h", len(name))
            + name.encode() + payload
        )

    def tag_data_array(name, arr, code, npdtype):
        body = arr.astype(npdtype).tobytes()
        payload = b"%%%%" + struct.pack(">i", 3) + struct.pack(
            ">iii", 20, code, arr.size
        ) + body
        return (
            bytes([0x15]) + struct.pack(">h", len(name))
            + name.encode() + payload
        )

    def tag_group(name, children):
        inner = bytes([1, 0]) + struct.pack(">i", len(children))
        inner += b"".join(children)
        return (
            bytes([0x14]) + struct.pack(">h", len(name))
            + name.encode() + inner
        )

    n, h, w = data.shape
    dims = tag_group("Dimensions", [
        tag_data_simple("0", w, 3),
        tag_data_simple("1", h, 3),
        tag_data_simple("2", n, 3),
    ])
    image_data = tag_group("ImageData", [
        tag_data_array("Data", data.reshape(-1), 4, "<u2"),
        dims,
    ])
    image_list = tag_group("ImageList", [tag_group("0", [image_data])])
    root = bytes([1, 0]) + struct.pack(">i", 1) + image_list
    with open(path, "wb") as f:
        f.write(struct.pack(">i", 3))
        f.write(struct.pack(">i", len(root)))
        f.write(struct.pack(">i", 1))
        f.write(root)


def test_dm3(lt_ctx, tmp_path):
    data = _mk_random((6, 9, 11), dtype="uint16")
    path = str(tmp_path / "t.dm3")
    _write_dm3(path, data)
    ds = lt_ctx.load("dm", path=path, nav_shape=(2, 3))
    assert tuple(ds.shape) == (2, 3, 9, 11)
    res = lt_ctx.run_udf(ds, SumUDF())
    assert np.allclose(
        res["intensity"].data,
        data.astype(np.float32).sum(axis=0), rtol=1e-4,
    )


def test_autodetect_matrix(lt_ctx, tmp_path):
    """detect() identifies every self-describing format from its file
    alone (reference io/dataset/__init__.py:223 runs detect_params in
    extension-priority order)."""
    from libertem_tpu.io.dataset import detect

    rng = np.random.default_rng(9)

    # SER
    ser_frames = rng.integers(0, 65535, (4, 6, 8)).astype("<u2")
    ser_path = str(tmp_path / "a.ser")
    _write_ser(ser_path, ser_frames)

    # DM4
    dm_path = str(tmp_path / "a.dm4")
    _write_dm4(dm_path, rng.random((4, 6, 6)).astype(np.float32))

    # DM3
    dm3_path = str(tmp_path / "a.dm3")
    _write_dm3(dm3_path, rng.random((3, 5, 5)).astype(np.float32))

    # FRMS6 (needs the _000.frms6 dark sidecar convention)
    from test_formats import _write_seq
    seq_path = str(tmp_path / "a.seq")
    _write_seq(
        seq_path, rng.integers(0, 65535, (6, 8, 12)).astype("<u2")
    )

    # MRC
    import struct as _struct
    mrc_path = str(tmp_path / "a.mrc")
    head = bytearray(1024)
    head[0:16] = _struct.pack("<4i", 12, 8, 4, 1)
    with open(mrc_path, "wb") as f:
        f.write(bytes(head))
        f.write(
            rng.integers(-100, 100, (4, 8, 12)).astype("<i2")
            .tobytes()
        )

    # NPY
    npy_path = str(tmp_path / "a.npy")
    np.save(npy_path, rng.random((2, 3, 6, 6)).astype(np.float32))

    expected = {
        ser_path: "ser",
        dm_path: "dm",
        dm3_path: "dm",
        seq_path: "seq",
        mrc_path: "mrc",
        npy_path: "npy",
    }
    for path, want in expected.items():
        params = detect(path)
        assert params is not None, path
        assert params["type"].lower() == want, (path, params)


def test_dm_nav_shape_larger_than_file(lt_ctx):
    """image_count reflects the frames actually stored, so a larger
    user nav_shape (or sync_offset) zero-fills missing frames instead
    of reading trailing tag bytes as pixel data."""
    import tempfile, os as _os
    data = _mk_random((4, 6, 6), dtype="uint16")  # 4 stored frames
    path = tempfile.mktemp(suffix=".dm4")
    _write_dm4(path, data)
    try:
        ds = lt_ctx.load("dm", path=path, nav_shape=(2, 3))  # 6 > 4
        assert ds.meta.image_count == 4
        from libertem_tpu.udf import SumSigUDF
        res = lt_ctx.run_udf(ds, SumSigUDF())
        got = np.asarray(res["intensity"].data).reshape(-1)
        expected = np.zeros(6, dtype=np.float64)
        expected[:4] = data.reshape(4, -1).sum(axis=1)
        assert np.allclose(got, expected, rtol=1e-4)
    finally:
        _os.unlink(path)


def test_mrc_truncated_stack_zero_fills(lt_ctx, tmp_path):
    from libertem_tpu.udf import SumSigUDF
    """A truncated .mrc (header nz > frames on disk) clamps
    image_count and zero-fills the missing frames instead of
    short-read-erroring mid-run."""
    frames = np.arange(6 * 4 * 4, dtype=np.int16).reshape(6, 4, 4)
    path = str(tmp_path / "t.mrc")
    head = bytearray(1024)
    head[0:16] = struct.pack("<4i", 4, 4, 6, 1)
    head[92:96] = struct.pack("<i", 0)
    with open(path, "wb") as f:
        f.write(bytes(head))
        f.write(frames.astype("<i2").tobytes())
    # cut the last two frames off
    full = os.path.getsize(path)
    with open(path, "r+b") as f:
        f.truncate(full - 2 * 4 * 4 * 2)
    ds = lt_ctx.load("mrc", path=path)
    assert ds.meta.image_count == 4
    res = lt_ctx.run_udf(ds, SumSigUDF())
    got = np.asarray(res["intensity"].data).reshape(-1)
    expected = frames.reshape(6, -1).sum(axis=1).astype(np.float64)
    expected[4:] = 0.0
    assert np.allclose(got, expected)


def test_header_only_file_zero_fills(lt_ctx, tmp_path):
    """image_count == 0 (acquisition not yet writing frames) is
    preserved — not silently reset to nav.size — so every frame
    zero-fills."""
    path = str(tmp_path / "empty.raw")
    open(path, "wb").close()
    ds = lt_ctx.load(
        "raw", path=path, dtype="uint16",
        nav_shape=(2, 3), sig_shape=(4, 4),
    )
    assert ds.meta.image_count == 0
    from libertem_tpu.udf import SumSigUDF
    res = lt_ctx.run_udf(ds, SumSigUDF())
    assert np.allclose(
        np.asarray(res["intensity"].data).reshape(-1), 0.0
    )


def test_dm4_dataset_index(lt_ctx, tmp_path):
    """dataset_index selects among a DM file's ImageList entries
    (reference dm_single.py:86); the default picks the LARGEST data
    array, skipping the ImageList.0 thumbnail."""
    data = _mk_random((12, 8, 10), dtype="uint16")
    thumb = _mk_random((4, 5), dtype="uint16")
    path = str(tmp_path / "t2.dm4")
    _write_dm4(path, data, thumbnail=thumb)
    # default: main stack, not the thumbnail
    ds = lt_ctx.load("dm", path=path, nav_shape=(3, 4))
    assert tuple(ds.shape) == (3, 4, 8, 10)
    res = lt_ctx.run_udf(ds, SumUDF())
    assert np.allclose(
        res["intensity"].data,
        data.astype(np.float64).sum(axis=0), rtol=1e-5,
    )
    # explicit index 1 = the main stack too
    ds1 = lt_ctx.load("dm", path=path, nav_shape=(3, 4),
                      dataset_index=1)
    assert tuple(ds1.shape) == (3, 4, 8, 10)
    # index 0 = the thumbnail (2D -> 1-frame stack with sig (4, 5))
    ds0 = lt_ctx.load("dm", path=path, dataset_index=0,
                      sig_dims=2, nav_shape=(1,))
    assert tuple(ds0.shape.sig) == (4, 5)
    r0 = lt_ctx.run_udf(ds0, SumUDF())
    assert np.allclose(
        r0["intensity"].data, thumb.astype(np.float64), rtol=1e-6
    )
    # out of range errors loudly
    with pytest.raises(Exception, match="dataset_index"):
        lt_ctx.load("dm", path=path, dataset_index=5)


def test_dm_stack_compat_kwargs(lt_ctx, tmp_path):
    """StackedDMDataSet accepts the reference's scan_size (deprecated
    alias of nav_shape) and same_offset (parse the first file only,
    reference dm.py:200)."""
    frames = _mk_random((4, 8, 10), dtype="uint16")
    paths = []
    for i in range(4):
        p = str(tmp_path / f"s{i}.dm4")
        _write_dm4(p, frames[i:i + 1])
        paths.append(p)
    with pytest.warns(FutureWarning, match="scan_size"):
        ds = lt_ctx.load(
            "dm", files=paths, scan_size=(2, 2), same_offset=True,
        )
    assert tuple(ds.shape) == (2, 2, 8, 10)
    res = lt_ctx.run_udf(ds, SumUDF())
    assert np.allclose(
        res["intensity"].data,
        frames.astype(np.float64).sum(axis=0), rtol=1e-5,
    )


def test_loader_deprecated_kwargs(lt_ctx, tmp_path):
    """Deprecated reference kwargs are accepted with warnings:
    raw tileshape/enable_direct/crop_detector_to, hdf5 target_size."""
    import h5py

    data = _mk_random((8, 8, 8), dtype="float32")
    praw = str(tmp_path / "d.raw")
    data.tofile(praw)
    with pytest.warns(FutureWarning, match="tileshape"):
        ds = lt_ctx.load(
            "raw", path=praw, dtype="float32", nav_shape=(8,),
            sig_shape=(8, 8), tileshape=(1, 8, 8),
        )
    assert tuple(ds.shape) == (8, 8, 8)
    with pytest.warns(FutureWarning, match="crop_detector_to"):
        ds2 = lt_ctx.load(
            "raw", path=praw, dtype="float32", nav_shape=(8,),
            crop_detector_to=(8, 8),
        )
    assert tuple(ds2.shape.sig) == (8, 8)
    with pytest.raises(ValueError, match="cropping"):
        lt_ctx.load(
            "raw", path=praw, dtype="float32", nav_shape=(8,),
            detector_size_raw=(16, 16), crop_detector_to=(8, 8),
        )
    with pytest.warns(FutureWarning, match="enable_direct"):
        try:
            ds3 = lt_ctx.load(
                "raw", path=praw, dtype="float32", nav_shape=(8,),
                sig_shape=(8, 8), enable_direct=True,
            )
            r = lt_ctx.run_udf(ds3, SumUDF())
            assert np.allclose(
                r["intensity"].data,
                data.astype(np.float64).sum(axis=0),
                rtol=1e-4, atol=1e-4,
            )
        except OSError:
            pass  # O_DIRECT unsupported on this filesystem

    ph5 = str(tmp_path / "d.h5")
    with h5py.File(ph5, "w") as f:
        f.create_dataset("data", data=data)
    # tiny target size -> every frame its own partition
    ds4 = lt_ctx.load("hdf5", path=ph5, ds_path="data",
                      target_size=8 * 8 * 4)
    assert ds4.get_num_partitions() == 8
    ds5 = lt_ctx.load("hdf5", path=ph5, ds_path="data",
                      min_num_partitions=4)
    assert ds5.get_num_partitions() >= 4
