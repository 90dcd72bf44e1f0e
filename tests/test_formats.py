import os
import struct

import numpy as np
import pytest

from libertem_tpu.udf import PickUDF, SumSigUDF, SumUDF

from conftest import _mk_random


def _check_sum(lt_ctx, ds, flat_f32):
    res = lt_ctx.run_udf(ds, SumUDF())
    assert np.allclose(
        res["intensity"].data, flat_f32.sum(axis=0), rtol=1e-4
    )


def test_empad(lt_ctx, tmp_path):
    frames = _mk_random((4, 6, 128, 128), dtype="float32")
    flat = frames.reshape(-1, 128, 128)
    raw = np.zeros((24, 130, 128), dtype=np.float32)
    raw[:, :128, :] = flat
    raw_path = str(tmp_path / "scan.raw")
    raw.tofile(raw_path)
    xml_path = str(tmp_path / "scan.xml")
    with open(xml_path, "w") as f:
        f.write(
            '<root><raw_file filename="scan.raw"/>'
            '<type>scan</type>'
            '<scan_parameters mode="acquire">'
            "<scan_resolution_x>6</scan_resolution_x>"
            "<scan_resolution_y>4</scan_resolution_y>"
            "</scan_parameters></root>"
        )
    ds = lt_ctx.load("empad", path=xml_path)
    assert tuple(ds.shape) == (4, 6, 128, 128)
    _check_sum(lt_ctx, ds, flat)


def test_blo(lt_ctx, tmp_path):
    from libertem_tpu.io.dataset.blo import (
        FRAME_HEADER_BYTES, blo_header_dtype,
    )
    nav, dp = (3, 4), 16
    frames = _mk_random((12, dp, dp), dtype="uint8")
    hdr = np.zeros(1, dtype=blo_header_dtype())
    hdr["ID"] = b"IMGBLO"
    hdr["MAGIC"] = 258
    hdr["Data_offset_1"] = 1024
    hdr["Data_offset_2"] = 2048
    hdr["DP_SZ"] = dp
    hdr["NX"] = nav[1]
    hdr["NY"] = nav[0]
    path = str(tmp_path / "t.blo")
    with open(path, "wb") as f:
        f.write(hdr.tobytes().ljust(2048, b"\x00"))
        for fr in frames:
            f.write(b"\x00" * FRAME_HEADER_BYTES)
            f.write(fr.tobytes())
    ds = lt_ctx.load("blo", path=path)
    assert tuple(ds.shape) == (3, 4, 16, 16)
    _check_sum(lt_ctx, ds, frames.astype(np.float32))


def test_mrc(lt_ctx, tmp_path):
    frames = _mk_random((10, 20, 24), dtype="int16")
    path = str(tmp_path / "t.mrc")
    head = bytearray(1024)
    head[0:16] = struct.pack("<4i", 24, 20, 10, 1)
    head[92:96] = struct.pack("<i", 0)
    with open(path, "wb") as f:
        f.write(bytes(head))
        f.write(frames.astype("<i2").tobytes())
    ds = lt_ctx.load("mrc", path=path)
    assert tuple(ds.shape) == (10, 20, 24)
    _check_sum(lt_ctx, ds, frames.astype(np.float32))


from format_encoders import write_seq as _write_seq  # noqa: E402


def test_seq(lt_ctx, tmp_path):
    w, h, n = 16, 12, 9
    frames = _mk_random((n, h, w), dtype="uint16")
    path = str(tmp_path / "t.seq")
    _write_seq(path, frames)
    ds = lt_ctx.load("auto", path)
    assert tuple(ds.shape) == (9, 12, 16)
    _check_sum(lt_ctx, ds, frames.astype(np.float32))


def test_seq_xml_excluded_sidecars(lt_ctx, tmp_path):
    """The XML bad-pixel-map + binary metadata sidecar pair next to
    a .seq becomes the CorrectionSet's excluded-pixel mask
    (reference seq.py:557 _load_xml_from_file; the XML machinery
    itself is driven cell-by-cell by the reference's own
    tests/io/datasets/test_seq.py in the gate)."""
    import struct as _struct

    w, h, n = 16, 12, 6
    frames = _mk_random((n, h, w), dtype="uint16")
    path = str(tmp_path / "scan.seq")
    _write_seq(path, frames)
    xml = (
        '<?xml version="1.0"?><Configuration><BadPixels>'
        f'<BadPixelMap Rows="{h}" Columns="{w}">'
        '<Defect Row="3"/><Defect Columns="5-6"/>'
        '<Defect Row="1" Column="2"/>'
        "</BadPixelMap></BadPixels></Configuration>"
    )
    (tmp_path / "scan.seq.Config.Metadata.xml").write_text(xml)
    # binary geometry record: 11 int32 + bool at offset 282
    meta = bytearray(282) + _struct.pack(
        "iiiiiiiiiii?", 0, 1, w, h, 0, 0, 1, 16, 100, 0, 0, False
    )
    (tmp_path / "scan.seq.metadata").write_bytes(bytes(meta))

    ds = lt_ctx.load("seq", path=path)
    corr = ds.get_correction_data()
    got = np.zeros((h, w), dtype=bool)
    got[tuple(corr.excluded_coords.T)] = True
    expected = np.zeros((h, w), dtype=bool)
    expected[3] = True
    expected[:, 5:7] = True
    expected[1, 2] = True
    assert np.array_equal(got, expected)


def test_tvips(lt_ctx, tmp_path):
    w, h, n = 16, 14, 8
    frames = _mk_random((n, h, w), dtype="uint16")
    img_header = 12
    head = struct.pack(
        "<13i", 256, 2, w, h, 16, 0, 0, 1, 1, 10, 200, 1, img_header
    )
    path = str(tmp_path / "ser_000.tvips")
    with open(path, "wb") as f:
        f.write(head.ljust(256, b"\x00"))
        for fr in frames:
            f.write(b"\x00" * img_header)
            f.write(fr.astype("<u2").tobytes())
    ds = lt_ctx.load("tvips", path=path, nav_shape=(2, 4))
    assert tuple(ds.shape) == (2, 4, 14, 16)
    _check_sum(lt_ctx, ds, frames.astype(np.float32))


def test_raw_csr(lt_ctx, tmp_path):
    import scipy.sparse as sp
    rng = np.random.default_rng(9)
    n, sig = 12, (8, 9)
    dense = (
        rng.random((n, sig[0] * sig[1])) < 0.1
    ) * rng.integers(1, 100, (n, sig[0] * sig[1]))
    csr = sp.csr_matrix(dense.astype(np.int32))
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
            "nav_shape = [3, 4]\nsig_shape = [8, 9]\n\n"
            '[raw_csr]\nindptr_file = "rowind.dat"\n'
            'indptr_dtype = "<i4"\n'
            'indices_file = "coords.dat"\nindices_dtype = "<i4"\n'
            'data_file = "values.dat"\ndata_dtype = "<i4"\n'
        )
    ds = lt_ctx.load("raw_csr", path=toml_path)
    assert tuple(ds.shape) == (3, 4, 8, 9)
    flat = dense.reshape(n, 8, 9).astype(np.float32)
    _check_sum(lt_ctx, ds, flat)
    roi = np.zeros(12, dtype=bool)
    roi[[2, 7]] = True
    res = lt_ctx.run_udf(ds, PickUDF(), roi=roi)
    assert np.allclose(res["intensity"].data, dense.reshape(
        n, 8, 9
    )[[2, 7]])


def test_raw_csr_sparse_blocks(lt_ctx, tmp_path):
    """CSR blocks ship sparse (H2D scales with nnz) and densify
    on-device; numerics match the dense read path."""
    import scipy.sparse as sp
    from libertem_tpu.io.tiling import Negotiator
    rng = np.random.default_rng(21)
    n, sig = 40, (32, 32)
    n_pix = sig[0] * sig[1]
    dense = (
        (rng.random((n, n_pix)) < 0.03)
        * rng.integers(1, 50, (n, n_pix))
    ).astype(np.int32)
    csr = sp.csr_matrix(dense)
    (tmp_path / "rowind.dat").write_bytes(
        csr.indptr.astype("<i4").tobytes())
    (tmp_path / "coords.dat").write_bytes(
        csr.indices.astype("<i4").tobytes())
    (tmp_path / "values.dat").write_bytes(
        csr.data.astype("<i4").tobytes())
    toml_path = str(tmp_path / "s.toml")
    with open(toml_path, "w") as f:
        f.write(
            '[params]\nfiletype = "raw_csr"\n'
            "nav_shape = [8, 5]\nsig_shape = [32, 32]\n\n"
            '[raw_csr]\nindptr_file = "rowind.dat"\n'
            'indptr_dtype = "<i4"\n'
            'indices_file = "coords.dat"\nindices_dtype = "<i4"\n'
            'data_file = "values.dat"\ndata_dtype = "<i4"\n'
        )
    ds = lt_ctx.load("raw_csr", path=toml_path)
    part = next(ds.get_partitions())
    scheme = Negotiator().get_scheme(
        [SumUDF()], ds.shape, np.int32,
        max_partition_frames=part.num_frames,
    )
    blocks = list(part.gen_blocks(scheme))
    assert all(b.sparse is not None for b in blocks)
    # H2D volume: triple bytes << dense block bytes at 3% density
    b0 = blocks[0]
    triple_bytes = sum(a.nbytes for a in b0.sparse)
    dense_bytes = int(np.prod(b0.block_shape)) * 4
    assert triple_bytes < dense_bytes / 4, (triple_bytes, dense_bytes)
    # lazy host densify agrees with the dense reader
    got = b0.data[:b0.valid]
    expected = dense[:b0.valid].reshape(-1, *sig)
    assert np.array_equal(got, expected)
    # end-to-end numerics (device scatter-add path), with roi
    res = lt_ctx.run_udf(ds, SumUDF())
    assert np.allclose(
        res["intensity"].data,
        dense.astype(np.float64).sum(axis=0).reshape(sig), rtol=1e-5,
    )
    roi = np.zeros(n, dtype=bool)
    roi[rng.choice(n, 11, replace=False)] = True
    res2 = lt_ctx.run_udf(ds, SumUDF(), roi=roi)
    assert np.allclose(
        res2["intensity"].data,
        dense[roi].astype(np.float64).sum(axis=0).reshape(sig),
        rtol=1e-5,
    )


def test_hdf5_3d_nav_and_3d_sig(lt_ctx, tmp_path):
    """nD nav (3 nav dims) and sig_dims != 2 through the HDF5 path
    (the reference supports arbitrary nav/sig splits, hdf5.py:224)."""
    import h5py
    rng = np.random.default_rng(4)
    # 5D: (3, 4, 5) nav x (6, 7) sig
    data = rng.random((3, 4, 5, 6, 7)).astype(np.float32)
    path = str(tmp_path / "nd.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("g/data5", data=data)
    ds = lt_ctx.load("hdf5", path=path, ds_path="g/data5")
    assert tuple(ds.shape) == (3, 4, 5, 6, 7)
    res = lt_ctx.run_udf(ds, SumUDF())
    assert np.allclose(
        res["intensity"].data,
        data.reshape(-1, 6, 7).astype(np.float64).sum(axis=0),
        rtol=1e-5,
    )
    # sig_dims=3: (4, 5) nav x (3, 6, 7) sig
    with h5py.File(path, "a") as f:
        f.create_dataset("sig3", data=data.reshape(4, 5, 3, 6, 7))
    ds3 = lt_ctx.load("hdf5", path=path, ds_path="sig3", sig_dims=3)
    assert tuple(ds3.shape.sig) == (3, 6, 7)
    res3 = lt_ctx.run_udf(ds3, SumSigUDF())
    expected = data.reshape(20, -1).astype(np.float64).sum(axis=1)
    assert np.allclose(
        res3["intensity"].data.reshape(-1), expected, rtol=1e-5,
    )


def test_mib_multifile_acquisition(lt_ctx, tmp_path):
    """Multi-file MIB acquisitions (one .hdr + N numbered .mib files)
    stitch into one dataset in file order."""
    rng = np.random.default_rng(6)
    flat = rng.integers(0, 4096, (12, 8, 8)).astype(np.uint16)
    hb = 384
    # 3 files x 4 frames
    for fi in range(3):
        with open(tmp_path / f"acq_{fi + 1:02d}.mib", "wb") as f:
            for i in range(4):
                head = (
                    f"MQ1,{fi * 4 + i + 1},{hb},1,8,8,U16,1x1,2x2,12"
                ).encode()
                f.write(head.ljust(hb, b"\x00"))
                f.write(flat[fi * 4 + i].astype(">u2").tobytes())
    hdr = tmp_path / "acq_.hdr"
    hdr.write_text(
        "HDR,\nFrames in Acquisition (Number):\t12\n"
        "Frames per Trigger (Number):\t4\nEnd\t\n"
    )
    ds = lt_ctx.load("mib", path=str(hdr))
    assert tuple(ds.shape) == (3, 4, 8, 8)
    roi = np.zeros(12, dtype=bool)
    roi[[0, 5, 11]] = True  # one frame from each file
    res = lt_ctx.run_udf(ds, PickUDF(), roi=roi)
    assert np.array_equal(res["intensity"].data, flat[[0, 5, 11]])

    # opening ONE chunk by its .mib path collects the numbered
    # siblings (reference mib.py:110 _pattern: the trailing counter
    # is stripped and globbed); disable_glob opts out
    ds2 = lt_ctx.load(
        "mib", path=str(tmp_path / "acq_01.mib"), nav_shape=(3, 4)
    )
    assert tuple(ds2.shape) == (3, 4, 8, 8)
    r2 = lt_ctx.run_udf(ds2, PickUDF(), roi=roi)
    assert np.array_equal(r2["intensity"].data, flat[[0, 5, 11]])
    ds3 = lt_ctx.load(
        "mib", path=str(tmp_path / "acq_01.mib"),
        disable_glob=True, nav_shape=(4,),
    )
    assert tuple(ds3.shape) == (4, 8, 8)


def test_raw_csr_sync_offset_sparse_path(lt_ctx, tmp_path):
    """The sparse device path honors sync_offset + zero-fill exactly
    like the dense reader (regression: review finding)."""
    import scipy.sparse as sp
    rng = np.random.default_rng(30)
    n, sig = 12, (8, 8)
    dense = (
        (rng.random((n, 64)) < 0.2) * rng.integers(1, 50, (n, 64))
    ).astype(np.int32)
    csr = sp.csr_matrix(dense)
    (tmp_path / "rowind.dat").write_bytes(
        csr.indptr.astype("<i4").tobytes())
    (tmp_path / "coords.dat").write_bytes(
        csr.indices.astype("<i4").tobytes())
    (tmp_path / "values.dat").write_bytes(
        csr.data.astype("<i4").tobytes())
    toml_path = str(tmp_path / "s.toml")
    with open(toml_path, "w") as f:
        f.write(
            '[params]\nfiletype = "raw_csr"\n'
            "nav_shape = [3, 4]\nsig_shape = [8, 8]\n\n"
            '[raw_csr]\nindptr_file = "rowind.dat"\n'
            'indptr_dtype = "<i4"\n'
            'indices_file = "coords.dat"\nindices_dtype = "<i4"\n'
            'data_file = "values.dat"\ndata_dtype = "<i4"\n'
        )
    for off in (2, -2):
        ds = lt_ctx.load("raw_csr", path=toml_path, sync_offset=off)
        res = lt_ctx.run_udf(ds, SumUDF())
        # expected: dataset frame i = stored frame i+off, zero-filled
        # outside [0, n)
        shifted = np.zeros((n, 64), np.float64)
        for i in range(n):
            sid = i + off
            if 0 <= sid < n:
                shifted[i] = dense[sid]
        assert np.allclose(
            res["intensity"].data,
            shifted.sum(axis=0).reshape(sig), rtol=1e-6,
        ), off


def test_h5_sparse_roi_with_sync_offset(lt_ctx, tmp_path):
    """The HDF5 sparse-roi fast path honors sync_offset (regression:
    review finding — it used to index the file unshifted)."""
    import h5py
    data = _mk_random((20, 1, 8, 8), dtype="float32")
    path = str(tmp_path / "so.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=data)
    from libertem_tpu.udf import PickUDF
    ds = lt_ctx.load("hdf5", path=path, sync_offset=2)
    flat = data.reshape(-1, 8, 8)
    roi = np.zeros(20, dtype=bool)
    roi[[1, 5, 17, 19]] = True  # sparse; 19+2 out of range -> zeros
    res = lt_ctx.run_udf(ds, PickUDF(), roi=roi)
    got = np.asarray(res["intensity"].data)
    assert np.array_equal(got[0], flat[3])
    assert np.array_equal(got[1], flat[7])
    assert np.array_equal(got[2], flat[19])
    assert not got[3].any()  # zero-filled past the end


def test_mib_multifile_sequence_order(lt_ctx, tmp_path):
    """Acquisition order comes from the header sequence number, not
    the filename sort: scan10.mib must come AFTER scan2.mib
    (reference mib.py:130-147), and ScanX/ScanY in the .hdr beats the
    frames-per-trigger derivation."""
    rng = np.random.default_rng(7)
    flat = rng.integers(0, 4096, (12, 8, 8)).astype(np.uint16)
    hb = 384
    # 12 frames over files named so lexicographic order is wrong:
    # scan1(seq 1-4), scan10(seq 9-12), scan2(seq 5-8)
    layout = [("scan1.mib", 0), ("scan2.mib", 4), ("scan10.mib", 8)]
    for name, first in layout:
        with open(tmp_path / name, "wb") as f:
            for i in range(4):
                head = (
                    f"MQ1,{first + i + 1},{hb},1,8,8,U16,1x1,2x2,12"
                ).encode()
                f.write(head.ljust(hb, b"\x00"))
                f.write(flat[first + i].astype(">u2").tobytes())
    hdr = tmp_path / "scan.hdr"
    hdr.write_text(
        "HDR,\nFrames in Acquisition (Number):\t12\n"
        "Frames per Trigger (Number):\t12\n"
        "ScanX:\t4\nScanY:\t3\nEnd\t\n"
    )
    ds = lt_ctx.load("mib", path=str(hdr))
    # ScanX/ScanY win over the 1D frames-per-trigger fallback
    assert tuple(ds.shape) == (3, 4, 8, 8)
    roi = np.zeros(12, dtype=bool)
    roi[[0, 5, 11]] = True
    res = lt_ctx.run_udf(ds, PickUDF(), roi=roi)
    assert np.array_equal(res["intensity"].data, flat[[0, 5, 11]])
