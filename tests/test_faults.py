"""Fault injection: corrupt headers and truncated files fail cleanly
with DataSetException (SURVEY §5 failure-detection review line)."""
import numpy as np
import pytest

from libertem_tpu.io.dataset.base import DataSetException

from conftest import _mk_random


def test_mib_corrupt_magic(lt_ctx, tmp_path):
    path = str(tmp_path / "bad.mib")
    with open(path, "wb") as f:
        f.write(b"NOTMIB,1,384,1,16,16,U16,1x1,2x2,12" + b"\x00" * 800)
    with pytest.raises(DataSetException):
        lt_ctx.load("mib", path=path)


def test_seq_corrupt_magic(lt_ctx, tmp_path):
    path = str(tmp_path / "bad.seq")
    with open(path, "wb") as f:
        f.write(b"\x00" * 9000)
    with pytest.raises(DataSetException):
        lt_ctx.load("seq", path=path)


def test_blo_bad_magic(lt_ctx, tmp_path):
    from libertem_tpu.io.dataset.blo import blo_header_dtype
    hdr = np.zeros(1, dtype=blo_header_dtype())
    hdr["MAGIC"] = 999
    path = str(tmp_path / "bad.blo")
    with open(path, "wb") as f:
        f.write(hdr.tobytes().ljust(2048, b"\x00"))
    with pytest.raises(DataSetException):
        lt_ctx.load("blo", path=path)


def test_raw_wrong_size(lt_ctx, tmp_path):
    # Reference contract (raw.py image_count;
    # test_raw.py::test_extra_data_at_the_end, in the gate): trailing
    # bytes that don't fill a frame are cut off, NOT an error...
    path = str(tmp_path / "bad.raw")
    with open(path, "wb") as f:
        f.write(b"\x00" * 1001)  # 7 full 128-byte frames + 105 extra
    ds = lt_ctx.load(
        "raw", path=path, dtype="uint16",
        nav_shape=(2, 2), sig_shape=(8, 8),
    )
    assert ds.meta.image_count == 7

    # ...but a frame that can't fit in the file at all IS detected
    # (reference wording, test_raw.py::test_too_large_sig_shape)
    small = str(tmp_path / "small.raw")
    with open(small, "wb") as f:
        f.write(b"\x00" * 10)  # 5 uint16 items < 64-item sig frame
    with pytest.raises(DataSetException):
        lt_ctx.load(
            "raw", path=small, dtype="uint16",
            nav_shape=(2, 2), sig_shape=(8, 8),
        )


def test_mrc_truncated(lt_ctx, tmp_path):
    path = str(tmp_path / "bad.mrc")
    with open(path, "wb") as f:
        f.write(b"\x00" * 100)  # shorter than the 1024-byte header
    with pytest.raises(DataSetException):
        lt_ctx.load("mrc", path=path)


def test_dm_not_dm(lt_ctx, tmp_path):
    path = str(tmp_path / "bad.dm4")
    with open(path, "wb") as f:
        f.write(b"\x00" * 64)
    with pytest.raises(DataSetException):
        lt_ctx.load("dm", path=path)


def test_ser_bad(lt_ctx, tmp_path):
    path = str(tmp_path / "bad.ser")
    with open(path, "wb") as f:
        f.write(b"\xff" * 64)
    with pytest.raises(DataSetException):
        lt_ctx.load("ser", path=path)


def test_run_udf_iter_async(lt_ctx):
    import asyncio
    from libertem_tpu.io.dataset.memory import MemoryDataSet
    from libertem_tpu.udf import SumSigUDF
    data = _mk_random((4, 4, 8, 8), dtype="float32")
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=2
    ).initialize()

    async def go():
        parts = []
        async for partial in lt_ctx.run_udf_iter_async(
            ds, SumSigUDF()
        ):
            parts.append(partial)
        return parts

    parts = asyncio.run(go())
    assert len(parts) == 2
    assert np.allclose(
        parts[-1].buffers[0]["intensity"].data,
        data.sum(axis=(2, 3)), rtol=1e-4,
    )


def test_mib_truncated_mid_frame(lt_ctx, tmp_path):
    """A file cut off mid-payload: the trailing partial frame is
    dropped (frame count floors); the remaining frames read exactly."""
    from libertem_tpu.udf import PickUDF
    rng = np.random.default_rng(8)
    frames = rng.integers(0, 4096, (10, 16, 16)).astype(np.uint16)
    path = str(tmp_path / "trunc.mib")
    hb = 384
    with open(path, "wb") as f:
        for i, fr in enumerate(frames):
            f.write(
                f"MQ1,{i+1},{hb},1,16,16,U16,1x1,2x2,12"
                .encode().ljust(hb, b"\x00")
            )
            f.write(fr.astype(">u2").tobytes())
    with open(path, "rb+") as f:
        f.truncate(10 * (hb + 512) - 100)  # cut into frame 10's payload
    ds = lt_ctx.load("mib", path=path, nav_shape=(9,))
    assert ds.meta.image_count == 9
    roi = np.zeros(9, dtype=bool)
    roi[[0, 8]] = True
    res = lt_ctx.run_udf(ds, PickUDF(), roi=roi)
    assert np.array_equal(res["intensity"].data, frames[[0, 8]])


def test_k2is_corrupt_block_header(lt_ctx, tmp_path):
    """A corrupted sync magic mid-file: the affected FRAME is dropped
    entirely (complete-frame policy — a frame is only kept when all
    sectors contribute all blocks), the run completes, and no garbage
    pixels leak."""
    from test_k2is import _block_header, _pack_uint12_le
    from libertem_tpu.io.dataset.k2is import (
        BLOCK_SHAPE, BLOCK_SIZE, DATA_SIZE, HEADER_SIZE, NUM_SECTORS,
        SECTOR_SIZE,
    )
    from libertem_tpu.udf import SumSigUDF
    rng = np.random.default_rng(13)
    n_frames = 2
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
    # corrupt the sync magic of sector 3's second block
    bad = tmp_path / "testfile3.bin"
    with open(bad, "rb+") as f:
        f.seek(BLOCK_SIZE)
        f.write(b"\xde\xad\xbe\xef")
    ds = lt_ctx.load(
        "k2is", path=str(tmp_path / "testfile0.bin"),
        nav_shape=(1, 2),
    )
    # frame id 100 lost a block in sector 3 -> dropped entirely
    assert ds.meta.image_count == 1
    res = lt_ctx.run_udf(ds, SumSigUDF())
    got = np.asarray(res["intensity"].data).reshape(-1)
    expected_surviving = frames[1].astype(np.float64).sum()
    assert np.isclose(got[0], expected_surviving, rtol=1e-4)
    assert got[1] == 0.0  # missing frame zero-filled, not garbage


def test_k2is_truncated_last_block(lt_ctx, tmp_path):
    """A sector file ending mid-block: the incomplete frame is
    dropped (complete-frame policy), the run completes with the rest
    intact."""
    from test_k2is import _block_header, _pack_uint12_le
    from libertem_tpu.io.dataset.k2is import (
        BLOCK_SHAPE, BLOCK_SIZE, DATA_SIZE, NUM_SECTORS, SECTOR_SIZE,
    )
    from libertem_tpu.udf import SumSigUDF
    rng = np.random.default_rng(14)
    n_frames = 2
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
    bad = tmp_path / "testfile7.bin"
    size = bad.stat().st_size
    with open(bad, "rb+") as f:
        f.truncate(size - BLOCK_SIZE // 2)  # cut into the last block
    ds = lt_ctx.load(
        "k2is", path=str(tmp_path / "testfile0.bin"),
        nav_shape=(1, 2),
    )
    # the truncated final block makes frame 1 incomplete -> dropped
    assert ds.meta.image_count == 1
    res = lt_ctx.run_udf(ds, SumSigUDF())
    got = np.asarray(res["intensity"].data).reshape(-1)
    assert np.isclose(
        got[0], frames[0].astype(np.float64).sum(), rtol=1e-4
    )
    assert got[1] == 0.0
