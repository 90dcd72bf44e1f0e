"""K2IS format test with synthetic sector files."""
import struct

import numpy as np
import pytest

from libertem_tpu.io.dataset.k2is import (
    BLOCK_SHAPE,
    BLOCK_SIZE,
    BLOCKS_PER_SECTOR_PER_FRAME,
    DATA_SIZE,
    HEADER_SIZE,
    NUM_SECTORS,
    SECTOR_SIZE,
)
from libertem_tpu.udf import PickUDF, SumSigUDF


from format_encoders import (  # noqa: E402
    k2is_block_header as _block_header,
    pack_uint12_le as _pack_uint12_le,
)


@pytest.fixture(scope="module")
def k2_data(tmp_path_factory):
    """Sector files in the real hardware block order (descending x
    inside each y half — see format_encoders.write_k2is_sectors)."""
    import format_encoders as fe

    tmp = tmp_path_factory.mktemp("k2is")
    rng = np.random.default_rng(11)
    n_frames = 3
    h, w = SECTOR_SIZE
    frames = rng.integers(
        0, 4096, (n_frames, h, NUM_SECTORS * w)
    ).astype(np.uint16)
    path0 = fe.write_k2is_sectors(str(tmp), frames)
    return path0, frames


def test_k2is_ascending_block_order(lt_ctx, tmp_path):
    """Our reader places blocks by their HEADER coordinates, so a
    stream with ascending-x block order (which the reference's
    positional reader would misassemble) still decodes correctly."""
    import format_encoders as fe

    rng = np.random.default_rng(12)
    h, w = SECTOR_SIZE
    frames = rng.integers(
        0, 4096, (2, h, NUM_SECTORS * w)
    ).astype(np.uint16)
    path0 = fe.write_k2is_sectors(
        str(tmp_path), frames, descending_x=False
    )
    ds = lt_ctx.load("k2is", path=path0, nav_shape=(2,))
    roi = np.zeros(2, dtype=bool)
    roi[1] = True
    res = lt_ctx.run_udf(ds, PickUDF(), roi=roi)
    assert np.array_equal(res["intensity"].data[0], frames[1])


def test_k2is(lt_ctx, k2_data):
    path, frames = k2_data
    ds = lt_ctx.load("k2is", path=path, nav_shape=(3,))
    assert tuple(ds.shape) == (3,) + (1860, 2048)
    roi = np.zeros(3, dtype=bool)
    roi[1] = True
    res = lt_ctx.run_udf(ds, PickUDF(), roi=roi)
    assert np.array_equal(res["intensity"].data[0], frames[1])


def test_k2is_sumsig(lt_ctx, k2_data):
    path, frames = k2_data
    ds = lt_ctx.load("k2is", path=path, nav_shape=(3,))
    res = lt_ctx.run_udf(ds, SumSigUDF())
    expected = frames.astype(np.float64).sum(axis=(1, 2))
    assert np.allclose(
        res["intensity"].data, expected, rtol=1e-4
    )


def test_k2is_interleaved_blocks(lt_ctx, tmp_path):
    """Sector streams whose per-frame blocks are NOT contiguous on
    disk (blocks round-robined across frames) must fall back from the
    covering-span read to per-block reads and still assemble every
    frame exactly."""
    rng = np.random.default_rng(7)
    n_frames = 3
    h, w = SECTOR_SIZE
    frames = rng.integers(
        0, 4096, (n_frames, h, NUM_SECTORS * w)
    ).astype(np.uint16)
    bh, bw = BLOCK_SHAPE
    pad = DATA_SIZE - (bh * bw * 3 // 2)
    for s in range(NUM_SECTORS):
        path = tmp_path / f"testfile{s}.bin"
        with open(path, "wb") as f:
            # iterate block positions OUTER, frames INNER: each
            # frame's 32 blocks end up 3 blocks apart on disk
            for ys in (0, bh):
                for xi in range(w // bw):
                    for fi in range(n_frames):
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
        nav_shape=(n_frames,),
    )
    roi = np.zeros(n_frames, dtype=bool)
    roi[1] = True
    res = lt_ctx.run_udf(ds, PickUDF(), roi=roi)
    assert np.allclose(
        np.asarray(res["intensity"].data).squeeze(), frames[1]
    )


def test_k2is_scan_mode_shutter_delay(lt_ctx, tmp_path, monkeypatch):
    """Scan-mode (.gtg nav shape): the shutter flag is set one frame
    LATE on real hardware, so the true first grid frame is the one
    before the first flagged frame (reference k2is.py:815-822
    skip_frames=-1).  Without a .gtg, the run starts at the first
    flagged frame as before."""
    import libertem_tpu.io.dataset.k2is as k2mod

    rng = np.random.default_rng(5)
    n_frames = 4
    h, w = SECTOR_SIZE
    frames = rng.integers(
        0, 4096, (n_frames, h, NUM_SECTORS * w)
    ).astype(np.uint16)
    bh, bw = BLOCK_SHAPE
    pad = DATA_SIZE - (bh * bw * 3 // 2)
    for s in range(NUM_SECTORS):
        with open(tmp_path / f"testfile{s}.bin", "wb") as f:
            for fi in range(n_frames):
                for ys in (0, bh):
                    for xi in range(w // bw):
                        xs = xi * bw
                        block = frames[
                            fi, ys:ys + bh,
                            s * w + xs:s * w + xs + bw,
                        ]
                        f.write(_block_header(
                            100 + fi, xs, ys, shutter=(fi >= 1),
                        ))
                        f.write(_pack_uint12_le(block))
                        f.write(b"\x00" * pad)
    path = str(tmp_path / "testfile0.bin")

    ds = lt_ctx.load("k2is", path=path)
    assert ds.meta.image_count == 3  # no .gtg: first flagged frame

    monkeypatch.setattr(
        k2mod, "_nav_shape_from_gtg", lambda p: (2, 2)
    )
    ds = lt_ctx.load("k2is", path=path)
    assert tuple(ds.shape.nav) == (2, 2)
    assert ds.meta.image_count == 4  # includes the unflagged frame
    from libertem_tpu.udf import SumSigUDF
    res = lt_ctx.run_udf(ds, SumSigUDF())
    got = np.asarray(res["intensity"].data).reshape(-1)
    expected = frames.reshape(n_frames, -1).sum(axis=1)
    assert np.allclose(got, expected, rtol=1e-4)
