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
    path = str(tmp_path / "bad.raw")
    with open(path, "wb") as f:
        f.write(b"\x00" * 1001)  # not a multiple of frame size
    with pytest.raises(DataSetException):
        lt_ctx.load(
            "raw", path=path, dtype="uint16",
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
