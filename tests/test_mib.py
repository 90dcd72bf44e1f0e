"""MIB format tests with synthetic files (the reference's real-file
tests are gated on TESTDATA; here we synthesize files + verify the
decoders against an independent encoder)."""
import numpy as np
import pytest

from libertem_tpu.native import (
    decode_r1, decode_r6, decode_r12, decode_r24, decode_uint12_le,
    get_lib,
)
from libertem_tpu.udf import PickUDF, SumUDF

from conftest import _mk_random


from format_encoders import (  # noqa: E402
    encode_mib_r1 as _encode_r1,
    encode_mib_r6 as _encode_r6,
    encode_mib_r12 as _encode_r12,
    encode_mib_r24 as _encode_r24,
)


@pytest.mark.parametrize("use_native", [True, False])
def test_decoders_roundtrip(use_native, monkeypatch):
    if not use_native:
        import libertem_tpu.native as nat
        monkeypatch.setattr(nat, "_lib", None)
        monkeypatch.setattr(nat, "_tried", True)
    elif get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(1)
    n, n_pix = 3, 256
    f1 = rng.integers(0, 2, (n, n_pix)).astype(np.uint8)
    assert np.array_equal(decode_r1(_encode_r1(f1), n_pix), f1)
    f6 = rng.integers(0, 64, (n, n_pix)).astype(np.uint8)
    assert np.array_equal(decode_r6(_encode_r6(f6), n_pix), f6)
    f12 = rng.integers(0, 4096, (n, n_pix)).astype(np.uint16)
    assert np.array_equal(decode_r12(_encode_r12(f12), n_pix), f12)
    f24 = rng.integers(0, 1 << 24, (n, n_pix)).astype(np.uint32)
    assert np.array_equal(decode_r24(_encode_r24(f24), n_pix), f24)


def test_uint12_le_roundtrip():
    rng = np.random.default_rng(2)
    vals = rng.integers(0, 4096, 64).astype(np.uint16)
    packed = np.zeros(96, dtype=np.uint8)
    for i in range(32):
        a, b = int(vals[2 * i]), int(vals[2 * i + 1])
        packed[3 * i] = a & 0xFF
        packed[3 * i + 1] = ((a >> 8) & 0x0F) | ((b & 0x0F) << 4)
        packed[3 * i + 2] = (b >> 4) & 0xFF
    assert np.array_equal(decode_uint12_le(packed), vals)


def _write_mib(path, frames, dtype_str, bit_depth, payload_fn):
    """Write a synthetic MIB file: MQ1 header + payload per frame."""
    header_bytes = 384
    with open(path, "wb") as f:
        for i, frame in enumerate(frames):
            payload = payload_fn(frame[None]).tobytes()
            head = (
                f"MQ1,{i + 1},{header_bytes},1,"
                f"{frames.shape[2]},{frames.shape[1]},{dtype_str},"
                f"1x1,2x2,{bit_depth}"
            ).encode("ascii")
            f.write(head.ljust(header_bytes, b"\x00"))
            f.write(payload)


def test_mib_u16(lt_ctx, tmp_path):
    data = _mk_random((4, 5, 16, 16), dtype="uint16")
    flat = data.reshape(-1, 16, 16)
    path = str(tmp_path / "test.mib")
    _write_mib(
        path, flat, "U16", 12,
        lambda fr: fr.reshape(fr.shape[0], -1).astype(">u2"),
    )
    ds = lt_ctx.load("mib", path=path, nav_shape=(4, 5))
    assert tuple(ds.shape) == (4, 5, 16, 16)
    res = lt_ctx.run_udf(ds, SumUDF())
    assert np.allclose(
        res["intensity"].data,
        flat.astype(np.float32).sum(axis=0), rtol=1e-4,
    )


def test_mib_r12(lt_ctx, tmp_path):
    rng = np.random.default_rng(5)
    flat = rng.integers(0, 4096, (20, 16, 16)).astype(np.uint16)
    path = str(tmp_path / "raw.mib")
    _write_mib(
        path, flat, "R64", 12,
        lambda fr: _encode_r12(fr.reshape(fr.shape[0], -1)),
    )
    ds = lt_ctx.load("mib", path=path, nav_shape=(4, 5))
    roi = np.zeros(20, dtype=bool)
    roi[[0, 7, 19]] = True
    res = lt_ctx.run_udf(ds, PickUDF(), roi=roi)
    assert np.array_equal(
        res["intensity"].data, flat[[0, 7, 19]]
    )


def test_mib_r24(lt_ctx, tmp_path):
    """Real R64 24-bit layout: the header declares the 12-bit
    sub-frame width (2x the final width); the payload is two r12
    sub-frames (MSB first) of the final frame size, h*(w/2)*4 bytes
    per frame (reference mib.py:836-838, decode_r24_swap)."""
    rng = np.random.default_rng(7)
    h, w = 16, 16
    flat = rng.integers(0, 1 << 24, (12, h, w)).astype(np.uint32)
    path = str(tmp_path / "r24.mib")
    header_bytes = 384
    with open(path, "wb") as f:
        for i, fr in enumerate(flat):
            payload = _encode_r24(fr.reshape(1, -1)).tobytes()
            assert len(payload) == h * w * 4
            # header declares width 2*w (the sub-frame width)
            head = (
                f"MQ1,{i + 1},{header_bytes},1,"
                f"{2 * w},{h},R64,1x1,2x2,24"
            ).encode("ascii")
            f.write(head.ljust(header_bytes, b"\x00"))
            f.write(payload)
    ds = lt_ctx.load("mib", path=path, nav_shape=(3, 4))
    # frame count and sig shape derive from the halved width
    assert tuple(ds.shape) == (3, 4, h, w)
    assert ds.meta.image_count == 12
    roi = np.zeros(12, dtype=bool)
    roi[[0, 5, 11]] = True
    res = lt_ctx.run_udf(ds, PickUDF(), roi=roi)
    assert np.array_equal(res["intensity"].data, flat[[0, 5, 11]])
    res = lt_ctx.run_udf(ds, SumUDF())
    assert np.allclose(
        res["intensity"].data, flat.astype(np.float64).sum(axis=0),
        rtol=1e-6,
    )


def test_mib_r1_autodetect(lt_ctx, tmp_path):
    rng = np.random.default_rng(6)
    flat = rng.integers(0, 2, (9, 16, 16)).astype(np.uint8)
    path = str(tmp_path / "bits.mib")
    _write_mib(
        path, flat, "R64", 1,
        lambda fr: _encode_r1(fr.reshape(fr.shape[0], -1)),
    )
    ds = lt_ctx.load("auto", path)
    assert tuple(ds.shape) == (3, 3, 16, 16)
    res = lt_ctx.run_udf(ds, SumUDF())
    assert np.allclose(
        res["intensity"].data, flat.astype(np.float32).sum(axis=0)
    )


def test_mib_r6_quad(lt_ctx, tmp_path):
    """RAW 2x2 quad: stored rows are [Q4|Q3|Q2|Q1] at 4x chip width;
    bottom quadrants rotate 180 degrees on assembly."""
    rng = np.random.default_rng(12)
    h = 8  # chip height (stored rows); assembled frame (16, 16)
    frames = rng.integers(0, 64, (6, 2 * h, 2 * h)).astype(np.uint8)

    def disassemble(fr):
        half = h
        stored = np.empty((h, 4 * h), dtype=fr.dtype)
        stored[:, 3 * half:] = fr[:h, :half]                 # Q1
        stored[:, 2 * half:3 * half] = fr[:h, half:]         # Q2
        stored[:, 1 * half:2 * half] = fr[h:, :half][::-1, ::-1]
        stored[:, 0:half] = fr[h:, half:][::-1, ::-1]        # Q4
        return stored

    path = str(tmp_path / "quad.mib")
    header_bytes = 384
    with open(path, "wb") as f:
        for i, fr in enumerate(frames):
            stored = disassemble(fr).reshape(1, -1)
            payload = _encode_r6(stored).tobytes()
            head = (
                f"MQ1,{i + 1},{header_bytes},4,"
                f"{4 * h},{h},R64,2x2,2x2,6"
            ).encode("ascii")
            f.write(head.ljust(header_bytes, b"\x00"))
            f.write(payload)
    ds = lt_ctx.load("mib", path=path, nav_shape=(2, 3))
    assert tuple(ds.shape) == (2, 3, 16, 16)
    roi = np.zeros(6, dtype=bool)
    roi[[1, 4]] = True
    res = lt_ctx.run_udf(ds, PickUDF(), roi=roi)
    assert np.array_equal(res["intensity"].data, frames[[1, 4]])


def test_mib_sig_shape_reshape(lt_ctx, tmp_path):
    """An equal-size sig_shape RESHAPES frames (reference semantics);
    only a size mismatch errors."""
    data = _mk_random((4, 16, 16), dtype="uint16")
    path = str(tmp_path / "rs.mib")
    _write_mib(
        path, data, "U16", 12,
        lambda fr: fr.astype(">u2"),
    )
    ds = lt_ctx.load(
        "mib", path=path, nav_shape=(2, 2), sig_shape=(8, 32),
    )
    assert tuple(ds.shape) == (2, 2, 8, 32)
    from libertem_tpu.udf import PickUDF
    roi = np.zeros(4, dtype=bool)
    roi[1] = True
    res = lt_ctx.run_udf(ds, PickUDF(), roi=roi)
    assert np.array_equal(
        res["intensity"].data.reshape(8, 32),
        data[1].reshape(8, 32),
    )
    with pytest.raises(Exception, match="does not match"):
        lt_ctx.load(
            "mib", path=path, nav_shape=(2, 2), sig_shape=(8, 8),
        )
