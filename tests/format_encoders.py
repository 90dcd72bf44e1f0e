"""Standalone synthetic detector-file encoders (numpy + stdlib ONLY).

Shared by the test suite and by tests/ref_oracle/record_goldens.py —
the oracle runs the *reference* implementation in a shimmed
environment, so this module must not import libertem_tpu (all header
layouts are inlined; they are the file-format spec, not code shared
with the implementation under test).

Layout citations refer to the reference readers these bytes must
satisfy: /root/reference/src/libertem/io/dataset/{k2is,frms6,seq,
tvips,blo,empad,mib,raw_csr}.py.
"""
import hashlib
import os
import struct

import numpy as np


def ramp(n, h, w, lim, seed=0):
    """Deterministic all-values test pattern (value coverage without
    random-data bloat) shared by the oracle recorder and the parity
    tests — both sides must generate identical bytes."""
    idx = np.arange(n * h * w, dtype=np.int64)
    return (((idx * 7919) + seed * 104729) % lim).reshape(
        n, h, w
    ).astype(np.uint32)


def sha(arr):
    a = np.ascontiguousarray(arr)
    return hashlib.sha256(
        a.tobytes() + str(a.shape).encode() + str(a.dtype).encode()
    ).hexdigest()


def dir_hash(dirpath):
    """Hash of every file's bytes in a directory (sorted by name) —
    the encoder-drift guard for recorded goldens."""
    h = hashlib.sha256()
    for name in sorted(os.listdir(dirpath)):
        p = os.path.join(dirpath, name)
        if os.path.isfile(p):
            h.update(name.encode())
            with open(p, "rb") as f:
                h.update(f.read())
    return h.hexdigest()


# ---- MIB (Quantum Detectors Merlin) --------------------------------
# bit-packing per reference mib.py:400-666

def encode_mib_r1(frames):
    n, n_pix = frames.shape
    out = np.zeros((n, n_pix // 8), dtype=np.uint8)
    for p in range(n_pix):
        stripe, byte, bit = p // 64, (p % 64) // 8, p % 8
        src = frames[:, p] & 1
        out[:, stripe * 8 + (7 - byte)] |= (
            src.astype(np.uint8) << bit
        )
    return out


def encode_mib_r6(frames):
    n, n_pix = frames.shape
    return frames.reshape(n, -1, 8)[:, :, ::-1].reshape(
        n, n_pix
    ).astype(np.uint8)


def encode_mib_r12(frames):
    n, n_pix = frames.shape
    reordered = frames.reshape(n, -1, 4)[:, :, ::-1].reshape(n, n_pix)
    return reordered.astype(">u2").view(np.uint8)


def encode_mib_r24(frames):
    msb = encode_mib_r12((frames >> 12) & 0xFFF)
    lsb = encode_mib_r12(frames & 0xFFF)
    return np.concatenate([msb, lsb], axis=1)


def write_mib(path, frames, dtype_str, bit_depth, payload_fn,
              header_bytes=384, chips=1, width=256, height=256):
    """frames: (n, h, w_real); header declares the format fields the
    reference parses (mib.py:753 MIBHeaderReader)."""
    with open(path, "wb") as f:
        for i, fr in enumerate(frames):
            # trailing comma: NUL-padded header parts are dropped by
            # the reference, the bit depth must survive as parts[-1]
            head = (
                f"MQ1,{i + 1},{header_bytes},{chips},{width},"
                f"{height},{dtype_str},1x1,2x2,{bit_depth},"
            ).encode("ascii")
            f.write(head.ljust(header_bytes, b"\x00"))
            f.write(payload_fn(fr[None]).tobytes())


# ---- K2IS ----------------------------------------------------------
# constants per reference k2is.py:60-80 (block geometry is the
# detector's, not implementation-defined)

K2_HEADER_SIZE = 40
K2_BLOCK_SIZE = 0x5758
K2_DATA_SIZE = K2_BLOCK_SIZE - K2_HEADER_SIZE
K2_BLOCK_SHAPE = (930, 16)
K2_NUM_SECTORS = 8
K2_SECTOR_SIZE = (2 * 930, 256)


def pack_uint12_le(vals: np.ndarray) -> bytes:
    vals = vals.astype(np.uint16).reshape(-1)
    assert len(vals) % 2 == 0
    a, b = vals[0::2].astype(np.uint32), vals[1::2].astype(np.uint32)
    out = np.empty(len(vals) // 2 * 3, dtype=np.uint8)
    out[0::3] = a & 0xFF
    out[1::3] = ((a >> 8) & 0x0F) | ((b & 0x0F) << 4)
    out[2::3] = (b >> 4) & 0xFF
    return out.tobytes()


def k2is_block_header(frame_id, xs, ys, shutter=True, block_count=0):
    """DataBlock.header_dtype layout (reference k2is.py:583)."""
    head = bytearray(K2_HEADER_SIZE)
    head[0:4] = struct.pack(">I", 0xFFFF0055)
    head[8] = 1  # version
    head[9] = 0x1 if shutter else 0x0
    head[16:20] = struct.pack(">I", block_count)
    head[20:22] = struct.pack(">H", K2_SECTOR_SIZE[1])   # width
    head[22:24] = struct.pack(">H", K2_SECTOR_SIZE[0])   # height
    head[24:28] = struct.pack(">I", frame_id)
    head[28:30] = struct.pack(">H", xs)                  # pixel_x_start
    head[30:32] = struct.pack(">H", ys)                  # pixel_y_start
    head[32:34] = struct.pack(">H", xs + K2_BLOCK_SHAPE[1] - 1)
    head[34:36] = struct.pack(">H", ys + K2_BLOCK_SHAPE[0] - 1)
    head[36:40] = struct.pack(">I", K2_BLOCK_SIZE)
    return bytes(head)


def write_k2is_sectors(dirpath, frames, prefix="testfile",
                       descending_x=True):
    """frames: (n, 1860, 2048) uint16 (<4096).  Writes 8 sector .bin
    files; returns the path of sector 0.

    Real K2IS hardware streams each frame's 32 sector blocks with the
    x position DESCENDING inside each y half — the reference reads
    positionally, `blockidx = (15 - x_block) + y_block*16`
    (k2is.py:210), ignoring the per-block header coordinates.
    ``descending_x=False`` emits ascending order (still with correct
    header coordinates) to exercise header-driven readers."""
    n_frames = len(frames)
    h, w = K2_SECTOR_SIZE
    bh, bw = K2_BLOCK_SHAPE
    pad = K2_DATA_SIZE - (bh * bw * 3 // 2)
    xi_order = range(w // bw)
    if descending_x:
        xi_order = reversed(list(xi_order))
    xi_order = list(xi_order)
    for s in range(K2_NUM_SECTORS):
        path = os.path.join(dirpath, f"{prefix}{s}.bin")
        with open(path, "wb") as f:
            for fi in range(n_frames):
                frame_id = 100 + fi
                for ys in (0, bh):
                    for xi in xi_order:
                        xs = xi * bw
                        block = frames[
                            fi, ys:ys + bh,
                            s * w + xs:s * w + xs + bw,
                        ]
                        f.write(k2is_block_header(frame_id, xs, ys))
                        f.write(pack_uint12_le(block))
                        f.write(b"\x00" * pad)
    return os.path.join(dirpath, f"{prefix}0.bin")


# ---- Norpix SEQ ----------------------------------------------------
# header layout per reference seq.py:40-80

SEQ_HEADER_STRUCT = "<L24sll512sLLLLLLLLLdlLLLlllLlHH"
SEQ_FIELDS = (
    "magic", "name", "version", "header_size", "description",
    "width", "height", "bit_depth", "bit_depth_real",
    "image_size_bytes", "image_format", "allocated_frames",
    "origin", "true_image_size", "suggested_frame_rate",
    "description_format", "reference_frame", "fixed_size", "flags",
    "bayer_pattern", "time_offset_us", "extended_header_size",
    "compression_format", "reference_time_s", "reference_time_ms",
    "reference_time_us",
)


def write_seq(path, frames):
    """Synthetic Norpix SEQ (u16 frames, 64 pad bytes/frame)."""
    n, h, w = frames.shape
    true_image_size = w * h * 2 + 64
    defaults = {
        # name/description are UTF-16LE with an even-offset double-
        # NUL terminator: the reference's _decode_str scans for
        # b"\x00\x00" and utf16-decodes up to it (seq.py:118)
        "magic": 0xFEED, "name": "seq".encode("utf-16-le"),
        "version": 5,
        "header_size": 8192,
        "description": "d".encode("utf-16-le"), "width": w,
        "height": h, "bit_depth": 16, "bit_depth_real": 12,
        "image_size_bytes": w * h * 2, "image_format": 0,
        "allocated_frames": n, "origin": 0,
        "true_image_size": true_image_size,
        "suggested_frame_rate": 10.0, "description_format": 0,
        "reference_frame": 0, "fixed_size": 0, "flags": 0,
        "bayer_pattern": 0, "time_offset_us": 0,
        "extended_header_size": 0, "compression_format": 0,
        "reference_time_s": 0, "reference_time_ms": 0,
        "reference_time_us": 0,
    }
    vals = [defaults[name] for name in SEQ_FIELDS]
    head = struct.pack(SEQ_HEADER_STRUCT, *vals)
    with open(path, "wb") as f:
        f.write(head.ljust(8192, b"\x00"))
        for fr in frames:
            f.write(
                fr.astype("<u2").tobytes().ljust(
                    true_image_size, b"\x00"
                )
            )


# ---- PNDetector FRMS6 ----------------------------------------------
# global/frame header layout per reference frms6.py:60-130

def write_frms6(path, folded_frames, num_frames_field=None):
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


# ---- NanoMegas .blo ------------------------------------------------
# header per reference blo.py:20-60

BLO_FRAME_HEADER_BYTES = 6


def blo_header_dtype(endianess="<"):
    e = endianess
    return np.dtype([
        ("ID", "S6"),
        ("MAGIC", e + "u2"),
        ("Data_offset_1", e + "u4"),
        ("Data_offset_2", e + "u4"),
        ("UNKNOWN1", e + "u4"),
        ("DP_SZ", e + "u2"),
        ("DP_rotation", e + "u2"),
        ("NX", e + "u2"),
        ("NY", e + "u2"),
        ("Scan_rotation", e + "u2"),
        ("SX", e + "f8"),
        ("SY", e + "f8"),
        ("Beam_energy", e + "u4"),
        ("SDP", e + "u2"),
        ("Camera_length", e + "u4"),
        ("Acquisition_time", e + "f8"),
    ])


def write_blo(path, frames, nav):
    """frames: (n, dp, dp) uint8; nav: (ny, nx)."""
    dp = frames.shape[-1]
    hdr = np.zeros(1, dtype=blo_header_dtype())
    hdr["ID"] = b"IMGBLO"
    hdr["MAGIC"] = 258
    hdr["Data_offset_1"] = 1024
    hdr["Data_offset_2"] = 2048
    hdr["DP_SZ"] = dp
    hdr["NX"] = nav[1]
    hdr["NY"] = nav[0]
    with open(path, "wb") as f:
        f.write(hdr.tobytes().ljust(2048, b"\x00"))
        for fr in frames:
            f.write(b"\x00" * BLO_FRAME_HEADER_BYTES)
            f.write(fr.tobytes())


# ---- EMPAD ---------------------------------------------------------
# 130x128 raw frames + XML sidecar per reference empad.py:40-113

def write_empad(dirpath, frames, nav, name="scan"):
    """frames: (n, 128, 128) float32; returns the XML path."""
    n = len(frames)
    raw = np.zeros((n, 130, 128), dtype=np.float32)
    raw[:, :128, :] = frames
    raw_path = os.path.join(dirpath, f"{name}.raw")
    raw.tofile(raw_path)
    xml_path = os.path.join(dirpath, f"{name}.xml")
    with open(xml_path, "w") as f:
        f.write(
            f'<root><raw_file filename="{name}.raw"/>'
            '<type>scan</type>'
            '<scan_parameters mode="acquire">'
            f"<scan_resolution_x>{nav[1]}</scan_resolution_x>"
            f"<scan_resolution_y>{nav[0]}</scan_resolution_y>"
            "</scan_parameters></root>"
        )
    return xml_path


# ---- TVIPS ---------------------------------------------------------
# series header per reference tvips.py:30-90

def write_tvips(path, frames, img_header=12, version=2):
    n, h, w = frames.shape
    head = struct.pack(
        "<13i", 256, version, w, h, 16, 0, 0, 1, 1, 10, 200, 1,
        img_header,
    )
    with open(path, "wb") as f:
        f.write(head.ljust(256, b"\x00"))
        for fr in frames:
            f.write(b"\x00" * img_header)
            f.write(fr.astype("<u2").tobytes())


# ---- RAW CSR -------------------------------------------------------
# TOML descriptor + indptr/indices/data files per reference
# raw_csr.py:105-160

def write_raw_csr(dirpath, dense_flat, nav, sig, dtype="<i4",
                  name="sparse"):
    """dense_flat: (n_frames, n_pix) integer array; returns the TOML
    path.  CSR arrays are built with plain numpy (no scipy needed)."""
    n, n_pix = dense_flat.shape
    indptr = [0]
    indices = []
    data = []
    for row in dense_flat:
        nz = np.flatnonzero(row)
        indices.extend(nz.tolist())
        data.extend(row[nz].tolist())
        indptr.append(len(indices))
    with open(os.path.join(dirpath, "rowind.dat"), "wb") as f:
        f.write(np.asarray(indptr, dtype=dtype).tobytes())
    with open(os.path.join(dirpath, "coords.dat"), "wb") as f:
        f.write(np.asarray(indices, dtype=dtype).tobytes())
    with open(os.path.join(dirpath, "values.dat"), "wb") as f:
        f.write(np.asarray(data, dtype=dtype).tobytes())
    toml_path = os.path.join(dirpath, f"{name}.toml")
    with open(toml_path, "w") as f:
        f.write(
            '[params]\nfiletype = "raw_csr"\n'
            f"nav_shape = [{nav[0]}, {nav[1]}]\n"
            f"sig_shape = [{sig[0]}, {sig[1]}]\n\n"
            '[raw_csr]\nindptr_file = "rowind.dat"\n'
            f'indptr_dtype = "{dtype}"\n'
            'indices_file = "coords.dat"\n'
            f'indices_dtype = "{dtype}"\n'
            'data_file = "values.dat"\n'
            f'data_dtype = "{dtype}"\n'
        )
    return toml_path
