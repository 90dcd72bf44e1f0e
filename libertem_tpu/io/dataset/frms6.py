"""PNDetector FRMS6 dataset
(reference: libertem/io/dataset/frms6.py:406 — 1024-byte file header
[u2 header_size=1024, u2 frame_header_size=64, 3 pad bytes,
u1 version=6, 80 comment, u2 width, u2 height, 928 comment,
u4 num_frames], 64-byte frame headers, u16 pixel data).

Frames are stored *folded*: a stored (h, w) frame holds the top half
in columns [0, w/2) and the vertically flipped bottom half in
[w/2, w) — the unfolded signal is (2h, w/2)
(reference _map_y frms6.py:233).  ``*_000.frms6`` holds dark frames;
their unfolded mean becomes the dark correction.
"""
from __future__ import annotations

import glob
import os
import re
import struct
from typing import Iterator, Optional, Sequence

import numpy as np

from ...common.shape import Shape
from ..corrections import CorrectionSet
from .decode import Decoder
from .base import (
    DataSet,
    DataSetException,
    DataSetMeta,
    Partition,
    resolve_sig_override,
)

FILE_HEADER_SIZE = 1024
FRAME_HEADER_SIZE = 64


def read_frms6_header(path: str) -> dict:
    with open(path, "rb") as f:
        raw = f.read(FILE_HEADER_SIZE)
    header_size, frame_header_size = struct.unpack("<HH", raw[:4])
    version = raw[7]
    width, height = struct.unpack("<HH", raw[88:92])
    num_frames = struct.unpack("<I", raw[1020:1024])[0]
    if header_size != 1024 or frame_header_size != 64 or version != 6:
        raise DataSetException(f"{path}: not an FRMS6 file")
    filesize = os.path.getsize(path)
    if num_frames == 0:
        per_frame = width * height * 2 + FRAME_HEADER_SIZE
        num_frames = (filesize - FILE_HEADER_SIZE) // per_frame
    return {
        "width": int(width), "height": int(height),
        "num_frames": int(num_frames), "path": path,
    }


def unfold(frames: np.ndarray) -> np.ndarray:
    """(n, h, w) folded -> (n, 2h, w/2) unfolded.

    The bottom half is the folded frame's right half rotated 180
    degrees — rows bottom-up AND columns reversed (the sensor's two
    readout directions oppose).  The reference writes bottom-half
    rows as ``inp_decoded[::-1]`` (frms6.py:346); verified against
    its decode in tests/goldens/fmt_decode.npz (a rows-only flip was
    this port's round-3 oracle finding)."""
    n, h, w = frames.shape
    w2 = w // 2
    out = np.empty((n, 2 * h, w2), dtype=frames.dtype)
    out[:, :h] = frames[:, :, :w2]
    out[:, h:] = frames[:, ::-1, w2:][:, :, ::-1]
    return out


def _pattern(path: str) -> str:
    """Sibling-chunk glob (reference frms6.py:178): ``scan.hdr``
    opens ``scan_*.frms6``; ``scan_001.frms6`` opens ``scan_*.frms6``
    (the trailing chunk counter is stripped); anything else is an
    error."""
    base, ext = os.path.splitext(os.fspath(path))
    ext = ext.lower()
    if ext == ".hdr":
        return glob.escape(base) + "_*.frms6"
    if ext == ".frms6":
        return glob.escape(re.sub(r"[0-9]+$", "", base)) + "*.frms6"
    raise DataSetException(f"unknown extension: {ext}")


def get_filenames(path, disable_glob: bool = False) -> list:
    """All sibling chunks of a multi-file acquisition (reference
    frms6.py:191)."""
    if disable_glob:
        return [os.fspath(path)]
    return list(sorted(glob.glob(_pattern(path))))


def _map_y(y, xs, binning, num_rows):
    """Folded-row mapping (reference frms6.py:233): stored row ``y``
    lands at ``(row, x_offset)`` in the unfolded frame — the bottom
    detector half is read out mirrored, so its rows count back from
    the end and shift right by ``xs``.  ``unfold`` below applies the
    same mapping vectorized; this scalar form is the per-row oracle
    the reference's tests drive directly."""
    half = num_rows // 2 // binning
    if y < half:
        return (y, 0)
    return ((num_rows // binning) - y - 1, xs)


class FRMS6Decoder(Decoder):
    """Row-for-row tile decoder implementing the reference's decode
    protocol (frms6.py:321-366): each read is ONE stored row; rows
    from the bottom detector half write x-reversed, and binned rows
    broadcast over ``binning`` output rows.  The engine's block
    reader unfolds whole frames vectorized (``unfold``); this
    decoder exists for tile-protocol parity and as an independent
    oracle for the row mapping."""

    def __init__(self, binning):
        self._binning = binning

    def get_decode(self, native_dtype, read_dtype):
        binning = self._binning

        def _decode(inp, out, idx, native_dtype, rr, origin, shape,
                    ds_shape):
            row = inp.reshape((-1,)).view(native_dtype)
            out3 = out.reshape(out.shape[0], -1, shape[-1])
            rows_binned = ds_shape[-2] // binning
            rows_in_tile = shape[1] // binning
            start = (idx % rows_in_tile) * binning
            depth = idx // rows_in_tile
            top = (
                origin[1] // binning + (idx % rows_in_tile)
                < rows_binned // 2
            )
            out3[depth, start:start + binning, :] = (
                row if top else row[::-1]
            )

        return _decode


def _discover(path: str) -> tuple:
    """(dark_file | None, [data files]) from any member path."""
    m = re.match(r"^(.*)_(\d+)\.frms6$", path)
    base = m.group(1) if m else os.path.splitext(path)[0]
    all_files = sorted(glob.glob(f"{glob.escape(base)}_*.frms6"))
    if not all_files:
        all_files = [path]
    dark = None
    data = []
    for f in all_files:
        fm = re.match(r"^.*_(\d+)\.frms6$", f)
        if fm and int(fm.group(1)) == 0:
            dark = f
        else:
            data.append(f)
    if not data:
        data = [dark] if dark else [path]
        dark = None
    return dark, data


class FRMS6Partition(Partition):
    def __init__(self, files, stored_shape, io_backend=None,
                 *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._files = files  # [(path, first, count)]
        self._stored = stored_shape  # (h, w) folded
        self._io_backend = io_backend
        self._readers = {}

    def _get_reader(self, path):
        if path not in self._readers:
            from .base import RangeReader
            self._readers[path] = RangeReader(path, self._io_backend)
        return self._readers[path]

    def _read_raw_frames(self, start: int, stop: int) -> np.ndarray:
        h, w = self._stored
        frame_bytes = h * w * 2
        stride = FRAME_HEADER_SIZE + frame_bytes
        n = stop - start
        folded = np.empty((n, h, w), dtype=np.uint16)
        for path, first, count in self._files:
            lo, hi = max(start, first), min(stop, first + count)
            if hi <= lo:
                continue
            reader = self._get_reader(path)
            span0 = FILE_HEADER_SIZE + (lo - first) * stride
            cover = reader.read(span0, (hi - lo) * stride)
            folded[lo - start:hi - start] = (
                cover.reshape(hi - lo, stride)[
                    :, FRAME_HEADER_SIZE:FRAME_HEADER_SIZE
                    + frame_bytes
                ].view("<u2").reshape(hi - lo, h, w)
            )
        return unfold(folded)


class FRMS6DataSet(DataSet):
    def __init__(
        self,
        path: str,
        nav_shape: Optional[Sequence[int]] = None,
        sig_shape: Optional[Sequence[int]] = None,
        sync_offset: int = 0,
        enable_offset_correction: bool = True,
        gain_map_path: Optional[str] = None,
        dest_dtype=None,
        **kwargs,
    ):
        if dest_dtype is not None:
            import warnings
            warnings.warn(
                "dest_dtype is ignored here (the reference ignores "
                "it too, frms6.py:474)", FutureWarning,
            )
        super().__init__(**kwargs)
        self._path = path
        self._nav_shape = tuple(nav_shape) if nav_shape else None
        self._sig_shape = tuple(sig_shape) if sig_shape else None
        self._sync_offset = int(sync_offset)
        self._enable_offset_correction = enable_offset_correction
        self._gain_map_path = gain_map_path

    def initialize(self, executor=None) -> "FRMS6DataSet":
        dark_file, data_files = _discover(self._path)
        self._dark_file = dark_file
        h0 = read_frms6_header(data_files[0])
        self._stored = (h0["height"], h0["width"])
        sig_shape = resolve_sig_override(
            self._sig_shape,
            (2 * h0["height"], h0["width"] // 2),
        )
        self._files = []
        first = 0
        for f in data_files:
            h = read_frms6_header(f)
            self._files.append((f, first, h["num_frames"]))
            first += h["num_frames"]
        image_count = first
        nav_shape = self._nav_shape
        if not nav_shape:
            side = int(np.sqrt(image_count))
            nav_shape = (
                (side, side) if side * side == image_count
                else (image_count,)
            )
        self._meta = DataSetMeta(
            shape=Shape(
                tuple(nav_shape) + sig_shape,
                sig_dims=len(sig_shape),
            ),
            raw_dtype=np.dtype(np.uint16),
            sync_offset=self._sync_offset,
            image_count=image_count,
        )
        return self

    def get_correction_data(self) -> CorrectionSet:
        dark = gain = None
        if self._enable_offset_correction and self._dark_file:
            h = read_frms6_header(self._dark_file)
            part = FRMS6Partition(
                [(self._dark_file, 0, h["num_frames"])],
                self._stored, None, self.meta, 0, h["num_frames"],
            )
            frames = part._read_raw_frames(0, h["num_frames"])
            dark = frames.astype(np.float64).mean(axis=0).astype(
                np.float32
            ).reshape(tuple(self.meta.shape.sig))  # sig override
        if self._gain_map_path and os.path.exists(
            self._gain_map_path
        ):
            if self._gain_map_path.endswith(".npy"):
                gain = np.load(self._gain_map_path)
            else:  # CSV like the reference's gain maps
                gain = np.loadtxt(
                    self._gain_map_path, delimiter=","
                ).astype(np.float32)
            # same sig-override re-factorization the dark frame gets:
            # a user sig_shape re-views the unfolded frame, and
            # CorrectionSet.make_plan requires correction frames in
            # detector sig shape
            gain = np.asarray(gain).reshape(
                tuple(self.meta.shape.sig)
            )
        return CorrectionSet(dark=dark, gain=gain)

    def get_partitions(self) -> Iterator[FRMS6Partition]:
        for idx, (start, stop) in enumerate(self.get_partition_ranges()):
            yield FRMS6Partition(
                self._files, self._stored, self._io_backend,
                self.meta, start, stop - start, idx=idx,
            )

    @classmethod
    def detect_params(cls, path: str, executor=None):
        if not path.lower().endswith(".frms6"):
            return False
        try:
            read_frms6_header(path)
        except Exception:
            return False
        return {"path": path}

    @classmethod
    def get_supported_extensions(cls) -> set:
        return {"frms6", "hdr"}
