"""TVIPS binary series dataset
(reference: libertem/io/dataset/tvips.py:281; series header
tvips.py:62 — 256-byte header of i4 fields: ISize(=256), IVersion
(1|2), IXDim, IYDim, IBPP (8|16), IXOff, IYOff, IXBin, IYBin,
IPixelSize, IHT, IMagTotal, IImgHeaderBytes; frame header is 12 bytes
for v1 or IImgHeaderBytes for v2; series may span _000.tvips,
_001.tvips, ... files, only the first carries the series header).
"""
from __future__ import annotations

import glob
import os
import re
import struct
from typing import Iterator, Optional, Sequence

import numpy as np

from ...common.shape import Shape
from .base import (
    DataSet,
    DataSetException,
    DataSetMeta,
    Partition,
    resolve_sig_override,
)

SERIES_HEADER_SIZE = 256


def read_tvips_header(path: str) -> dict:
    with open(path, "rb") as f:
        raw = f.read(SERIES_HEADER_SIZE)
    fields = struct.unpack("<13i", raw[:52])
    h = dict(zip((
        "size", "version", "xdim", "ydim", "bpp", "xoff", "yoff",
        "xbin", "ybin", "pixel_size", "ht", "mag",
        "img_header_bytes",
    ), fields))
    if h["size"] != SERIES_HEADER_SIZE:
        raise DataSetException(
            f"invalid TVIPS header size {h['size']}"
        )
    if h["version"] not in (1, 2):
        raise DataSetException(
            f"unknown TVIPS version {h['version']}"
        )
    if h["version"] == 1:
        h["img_header_bytes"] = 12
    if h["bpp"] not in (8, 16):
        # a packed/corrupt bpp would silently produce wrong frame
        # strides (same validation as SEQ bit_depth)
        raise DataSetException(
            f"unsupported TVIPS bits-per-pixel {h['bpp']} "
            "(expected 8 or 16)"
        )
    h["frame_bytes"] = (
        h["img_header_bytes"] + h["bpp"] // 8 * h["xdim"] * h["ydim"]
    )
    return h


def _get_suffix(path: str) -> int:
    """Series index of one chunk file — the suffix is an underscore
    plus a three-digit zero-padded number (reference
    tvips.py:270)."""
    return int(os.path.splitext(os.fspath(path))[0][-3:])


def get_filenames(path) -> list:
    """All chunk files of the series ``path`` belongs to, in series
    order (reference tvips.py:173 ``_pattern`` + :277): the trailing
    counter is stripped and every sibling ``*.tvips`` collected."""
    base, ext = os.path.splitext(os.fspath(path))
    if ext.lower() != ".tvips":
        raise DataSetException("unknown extension")
    pattern = re.sub(r"[0-9]+$", "", glob.escape(base)) + "*.tvips"
    return list(sorted(glob.glob(pattern), key=_get_suffix))


def _series_files(path: str) -> list:
    m = re.match(r"^(.*)_(\d{3})\.tvips$", path)
    if not m:
        return [path]
    files = sorted(glob.glob(
        glob.escape(m.group(1)) + "_[0-9][0-9][0-9].tvips"
    ))
    return files or [path]


class TVIPSPartition(Partition):
    def __init__(self, files, header, io_backend=None,
                 *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._files = files  # [(path, first_idx, count, data_off)]
        self._h = header
        self._io_backend = io_backend
        self._readers = {}

    def _get_reader(self, path):
        if path not in self._readers:
            from .base import RangeReader
            self._readers[path] = RangeReader(path, self._io_backend)
        return self._readers[path]

    def _read_raw_frames(self, start: int, stop: int) -> np.ndarray:
        h = self._h
        w, ht = h["xdim"], h["ydim"]
        bpx = h["bpp"] // 8
        dtype = np.dtype(f"<u{bpx}")
        payload = w * ht * bpx
        fb, ihb = h["frame_bytes"], h["img_header_bytes"]
        n = stop - start
        out = np.empty((n, ht, w), dtype=dtype)
        for path, first, count, data_off in self._files:
            lo, hi = max(start, first), min(stop, first + count)
            if hi <= lo:
                continue
            cover = self._get_reader(path).read(
                data_off + (lo - first) * fb, (hi - lo) * fb
            )
            # one vectorized strided slice dropping the frame headers
            out[lo - start:hi - start] = (
                cover.reshape(hi - lo, fb)[:, ihb:ihb + payload]
                .view(dtype).reshape(hi - lo, ht, w)
            )
        return out


class TVIPSDataSet(DataSet):
    def __init__(
        self,
        path: str,
        nav_shape: Optional[Sequence[int]] = None,
        sig_shape: Optional[Sequence[int]] = None,
        sync_offset: int = 0,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self._path = path
        self._nav_shape = tuple(nav_shape) if nav_shape else None
        self._sig_shape = tuple(sig_shape) if sig_shape else None
        self._sync_offset = int(sync_offset)

    def initialize(self, executor=None) -> "TVIPSDataSet":
        files = _series_files(self._path)
        h = read_tvips_header(files[0])
        sig = resolve_sig_override(
            self._sig_shape, (h["ydim"], h["xdim"])
        )
        self._h = h
        self._files = []
        first = 0
        for i, f in enumerate(files):
            data_off = SERIES_HEADER_SIZE if i == 0 else 0
            count = (
                os.path.getsize(f) - data_off
            ) // h["frame_bytes"]
            self._files.append((f, first, count, data_off))
            first += count
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
                tuple(nav_shape) + sig,
                sig_dims=len(sig),
            ),
            raw_dtype=np.dtype(f"<u{h['bpp'] // 8}"),
            sync_offset=self._sync_offset,
            image_count=image_count,
        )
        return self

    def get_partitions(self) -> Iterator[TVIPSPartition]:
        for idx, (start, stop) in enumerate(self.get_partition_ranges()):
            yield TVIPSPartition(
                self._files, self._h, self._io_backend,
                self.meta, start, stop - start, idx=idx,
            )

    @classmethod
    def detect_params(cls, path: str, executor=None):
        if not path.lower().endswith(".tvips"):
            return False
        try:
            read_tvips_header(_series_files(path)[0])
        except Exception:
            return False
        return {"path": path}

    @classmethod
    def get_supported_extensions(cls) -> set:
        return {"tvips"}
