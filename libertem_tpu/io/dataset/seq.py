"""Norpix SEQ dataset
(reference: libertem/io/dataset/seq.py:415; header fields seq.py:52 —
little-endian: magic u4 (0xFEED), name 24s, version i4, header_size
i4, description 512s, width u4, height u4, bit_depth u4,
bit_depth_real u4, image_size_bytes u4, image_format u4,
allocated_frames u4, origin u4, true_image_size u4, ...; frames start
at 8192 (version >= 5) or 1024, each occupying true_image_size bytes).

Optional dark/gain sidecar files (<path>.dark.mrc / <path>.gain.mrc
or .npy) become a CorrectionSet like the reference's.
"""
from __future__ import annotations

import os
import struct
from typing import Iterator, Optional, Sequence

import numpy as np

from ...common.shape import Shape
from ..corrections import CorrectionSet
from .base import (
    DataSet,
    DataSetException,
    DataSetMeta,
    Partition,
    resolve_sig_override,
)

_HEADER_STRUCT = "<L24sll512sLLLLLLLLLdlLLLlllLlHH"
_FIELDS = (
    "magic", "name", "version", "header_size", "description",
    "width", "height", "bit_depth", "bit_depth_real",
    "image_size_bytes", "image_format", "allocated_frames",
    "origin", "true_image_size", "suggested_frame_rate",
    "description_format", "reference_frame", "fixed_size", "flags",
    "bayer_pattern", "time_offset_us", "extended_header_size",
    "compression_format", "reference_time_s", "reference_time_ms",
    "reference_time_us",
)


def read_seq_header(path: str) -> dict:
    size = struct.calcsize(_HEADER_STRUCT)
    with open(path, "rb") as f:
        raw = f.read(size)
    vals = struct.unpack(_HEADER_STRUCT, raw)
    h = dict(zip(_FIELDS, vals))
    if h["magic"] != 0xFEED:
        raise DataSetException(f"{path}: not a SEQ file")
    h["image_offset"] = 8192 if h["version"] >= 5 else 1024
    return h


class SEQPartition(Partition):
    def __init__(self, path, header, io_backend=None, *args,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self._path = path
        self._h = header
        from .base import RangeReader
        self._reader = RangeReader(path, io_backend)

    def _read_raw_frames(self, start: int, stop: int) -> np.ndarray:
        h = self._h
        w, ht = h["width"], h["height"]
        bpx = max(1, h["bit_depth"] // 8)
        dtype = np.dtype(f"<u{bpx}")
        frame_bytes = w * ht * bpx
        n = stop - start
        # one ranged read covering the span (frames are padded to
        # true_image_size), then slice per-frame payloads
        span0 = h["image_offset"] + start * h["true_image_size"]
        cover = self._reader.read(
            span0,
            (n - 1) * h["true_image_size"] + frame_bytes,
        )
        out = np.empty((n, ht, w), dtype=dtype)
        for i in range(n):
            off = i * h["true_image_size"]
            out[i] = np.frombuffer(
                cover[off:off + frame_bytes], dtype=dtype
            ).reshape(ht, w)
        return out


class SEQDataSet(DataSet):
    def __init__(
        self,
        path: str,
        nav_shape: Optional[Sequence[int]] = None,
        sig_shape: Optional[Sequence[int]] = None,
        sync_offset: int = 0,
        scan_size=None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self._path = path
        self._nav_shape = tuple(nav_shape or scan_size or ())
        self._sig_shape = tuple(sig_shape) if sig_shape else None
        self._sync_offset = int(sync_offset)

    def initialize(self, executor=None) -> "SEQDataSet":
        h = read_seq_header(self._path)
        if h["bit_depth"] not in (8, 16):
            raise DataSetException(
                f"unsupported SEQ bit depth {h['bit_depth']} "
                "(packed 10/12-bit and color formats are not "
                "supported)"
            )
        sig = resolve_sig_override(
            self._sig_shape, (h["height"], h["width"])
        )
        self._h = h
        filesize = os.path.getsize(self._path)
        image_count = (
            (filesize - h["image_offset"]) // h["true_image_size"]
            if h["true_image_size"] else 0
        )
        bpx = max(1, h["bit_depth"] // 8)
        nav_shape = self._nav_shape or (image_count,)
        self._meta = DataSetMeta(
            shape=Shape(
                tuple(nav_shape) + sig,
                sig_dims=len(sig),
            ),
            raw_dtype=np.dtype(f"<u{bpx}"),
            sync_offset=self._sync_offset,
            image_count=image_count,
        )
        return self

    def get_correction_data(self) -> CorrectionSet:
        """Dark/gain sidecars (reference seq.py reads .dark.mrc /
        .gain.mrc next to the data)."""
        dark = gain = None
        base = self._path
        for stem in (base, os.path.splitext(base)[0]):
            d_npy = stem + ".dark.npy"
            g_npy = stem + ".gain.npy"
            if dark is None and os.path.exists(d_npy):
                dark = np.load(d_npy)
            if gain is None and os.path.exists(g_npy):
                gain = np.load(g_npy)
            d_mrc = stem + ".dark.mrc"
            g_mrc = stem + ".gain.mrc"
            if dark is None and os.path.exists(d_mrc):
                from .mrc import MRCDataSet
                ds = MRCDataSet(d_mrc).initialize()
                dark = next(ds.get_partitions())._read_raw_frames(0, 1)[0]
            if gain is None and os.path.exists(g_mrc):
                from .mrc import MRCDataSet
                ds = MRCDataSet(g_mrc).initialize()
                gain = next(ds.get_partitions())._read_raw_frames(0, 1)[0]
        return CorrectionSet(dark=dark, gain=gain)

    def get_partitions(self) -> Iterator[SEQPartition]:
        for idx, (start, stop) in enumerate(self.get_partition_ranges()):
            yield SEQPartition(
                self._path, self._h, self._io_backend,
                self.meta, start, stop - start, idx=idx,
            )

    @classmethod
    def detect_params(cls, path: str, executor=None):
        if not path.lower().endswith(".seq"):
            return False
        try:
            read_seq_header(path)
        except Exception:
            return False
        return {"path": path}

    @classmethod
    def get_supported_extensions(cls) -> set:
        return {"seq"}
