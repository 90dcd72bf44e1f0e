"""Gatan K2 IS dataset
(reference: libertem/io/dataset/k2is.py:727 — 8 sector .bin files;
each is a stream of 0x5758-byte blocks: a 40-byte big-endian header
[sync 0xFFFF0055, version u1, flags u1 (bit0 = shutter active),
block_count u4, width u2 (256), height u2 (1860), frame_id u4,
pixel_x_start/y_start/x_end/y_end u2, block_size u4] followed by
930x16 pixels packed as 12-bit little-endian (k2is.py:27–34, 582).

A frame is 1860x2048: 8 sectors of 256 columns, each sector receiving
32 blocks per frame (16 x-positions x 2 y-halves).  Sector streams
may start mid-frame and at different frames ("multi-sector sync",
reference K2Syncer:315); here all block headers are scanned
vectorized via memmap and grouped by frame_id — frames with a
complete 8x32 block set are the usable ones, starting at the first
shutter-active frame.
"""
from __future__ import annotations

import glob
import os
import re
from typing import Iterator, Optional, Sequence

import numpy as np

from ...common.shape import Shape
from ...native import decode_uint12_le as _decode_uint12_le
from .base import (
    DataSet,
    DataSetException,
    DataSetMeta,
    Partition,
)

def decode_uint12_le(inp, out=None):
    """Unpack little-endian 12-bit pairs to u16 (reference
    k2is.py decode_uint12_le — same signature: fills ``out`` when
    given; native C++ kernel under the hood, numpy fallback)."""
    vals = _decode_uint12_le(np.ascontiguousarray(inp))
    if out is None:
        return vals
    n = min(len(vals), len(out))
    out[:n] = vals[:n]
    return out


HEADER_SIZE = 40
BLOCK_SIZE = 0x5758
DATA_SIZE = BLOCK_SIZE - HEADER_SIZE
BLOCK_SHAPE = (930, 16)
BLOCKS_PER_SECTOR_PER_FRAME = 32
NUM_SECTORS = 8
SECTOR_SIZE = (2 * 930, 256)
SHUTTER_ACTIVE_MASK = 0x1
SYNC_MAGIC = 0xFFFF0055


def get_filenames(path, disable_glob: bool = False) -> list:
    """Sector-file discovery (reference k2is.py:239-257): the .gtg
    sidecar or any sector .bin yields every sibling ``*.bin`` (a
    trailing sector counter on a .bin is stripped first)."""
    path = os.fspath(path)
    if disable_glob:
        return [path]
    base, ext = os.path.splitext(path)
    ext = ext.lower()
    if ext == ".gtg":
        pattern = glob.escape(base) + "*.bin"
    elif ext == ".bin":
        pattern = glob.escape(re.sub(r"[0-9]+$", "", base)) + "*.bin"
    else:
        raise DataSetException(f"unrecognized k2is path {path}")
    return glob.glob(pattern)


def _sector_files(path: str) -> list:
    files = sorted(get_filenames(path))
    if len(files) != NUM_SECTORS:
        raise DataSetException(
            f"expected {NUM_SECTORS} sector files, found "
            f"{len(files)} for {pattern}"
        )
    return files


def _gtg_path(path: str):
    base, ext = os.path.splitext(path)
    if ext.lower() == ".gtg":
        return path
    return re.sub(r"\d+$", "", base) + ".gtg"


def _nav_shape_from_gtg(path: str):
    """Scan shape from the .gtg metadata file (a DM3 container;
    reference k2is.py:272 reads '.SI Dimensions.Size X/Y')."""
    gtg = _gtg_path(path)
    if not os.path.exists(gtg):
        return None
    try:
        from .dm import _DMParser
        p = _DMParser(gtg).parse()
        y = p.tags.get("SI Dimensions.Size Y")
        x = p.tags.get("SI Dimensions.Size X")
        if y is not None and x is not None:
            return (int(y), int(x))
    except Exception:
        return None
    return None


def _scan_sector(path: str, limit_bytes: int = None) -> dict:
    """Vectorized block-header scan of one sector file.

    Returns arrays (per block): offset, frame_id, x_start, y_start,
    shutter.
    """
    size = os.path.getsize(path)
    # find the first valid block: search for the sync magic on any
    # byte offset (robust against truncated stream starts)
    first = 0
    magic = np.array([0xFF, 0xFF, 0x00, 0x55], dtype=np.uint8)
    if limit_bytes is not None:
        size = min(size, int(limit_bytes))
    with open(path, "rb") as f:
        head = np.frombuffer(
            f.read(min(size, 2 * BLOCK_SIZE + 4)), dtype=np.uint8
        )
    limit = min(size - BLOCK_SIZE, 2 * BLOCK_SIZE)
    for off in range(0, max(1, limit)):
        if np.array_equal(head[off:off + 4], magic):
            first = off
            break
    n_blocks = (size - first) // BLOCK_SIZE
    if n_blocks <= 0:
        raise DataSetException(f"{path}: no complete blocks")
    # gather all block headers with chunked sequential preads
    # (strided mmap faulting is 20-100x slower on virtualized hosts;
    # see RangeReader)
    blocks = np.empty((n_blocks, HEADER_SIZE), dtype=np.uint8)
    per_chunk = max(1, (32 * 1024 * 1024) // BLOCK_SIZE)
    fd = os.open(path, os.O_RDONLY)
    try:
        for b0 in range(0, n_blocks, per_chunk):
            b1 = min(n_blocks, b0 + per_chunk)
            span0 = first + b0 * BLOCK_SIZE
            want = (b1 - b0 - 1) * BLOCK_SIZE + HEADER_SIZE
            raw = os.pread(fd, want, span0)
            buf = np.frombuffer(raw, dtype=np.uint8)
            got = (len(buf) - HEADER_SIZE) // BLOCK_SIZE + 1 \
                if len(buf) >= HEADER_SIZE else 0
            got = min(got, b1 - b0)
            if got <= 0:
                blocks = blocks[:b0]
                n_blocks = b0
                break
            blocks[b0:b0 + got] = np.lib.stride_tricks.as_strided(
                buf, shape=(got, HEADER_SIZE),
                strides=(BLOCK_SIZE, 1),
            )
            if got < b1 - b0:
                blocks = blocks[:b0 + got]
                n_blocks = b0 + got
                break
    finally:
        os.close(fd)

    def be(col, width):
        v = np.zeros(n_blocks, dtype=np.uint32)
        for i in range(width):
            v = (v << 8) | blocks[:, col + i]
        return v

    # real DataBlock.header_dtype layout (reference k2is.py:583):
    # sync u4 @0, padding1 @4-7, version u1 @8, flags u1 @9,
    # padding2 @10-15, block_count u4 @16, width u2 @20,
    # height u2 @22, frame_id u4 @24, pixel_x_start u2 @28,
    # pixel_y_start u2 @30, x_end @32, y_end @34, block_size u4 @36
    sync = be(0, 4)
    flags = blocks[:, 9].astype(np.uint32)
    width = be(20, 2)
    height = be(22, 2)
    frame_id = be(24, 4)
    x_start = be(28, 2)
    y_start = be(30, 2)
    valid = (
        (sync == SYNC_MAGIC)
        & (width == SECTOR_SIZE[1])
        & (height == SECTOR_SIZE[0])
    )
    offsets = first + np.arange(n_blocks, dtype=np.int64) * BLOCK_SIZE
    return {
        "offset": offsets[valid],
        "frame_id": frame_id[valid],
        "x_start": x_start[valid],
        "y_start": y_start[valid],
        "shutter": (flags[valid] & SHUTTER_ACTIVE_MASK) == 1,
    }


class K2ISPartition(Partition):
    def __init__(self, files, frame_table, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._files = files
        # frame_table: (n_frames, NUM_SECTORS,
        #               BLOCKS_PER_SECTOR_PER_FRAME) block offsets
        self._table = frame_table
        self._readers = {}

    def _get_reader(self, s):
        if s not in self._readers:
            from .base import RangeReader
            self._readers[s] = RangeReader(self._files[s], self.io_backend)
        return self._readers[s]

    def _read_raw_frames(self, start: int, stop: int) -> np.ndarray:
        h, w = SECTOR_SIZE
        out = np.empty(
            (stop - start, h, NUM_SECTORS * w), dtype=np.uint16
        )
        bh, bw = BLOCK_SHAPE
        for fi in range(start, stop):
            frame = out[fi - start]
            for s in range(NUM_SECTORS):
                reader = self._get_reader(s)
                x0_sector = s * w
                blocks = self._table[fi][s]
                # one read for the covering span when the frame's
                # blocks are contiguous on disk (the common case)
                span = None
                if len(blocks):
                    offs = np.asarray([b[0] for b in blocks])
                    lo, hi = int(offs.min()), int(offs.max())
                    if hi - lo <= (len(blocks) + 2) * BLOCK_SIZE:
                        span = reader.read(lo, hi - lo + BLOCK_SIZE)
                for off, xs, ys in blocks:
                    if span is not None:
                        payload = span[
                            off - lo + HEADER_SIZE:off - lo + BLOCK_SIZE
                        ]
                    else:
                        payload = reader.read(
                            off + HEADER_SIZE,
                            BLOCK_SIZE - HEADER_SIZE,
                        )
                    pixels = decode_uint12_le(payload)[
                        :bh * bw
                    ].reshape(bh, bw)
                    frame[
                        ys:ys + bh,
                        x0_sector + xs:x0_sector + xs + bw,
                    ] = pixels
        # an equal-size user sig_shape reshapes the detector frames
        return out.reshape(
            (stop - start,) + tuple(self.meta.shape.sig)
        )


class K2ISDataSet(DataSet):
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

    def initialize(self, executor=None) -> "K2ISDataSet":
        files = _sector_files(self._path)
        scans = [_scan_sector(f) for f in files]
        # group blocks per frame_id per sector
        frame_ids = None
        per_sector: list = []
        for scan in scans:
            groups: dict = {}
            for off, fid, xs, ys, sh in zip(
                scan["offset"], scan["frame_id"], scan["x_start"],
                scan["y_start"], scan["shutter"],
            ):
                groups.setdefault(int(fid), []).append(
                    (int(off), int(xs), int(ys), bool(sh))
                )
            complete = {
                fid: blocks for fid, blocks in groups.items()
                if len(blocks) == BLOCKS_PER_SECTOR_PER_FRAME
            }
            per_sector.append(complete)
            ids = set(complete)
            frame_ids = ids if frame_ids is None else (
                frame_ids & ids
            )
        if not frame_ids:
            raise DataSetException("no complete frames found")
        ordered = sorted(frame_ids)
        # start at the first frame with the shutter-active flag
        start_idx = 0
        for i, fid in enumerate(ordered):
            if any(b[3] for b in per_sector[0][fid]):
                start_idx = i
                break
        gtg_nav = (
            None if self._nav_shape else
            _nav_shape_from_gtg(self._path)
        )
        if gtg_nav and start_idx > 0:
            # scan-mode acquisitions set the shutter flag one frame
            # LATE on real hardware: the true first scan-grid frame
            # is the one before the first flagged frame (reference
            # k2is.py:815-822 skip_frames=-1 when a .gtg nav shape
            # exists)
            start_idx -= 1
        ordered = ordered[start_idx:]
        table = []
        for fid in ordered:
            row = []
            for s in range(NUM_SECTORS):
                row.append([
                    (off, xs, ys)
                    for off, xs, ys, _ in per_sector[s][fid]
                ])
            table.append(row)
        self._files = files
        self._table = table
        image_count = len(table)
        nav_shape = self._nav_shape or gtg_nav
        if not nav_shape:
            side = int(np.sqrt(image_count))
            nav_shape = (
                (side, side) if side * side == image_count
                else (image_count,)
            )
        sig_shape = (SECTOR_SIZE[0], NUM_SECTORS * SECTOR_SIZE[1])
        if self._sig_shape is not None:
            if int(np.prod(self._sig_shape)) != int(
                np.prod(sig_shape)
            ):
                # reference k2is.py:792 raises on a SIZE mismatch;
                # an equal-size sig_shape reshapes the frames
                raise DataSetException(
                    f"sig_shape {tuple(self._sig_shape)} does not "
                    f"match the K2 IS detector size {sig_shape}"
                )
            sig_shape = tuple(self._sig_shape)
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

    @property
    def diagnostics(self):
        return [
            {"name": "sectors", "value": str(NUM_SECTORS)},
            {"name": "complete frames",
             "value": str(self.meta.image_count)},
            {"name": "blocks per frame",
             "value": str(
                 NUM_SECTORS * BLOCKS_PER_SECTOR_PER_FRAME
             )},
        ]

    def get_partitions(self) -> Iterator[K2ISPartition]:
        for idx, (start, stop) in enumerate(self.get_partition_ranges()):
            yield K2ISPartition(
                self._files, self._table,
                self.meta, start, stop - start, idx=idx,
                io_backend=self._io_backend,
            )

    @classmethod
    def detect_params(cls, path: str, executor=None):
        if not path.lower().endswith((".gtg", ".bin")):
            return False
        try:
            files = _sector_files(path)
            # probe a handful of blocks only — detection must not
            # read a whole multi-GB sector file
            scan = _scan_sector(
                files[0], limit_bytes=8 * BLOCK_SIZE
            )
            if len(scan["offset"]) == 0:
                return False
        except Exception:
            return False
        return {"path": path}

    @classmethod
    def get_supported_extensions(cls) -> set:
        return {"gtg", "bin"}
