"""Tiling scheme + negotiation.

TPU-native counterpart of the reference's
``libertem/io/dataset/base/tiling_scheme.py`` (TilingScheme:25,
Negotiator:173, get_scheme:223).

Key design difference: the reference negotiates *dynamic* per-partition
tile shapes tuned for CPU L3 cache; XLA wants **one static block shape
per run** so each jit-compiled tile step is compiled once and reused.
A scheme here is:

  * ``depth``  — frames per device block (static),
  * ``sig_slices`` — a static list of sig-space :class:`Slice` s
    (usually exactly one covering the whole frame — TPU HBM holds full
    frames easily; sig is only split for pathologically large frames or
    when a UDF asks for small tiles).

Blocks shorter than ``depth`` (partition tails, roi remainders) are
zero-padded and carry a validity mask instead of triggering a fresh
compilation.
"""
from __future__ import annotations

import math
from typing import TYPE_CHECKING, Optional, Sequence

import numpy as np

from ..common.math import prod
from ..common.shape import Shape
from ..common.slice import Slice

if TYPE_CHECKING:
    from ..udf.base import UDF


# Depth markers mirroring the reference's UDF tiling preferences
# (common/udf.py:15-25 TileDepthEnum/TileSizeEnum/TilingPreferences).
# The module-level sentinels ARE the enum members, so both the
# reference spelling (TileDepthEnum.TILE_DEPTH_DEFAULT) and the
# sentinel spelling (UDF.TILE_DEPTH_DEFAULT) compare identical.
import enum


class TileDepthEnum(enum.Enum):
    TILE_DEPTH_DEFAULT = object()
    TILE_DEPTH_MAX = object()  # "whole partition" (PARTITION UDFs)


class TileSizeEnum(enum.Enum):
    TILE_SIZE_BEST_FIT = object()
    TILE_SIZE_MAX = object()


TILE_DEPTH_DEFAULT = TileDepthEnum.TILE_DEPTH_DEFAULT
TILE_DEPTH_MAX = TileDepthEnum.TILE_DEPTH_MAX
TILE_SIZE_BEST_FIT = TileSizeEnum.TILE_SIZE_BEST_FIT
TILE_SIZE_MAX = TileSizeEnum.TILE_SIZE_MAX

try:
    from typing import TypedDict

    class TilingPreferences(TypedDict):
        # reference common/udf.py:23
        depth: object
        total_size: object
except ImportError:  # pragma: no cover
    TilingPreferences = dict


class TilingScheme:
    def __init__(
        self,
        depth: int,
        sig_slices: Sequence[Slice],
        dataset_shape: Shape,
        intent: str = "tile",
    ):
        self._depth = int(depth)
        self._sig_slices = list(sig_slices)
        self._dataset_shape = dataset_shape
        self._intent = intent  # 'tile' | 'frame' | 'partition'

    @classmethod
    def make_for_shape(
        cls,
        tileshape: Shape,
        dataset_shape: Shape,
        intent: str = "tile",
    ) -> "TilingScheme":
        """Build a scheme from a (depth, *sig_tile) shape, tiling the
        full sig space in a grid."""
        depth = tileshape[0]
        sig_tile = tuple(tileshape)[1:]
        full_sig = Slice.from_shape(
            tuple(dataset_shape.sig), sig_dims=dataset_shape.sig.dims
        )
        sig_slices = list(full_sig.subslices(sig_tile))
        return cls(depth, sig_slices, dataset_shape, intent)

    @property
    def depth(self) -> int:
        return self._depth

    @property
    def intent(self) -> str:
        return self._intent

    @property
    def dataset_shape(self) -> Shape:
        return self._dataset_shape

    @property
    def slices(self):
        """Enumerated (idx, sig Slice) pairs."""
        return list(enumerate(self._sig_slices))

    @property
    def sig_slices(self) -> list[Slice]:
        return list(self._sig_slices)

    def __getitem__(self, idx: int) -> Slice:
        return self._sig_slices[idx]

    def __len__(self) -> int:
        return len(self._sig_slices)

    @property
    def shape(self) -> Shape:
        """Shape of the (largest) tile: (depth, *sig_tile)."""
        first = self._sig_slices[0]
        return Shape(
            (self._depth,) + tuple(first.shape),
            sig_dims=self._dataset_shape.sig.dims,
        )

    def __eq__(self, other):
        return (
            isinstance(other, TilingScheme)
            and self._depth == other._depth
            and self._sig_slices == other._sig_slices
            and tuple(self._dataset_shape) ==
            tuple(other._dataset_shape)
            and self._intent == other._intent
        )

    def __hash__(self):
        return hash((self._depth, len(self._sig_slices),
                     tuple(self._dataset_shape), self._intent))

    def adjust_for_partition(self, partition) -> "TilingScheme":
        """PARTITION-intent schemes mean "the whole partition as one
        tile": when the partition's depth differs from the scheme's,
        return a scheme matching it; otherwise return self UNCHANGED
        (identity matters — callers cache compiled consumers per
        scheme object; reference io/dataset/base/tiling_scheme.py
        adjust_for_partition, pinned by tests/io/
        test_tiling_scheme.py)."""
        if self._intent != "partition":
            return self
        p_depth = int(partition.slice.shape[0])
        if p_depth == self._depth:
            return self
        return TilingScheme(
            p_depth, self._sig_slices, self._dataset_shape,
            self._intent,
        )

    def __repr__(self):
        return (
            f"<TilingScheme depth={self._depth} "
            f"n_sig_slices={len(self._sig_slices)} intent={self._intent}>"
        )


class Negotiator:
    """Reconcile UDF tiling preferences, dataset constraints and device
    budgets into one static :class:`TilingScheme`.

    Reference contract: tiling_scheme.py:223 ``get_scheme``.  Inputs kept:
    UDF prefs (depth / total size / method), dataset base shape & max io
    size; output is static per run instead of per partition.
    """

    # ~64 MiB of input data staged per device block: big enough to
    # amortize dispatch, small enough to double-buffer in HBM.
    TARGET_BLOCK_BYTES = 64 * 1024 * 1024
    MAX_SIG_BYTES = 256 * 1024 * 1024  # split sig above this (per frame)

    def get_scheme(
        self,
        udfs: Sequence["UDF"],
        dataset_shape: Optional[Shape] = None,
        read_dtype=None,
        max_partition_frames: Optional[int] = None,
        approx_partition_shape: Optional[Shape] = None,
        corrections=None,
        max_io_size: Optional[int] = None,
        dataset=None,
        roi=None,
    ) -> TilingScheme:
        # reference calling convention (tiling_scheme.py:223): pass
        # the DATASET plus an approx partition shape; this engine's
        # runner passes the resolved shape/frame-budget directly.
        # Accept both (pinned by the reference's test_hdf5.py
        # test_hdf5_result_dtype driving the reference signature).
        if dataset is not None:
            if dataset_shape is None:
                dataset_shape = dataset.shape
            if max_io_size is None:
                get_mis = getattr(dataset, "get_max_io_size", None)
                if get_mis is not None:
                    max_io_size = get_mis()
        if max_partition_frames is None:
            if approx_partition_shape is not None:
                max_partition_frames = int(
                    tuple(approx_partition_shape)[0]
                )
            else:
                max_partition_frames = dataset_shape.nav.size
        if read_dtype is None:
            read_dtype = np.float32
        itemsize = np.dtype(read_dtype).itemsize
        frame_bytes = dataset_shape.sig.size * itemsize
        # dataset-imposed IO ceiling (reference: dataset.py:332
        # get_max_io_size), e.g. chunked HDF5 — applied per call, not
        # stored, so a Negotiator reused across datasets doesn't
        # inherit a previous dataset's ceiling
        target_block_bytes = self.TARGET_BLOCK_BYTES
        if max_io_size is not None:
            target_block_bytes = min(
                target_block_bytes, int(max_io_size)
            )

        methods = [u.get_method() for u in udfs]
        prefs = [u.get_tiling_preferences() for u in udfs]

        intent = "tile"
        if "partition" in methods:
            intent = "partition"
        elif all(m == "frame" for m in methods):
            intent = "frame"

        # --- depth -----------------------------------------------------
        if intent == "partition":
            depth = max(1, int(max_partition_frames))
            # PARTITION-method UDFs get whole partitions as one
            # device block; refuse silently OOM-ing the device
            block_bytes = depth * frame_bytes
            budget = 2 * 1024 * 1024 * 1024
            if block_bytes > budget:
                raise ValueError(
                    f"a PARTITION-method UDF needs whole partitions "
                    f"on the device, but the largest partition is "
                    f"{block_bytes / 1e9:.1f} GB "
                    f"({depth} frames); increase the dataset's "
                    f"num_partitions (or use process_tile)"
                )
        else:
            depth = self._negotiate_depth(
                prefs, frame_bytes, target_block_bytes
            )
            depth = min(depth, max(1, int(max_partition_frames)))
        # round up to a sublane multiple for good VPU layout
        if depth > 8:
            depth = int(math.ceil(depth / 8) * 8)

        # --- sig splitting ----------------------------------------------
        sig_shape = tuple(dataset_shape.sig)
        wanted_size = self._negotiate_size(prefs)
        sig_tile = sig_shape
        # FRAME/PARTITION-method UDFs are guaranteed whole frames
        # (reference: tiling_scheme.py intent 'frame'/'partition'
        # always covers the full sig): never sig-split for them, even
        # when a co-running tile UDF asks for small tiles.  Each sig
        # sub-rectangle would otherwise be dispatched to
        # process_frame/process_partition as if it were a whole frame,
        # silently overwriting results per slice.  Tile-method UDFs
        # whose math needs the full frame (FFTs, per-frame minima,
        # full-frame gathers) declare `whole_frames: True` in their
        # tiling preferences.
        whole_sig_required = any(
            m in ("frame", "partition") for m in methods
        ) or any(p.get("whole_frames") for p in prefs)
        # reference-style chunk-aware sig split (tiling_scheme.py's
        # base-shape negotiation, pinned by test_hdf5.py
        # test_hdf5_tileshape_negotation): when the DATASET was passed
        # and reports a sig base shape FINER than the full frame
        # (chunked HDF5), tile-method schemes follow the chunk grid so
        # host-compat readers stay chunk-cache friendly.  The engine's
        # own calls pass dataset_shape only, so the flat device feed
        # never sig-splits on this path.
        if not whole_sig_required and dataset is not None:
            get_bs = getattr(dataset, "get_base_shape", None)
            base_sig = (
                tuple(get_bs(roi))[1:] if get_bs is not None else None
            )
            if base_sig and tuple(base_sig) != tuple(sig_shape) and \
                    all(
                        s % b == 0
                        for s, b in zip(sig_shape, base_sig)
                    ):
                sig_tile = tuple(base_sig)
        if not whole_sig_required and (
            frame_bytes > self.MAX_SIG_BYTES or (
                wanted_size is not None and wanted_size < frame_bytes
            )
        ):
            budget = (
                wanted_size if wanted_size is not None
                else self.MAX_SIG_BYTES
            )
            sig_tile = self._split_sig(sig_shape, itemsize, budget)
        elif (
            intent != "partition"
            and whole_sig_required
            and frame_bytes > self.MAX_SIG_BYTES
        ):
            # keep whole frames but shrink the block depth so the
            # staged block still fits the device budget.  PARTITION
            # intent is exempt: its block must stay the whole
            # partition (guarded by the 2 GB budget check above) —
            # shrinking depth here would dispatch process_partition
            # once per sub-block.
            depth = max(
                1, min(depth, target_block_bytes // frame_bytes or 1)
            )

        tileshape = Shape(
            (depth,) + sig_tile, sig_dims=dataset_shape.sig.dims
        )
        scheme = TilingScheme.make_for_shape(
            tileshape, dataset_shape, intent=intent
        )
        if corrections is not None and len(scheme) > 1:
            # keep excluded-pixel repair environments inside one tile
            # (reference: corrset.py:181 adjust_tileshape)
            scheme = corrections.adjust_scheme(scheme, dataset_shape)
        return scheme

    def _negotiate_depth(
        self, prefs, frame_bytes: int, target_block_bytes: int = None,
    ) -> int:
        if target_block_bytes is None:
            target_block_bytes = self.TARGET_BLOCK_BYTES
        depth_default = max(
            1, target_block_bytes // max(1, frame_bytes)
        )
        depth_default = int(min(4096, max(8, depth_default)))
        depths = []
        for p in prefs:
            d = p.get("depth", TILE_DEPTH_DEFAULT)
            if d is TILE_DEPTH_DEFAULT:
                continue
            if d is TILE_DEPTH_MAX:
                depths.append(1 << 30)
            else:
                depths.append(int(d))
        if not depths:
            return depth_default
        # honor the smallest explicit request (all UDFs share one pass)
        return max(1, min(depths))

    def _negotiate_size(self, prefs) -> Optional[int]:
        sizes = []
        for p in prefs:
            s = p.get("total_size", TILE_SIZE_MAX)
            if s in (TILE_SIZE_MAX, TILE_SIZE_BEST_FIT):
                continue
            sizes.append(int(s))
        return min(sizes) if sizes else None

    def _split_sig(
        self, sig_shape: tuple, itemsize: int, budget: int
    ) -> tuple:
        """Split the first sig axis until a single-depth tile fits
        ``budget`` bytes (keeping the fast axes contiguous)."""
        sig = list(sig_shape)
        while prod(sig) * itemsize > budget and sig[0] > 1:
            sig[0] = (sig[0] + 1) // 2
        return tuple(sig)
