"""Block-compacted sparse mask stacks.

The reference runs scipy.sparse / sparse.pydata mask stacks through
dedicated CPU kernels (``rmatmul`` common/numba/__init__.py:90,
dispatch udf/masks.py:12) because CPUs pay per-FLOP.  On TPU the MXU
makes the dense ``tile @ masks`` matmul bandwidth-bound up to ~240
mask columns, so per-element sparsity buys nothing there — what *does*
cost is (a) matmul FLOPs once ``n_masks`` grows large (hundreds of
template masks, e.g. blobfinder/cluster feature stacks) and (b) HBM
re-streaming of a mask operand too big for VMEM.

The TPU-idiomatic fix is **block compaction**: drop every 128-pixel
lane block that is zero across the WHOLE stack (the union support),
gather the surviving tile columns with a *static* index array (free to
fuse for XLA), and run one small dense MXU matmul on the compacted
operand.  FLOPs and mask bytes scale with the union support instead of
the frame size; numerics are exactly identical (dropped columns
contribute zero).

This beats the densified path whenever the stack's union support is
small — tiny-template stacks (blobfinder feature extraction: hundreds
of r~2 disks), point selectors, small-ROI virtual apertures.  Ring
stacks (radial Fourier) have near-full union support and stay dense.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

BLOCK = 128  # TPU lane width


def _to_blocks(arr, block, pad_fn):
    """(rows, pixels) -> (rows, n_blocks, block): pad the pixel axis
    to a block multiple (via ``pad_fn(arr, pad)``) and reshape."""
    rows, p = arr.shape
    nb = -(-p // block)
    pad = nb * block - p
    if pad:
        arr = pad_fn(arr, pad)
    return arr.reshape(rows, nb, block), nb


def _np_pad(arr, pad):
    return np.concatenate(
        [arr, np.zeros((arr.shape[0], pad), dtype=arr.dtype)], axis=1
    )


def block_support(stack_flat: np.ndarray, block: int = BLOCK):
    """Indices of pixel blocks where ANY mask is nonzero.

    stack_flat: (n_masks, pixels) host array.
    Returns (support_idx (S,) int32, n_blocks) — the pixel axis is
    padded up to a block multiple conceptually (tail block counted via
    the existing pixels only).
    """
    blocks, nb = _to_blocks(np.abs(stack_flat), block, _np_pad)
    per_block = blocks.sum(axis=(0, 2))
    support = np.flatnonzero(per_block != 0).astype(np.int32)
    if support.size == 0:
        support = np.zeros(1, dtype=np.int32)
    return support, nb


def compact_operand(
    stack_flat: np.ndarray, support: np.ndarray, block: int = BLOCK,
) -> np.ndarray:
    """(n_masks, pixels) -> (S*block, n_masks) operand restricted to
    the support blocks (transposed ready for ``gathered @ operand``)."""
    blocks, _ = _to_blocks(stack_flat, block, _np_pad)
    sel = blocks[:, support, :]
    m = stack_flat.shape[0]
    return np.ascontiguousarray(sel.reshape(m, -1).T)


def gather_blocks(flat_tile, support, block: int = BLOCK):
    """(depth, pixels) -> (depth, S*block): select the support blocks
    with a static index (XLA folds this into the consumer)."""
    d = flat_tile.shape[0]
    blocks, _ = _to_blocks(
        flat_tile, block,
        lambda a, pad: jnp.pad(a, ((0, 0), (0, pad))),
    )
    sel = blocks[:, jnp.asarray(support), :]
    return sel.reshape(d, -1)


def plan_compaction(stack_flat: np.ndarray, block: int = BLOCK,
                    max_fill: float = 0.5):
    """Decide and precompute: returns None when compaction doesn't
    pay (union support > max_fill of the frame), else a dict with
    support indices and the compacted (S*block, n_masks) operand."""
    support, nb = block_support(stack_flat, block)
    if support.size > max_fill * nb:
        return None
    return {
        "support": support,
        "n_blocks": nb,
        "block": block,
        "operand_c": compact_operand(stack_flat, support, block),
        "fill": support.size / nb,
    }
