"""Convert sig-major ("transposed") datasets to C-order .npy
(reference: libertem/contrib/convert_transposed.py:14 — via a
RecordUDF subclass over the transposed stream; here a host-side
streaming transpose since the transposed layout never reaches the
device path).
"""
from __future__ import annotations

import numpy as np


def convert_transposed_to_npy(
    src_path: str, out_path: str, nav_shape, sig_shape, dtype,
    data_offset: int = 0, chunk_px: int = 1024,
):
    """A (sig..., nav...) file on disk -> (nav..., sig...) .npy.

    Streams sig-pixel rows: the source stores, for each signal pixel,
    all nav values contiguously; the output memmap is filled one
    sig-pixel column at a time (bounded memory).
    """
    nav_shape = tuple(int(x) for x in nav_shape)
    sig_shape = tuple(int(x) for x in sig_shape)
    dtype = np.dtype(dtype)
    n_nav = int(np.prod(nav_shape))
    n_sig = int(np.prod(sig_shape))
    src = np.memmap(
        src_path, dtype=dtype, mode="r", offset=data_offset,
        shape=(n_sig, n_nav),
    )
    out = np.lib.format.open_memmap(
        out_path, mode="w+", dtype=dtype,
        shape=nav_shape + sig_shape,
    )
    flat_out = out.reshape(n_nav, n_sig)
    for s0 in range(0, n_sig, chunk_px):
        s1 = min(n_sig, s0 + chunk_px)
        flat_out[:, s0:s1] = src[s0:s1, :].T
    out.flush()
    return out_path
