"""Fused moments + mask-matmul kernel — the flagship Pallas op.

Computes, in a single pass over a ``(depth, pixels)`` frame block:

  * ``y = x @ masks``            per-frame mask projections (MXU)
  * ``colsum = sum_d x``         per-pixel first moment
  * ``colvar``                   per-pixel centered second moment,
                                 Chan-combined across row tiles

This replaces what the generic UDF path does in ~7 HBM passes
(ApplyMasksUDF matmul + CoMUDF matmul + SumSigUDF reduce + SumUDF
reduce + StdDevUDF's mean/diff²/sum) with ONE read of the block:
the row tile sits in VMEM and feeds the MXU and both VPU reduction
trees before the next tile is fetched.  The reference's equivalents
are separate numba/BLAS passes (udf/masks.py:12 ApplyMasksEngine,
udf/stddev.py:124 process_tile, udf/sum.py, udf/sumsigudf.py).

Variance uses per-row-tile two-pass (tile mean → centered squares,
both over the VMEM-resident tile) with Chan/Golub/LeVeque combination
across tiles — numerically equivalent to the reference's parallel
variance (udf/stddev.py:12) and stable for narrow distributions with
large means, unlike a naive sum-of-squares.

Contract: rows >= ``valid_count`` MUST be zero on input (the host
streaming layer zero-pads tails; corrections re-zero them) — the
matmul and colsum rely on it, and only the variance's centered term
applies an explicit row mask.  On non-TPU backends a jnp fallback
computes the same values.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _matmul_precision():
    """Mask-matmul MXU precision.  'highest' (default) runs full-f32
    multi-pass products (~1e-6 rel err, parity-grade) at a real
    throughput cost; 'default' uses the TPU's native bf16-class pass
    (~1e-4 rel err, ~60% faster end-to-end).  Env:
    LIBERTEM_TPU_MATMUL_PRECISION=highest|default.

    Latched ONCE PER RUN: ``UDFRunner._prepare`` reads it at run
    setup (udf/base.py ``matmul_precision`` prep entry), so a flip
    takes effect at the NEXT run — never mid-run via a stale cached
    executable (tests/test_moments.py
    test_precision_env_flips_between_runs pins this contract)."""
    import os
    v = os.environ.get(
        "LIBERTEM_TPU_MATMUL_PRECISION", "highest"
    ).lower()
    if v == "default":
        return None
    return jax.lax.Precision.HIGHEST


def _pick_row_tile(
    depth: int, pixels: int, itemsize: int = 4, sublane: int = 8,
    budget: int = 10 * 1024 * 1024,
) -> int:
    """Largest row-tile (multiple of the dtype's sublane requirement,
    dividing depth) whose VMEM footprint stays within budget."""
    td = max(
        sublane,
        (budget // max(1, pixels * itemsize))
        // sublane * sublane,
    )
    td = min(td, depth)
    while depth % td != 0 and td > sublane:
        td -= sublane
    if depth % td != 0:
        td = depth  # tiny depths: single tile
    return td


_SUBLANE = {1: 32, 2: 16, 4: 8, 8: 8}


def _cast_f32(x, via_i32=False):
    """VMEM cast to f32; Mosaic lacks direct small-uint -> f32.
    ``via_i32`` additionally routes 4-byte ints through i32 — exact
    for value-certified blocks (|x| <= 65536), and the path Mosaic
    reliably lowers for u32."""
    if x.dtype == jnp.float32:
        return x
    k = np.dtype(x.dtype).kind
    sz = np.dtype(x.dtype).itemsize
    if k in "ui" and (sz < 4 or via_i32):
        return x.astype(jnp.int32).astype(jnp.float32)
    return x.astype(jnp.float32)


def _split_mask_terms(masks_t):
    """Decompose an f32 mask stack into THREE exactly-bf16-valued
    f32 terms covering all 24 significand bits (m = m0 + m1 + m2).

    FOLD-PROOF by construction: the backend compiles with
    --xla_allow_excess_precision=true, which lets XLA fold a
    convert(convert(m, bf16), f32) round-trip into the IDENTITY —
    the original round-trip formulation silently degenerated the
    decomposition to [m, 0, 0] on hardware (round-5 finding;
    measured: the jitted residual was exactly zero on the axon
    backend.  Mosaic inside the Pallas kernel does NOT fold, which
    is why the data-side terms were unaffected).  Integer
    bit-masking cannot be folded: zeroing the low 16 bits of the
    f32 encoding IS the bf16 truncation (bf16 = the top 16 bits of
    f32), each term is bf16-representable BY VALUE (m0, m1 keep 8
    significand bits; the final residual holds the remaining <= 8
    after normalization), and both subtractions are Sterbenz-exact
    (|m0| <= |m| <= |m0|*(1 + 2^-7), same sign)."""

    def trunc_bf16(v):
        bits = jax.lax.bitcast_convert_type(v, jnp.uint32)
        return jax.lax.bitcast_convert_type(
            bits & jnp.uint32(0xFFFF0000), jnp.float32
        )

    m0 = trunc_bf16(masks_t)
    rm = masks_t - m0
    m1 = trunc_bf16(rm)
    return m0, m1, rm - m1


@functools.partial(
    jax.jit,
    static_argnames=(
        "compute_var", "interpret", "precision", "split_matmul",
        "mxu_colsum", "data_terms", "raw_moment_var",
    ),
)
def _fused_moments_pallas(
    x, masks_t, valid_count, compute_var: bool = True,
    interpret: bool = False, precision=None,
    split_matmul: bool = False, mxu_colsum: bool = False,
    data_terms: Optional[int] = None,
    raw_moment_var: Optional[bool] = None,
):
    """Pallas TPU implementation.  x: (D, P) any real dtype,
    masks_t: (M, P) f32 — transposed so the contraction runs along
    the 128-lane axis and the small mask count M sits in sublanes
    (a (P, M) operand would pad M up to 128 lanes and waste ~20x
    VMEM + bandwidth), valid_count: () int32.

    ``data_terms`` (split path only) overrides the dtype-derived
    bf16 term count with a VALUE-derived one: the caller certifies
    every element of ``x`` is an INTEGER exactly representable in
    that many round-trip bf16 terms (1 term: |x| <= 256 — bf16
    carries 8 significand bits; 2 terms: |x| <= 65536 — the
    round-trip residual of such an integer is itself an integer
    <= 256, hence bf16-exact).  The host feed probes each block
    (UDFRunner._block_data_terms): u16 counting-detector data with
    small counts runs ONE MXU pass per tile instead of two, and f32
    / 32-bit-int storage holding integer counts — post-processed
    counting data, the reference's corrected-data common case —
    drops from three passes to one or two.  Bit-identical results."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    depth, pixels = x.shape
    n_masks = masks_t.shape[0]
    itemsize = np.dtype(x.dtype).itemsize
    import os
    # split default 6 MB -> td=64 at the headline 128x128 sig (best
    # in the round-3 hardware sweep, benchmarks/bench_split_tile.py;
    # fits scoped VMEM now that the mask decomposition is hoisted).
    # 4-byte split inputs (f32 / certified i32-u32) carry a 2x-wider
    # input tile PLUS up to three f32 term copies: td=64 overflows
    # the 16M scoped-VMEM limit at the headline sig (measured 18.67M
    # for the 2-term f32 path; the dtype-derived 3-term f32 path
    # failed compile the same way) -> 2 MB model budget lands td=32,
    # ~12M worst case
    if split_matmul:
        default_mb = "2" if itemsize == 4 else "6"
    else:
        default_mb = "10"
    budget_mb = int(os.environ.get(
        "LIBERTEM_TPU_MOMENTS_TILE_MB", default_mb
    ))
    td = _pick_row_tile(
        depth, pixels, max(4, itemsize),
        sublane=_SUBLANE.get(itemsize, 8),
        # the split path holds the term copies + dot intermediates
        # alongside xt — halve the tile budget (override for tuning
        # via LIBERTEM_TPU_MOMENTS_TILE_MB)
        budget=budget_mb * 1024 * 1024,
    )
    n_steps = depth // td

    kind = np.dtype(x.dtype).kind
    nterms = data_terms
    if nterms is None:
        if kind in "ui" and itemsize == 1:
            nterms = 1
        elif kind in "ui" and itemsize == 2:
            nterms = 2
        else:
            # f32 (three-term bf16 decomposition, ~2^-24 residual)
            # and 32-bit ints (cast to f32 first — same grade as the
            # XLA fallback, which also computes in f32)
            nterms = 3
    # one-term INTEGER data (u8 by dtype, or value-certified
    # |x| <= 256 in ANY storage dtype) has exact f32 squares
    # (x^2 <= 65536, an exact integer) and an exact per-tile raw
    # second moment (sum <= td * 2^16 < 2^24 for td <= 256): the
    # variance can use sum(x^2) - n*mean^2 per tile — dropping the
    # centered subtract (1 VPU op/element), the row-validity
    # iota/compare/mask AND the lax.cond (padded zero rows contribute
    # exactly 0 to both S2 and colsum, so no masking is needed at
    # all).  Cross-tile Chan combination is unchanged, so there is no
    # global raw-moment cancellation — only the per-tile n*mean^2
    # rounding (~ulp(S2) per tile, zero for constant data since mean
    # is then exact).  data_terms certifies INTEGER values (see
    # docstring), so the certificate alone justifies the raw form.
    raw_sq = raw_moment_var
    if raw_sq is None:
        raw_sq = td <= 256 and (
            (nterms == 1 and kind in "ui") or data_terms == 1
        )

    def kernel(valid_ref, x_ref, masks_ref, y_ref, colsum_ref,
               colvar_ref):
        d = pl.program_id(0)
        valid = valid_ref[0]
        # padding rows are zero on entry (host zero-pads; corrections
        # re-zero) — matmul and colsum need no masking, only the
        # variance's centered term does.  Value-certified 4-byte int
        # blocks (|x| <= 65536) cast via i32 — exact, and the path
        # Mosaic reliably lowers for u32.
        xt = _cast_f32(
            x_ref[:],
            via_i32=(itemsize == 4 and data_terms is not None),
        )  # (td, P)

        # ---- mask projections (MXU), contracting over lanes ----
        if split_matmul:
            # f32-grade products from NATIVE bf16 MXU passes.
            # Three tricks make the split nearly free:
            #   1. The data side decomposes by bf16 ROUND-TRIP, not
            #      integer bit surgery: x0 = f32(bf16(xt)),
            #      x1 = xt - x0 (exact in f32).  For <=16-bit integer
            #      data the two terms reconstruct xt EXACTLY (x0
            #      rounds to 8 significand bits, the residual fits 8
            #      bits); 8-bit data is bf16-exact outright (one
            #      term); f32 needs three terms (residual ~2^-24).
            #      Cost: 2-3 VPU ops vs ~6 for shift/mask extraction.
            #   2. The MXU pads the output lane dim to 128, so a dot
            #      against an (M', P) mask stack costs the same for
            #      any M' <= 128: the THREE bf16 mask terms
            #      (covering f32's 24 significand bits) are
            #      CONCATENATED along the mask axis and every data
            #      term multiplies all of them in one pass — MXU
            #      passes = data terms only (u8/i8: 1, u16/i16: 2,
            #      f32: 3, the true information content).  Summing
            #      every term-pair column reconstructs the full
            #      product: rel err ~2^-24 + f32 accumulation.
            #   3. Every operand stays f32 in VMEM holding an
            #      exactly-bf16-representable VALUE, so the native
            #      matmul's internal f32->bf16 operand conversion is
            #      exact regardless of rounding mode and no bf16
            #      packing relayouts materialize.
            # The mask decomposition itself is HOISTED out of the
            # kernel (see _split_masks): it is loop-invariant across
            # grid steps, and computing it per step cost ~6 VPU ops
            # on a (M, P) stack — ~1 op/px of pure overhead at
            # td=32 on the kernel's VPU-bound critical path.
            mcat = masks_ref[:]  # (3M, P), precomputed split terms
            nm = n_masks

            def dot(a, b):
                return jax.lax.dot_general(
                    a, b,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            # data-side round-trips NEED round-to-nearest (truncation
            # would leave 9-bit residuals for 16-bit integers) and
            # live INSIDE the kernel: Mosaic lowers the convert pair
            # natively and does not fold it under
            # --xla_allow_excess_precision (measured on hardware,
            # round 5) — unlike XLA, which does (see
            # _split_mask_terms for the mask-side fix)
            if nterms == 1:
                terms = [xt]
            else:
                x0 = xt.astype(jnp.bfloat16).astype(jnp.float32)
                rx = xt - x0
                if nterms == 2:
                    terms = [x0, rx]
                else:
                    x1 = rx.astype(jnp.bfloat16).astype(jnp.float32)
                    terms = [x0, x1, rx - x1]
            acc = dot(terms[0], mcat)
            for t in terms[1:]:
                acc = acc + dot(t, mcat)
            y_ref[:] = (
                acc[:, :nm] + acc[:, nm:2 * nm] + acc[:, 2 * nm:]
            )

            # ---- first moment ----
            # mxu_colsum=True replaces the VPU reduce with ones-row
            # MXU contractions over the exactly-bf16-representable
            # split terms (exact f32 sum).  MEASURED SLOWER on
            # hardware: 126 vs 136 GB/s at the headline shape
            # (benchmarks/bench_split_tile.py) — the extra (1, P)
            # passes serialize against the mask matmul, while the
            # VPU reduce overlaps it; the variant also tipped the
            # td=64 tile over the 16M scoped-VMEM limit.  Kept
            # behind the flag for the record.
            if mxu_colsum:
                ones_row = jnp.ones((1, td), jnp.float32)

                def rdot(a, b):
                    return jax.lax.dot_general(
                        a, b,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                local_sum = rdot(ones_row, terms[0])
                for t in terms[1:]:
                    local_sum = local_sum + rdot(ones_row, t)
            else:
                local_sum = jnp.sum(xt, axis=0, keepdims=True)
        else:
            y_ref[:] = jax.lax.dot_general(
                xt, masks_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            # non-split path: xt is not bf16-representable, a
            # DEFAULT-precision MXU reduce would round it — keep the
            # exact VPU reduction
            local_sum = jnp.sum(xt, axis=0, keepdims=True)

        n1 = jnp.clip(valid - d * td, 0, td).astype(jnp.float32)
        n0 = jnp.minimum(d * td, valid).astype(jnp.float32)

        if compute_var:
            local_mean = local_sum / jnp.maximum(n1, 1.0)
            if raw_sq:
                # exact-integer raw second moment (see raw_sq above):
                # no subtract, no validity mask, no cond — padded
                # zero rows contribute exactly 0; converted to the
                # centered per-tile sum for the Chan combine below
                s2 = jnp.sum(xt * xt, axis=0, keepdims=True)
                local_var = jnp.maximum(
                    s2 - n1 * local_mean * local_mean, 0.0
                )
            else:
                # two-pass over the VMEM-resident tile; the
                # row-validity mask only matters on the tile
                # containing the valid boundary — interior (fully
                # valid) tiles take the cheaper unmasked branch
                # (saves the iota compare + the mask multiply per
                # element on every tile but one)
                def _var_full(_):
                    diff = xt - local_mean
                    return jnp.sum(
                        diff * diff, axis=0, keepdims=True
                    )

                def _var_masked(_):
                    row_ids = (
                        d * td
                        + jax.lax.broadcasted_iota(
                            jnp.int32, (td, 1), 0
                        )
                    )
                    row_valid = (
                        row_ids < valid
                    ).astype(jnp.float32)
                    diff = (xt - local_mean) * row_valid
                    return jnp.sum(
                        diff * diff, axis=0, keepdims=True
                    )

                local_var = jax.lax.cond(
                    (d + 1) * td <= valid, _var_full, _var_masked, 0
                )

        @pl.when(d == 0)
        def _():
            colsum_ref[:] = local_sum
            if compute_var:
                colvar_ref[:] = local_var
            else:
                # the output buffer is always allocated: zero it so
                # the var-disabled path matches the XLA fallback
                # instead of returning uninitialized memory
                colvar_ref[:] = jnp.zeros_like(local_sum)

        @pl.when(d != 0)
        def _():
            if compute_var:
                prev_sum = colsum_ref[:]
                prev_var = colvar_ref[:]
                n = jnp.maximum(n0 + n1, 1.0)
                mean0 = prev_sum / jnp.maximum(n0, 1.0)
                mean1 = local_sum / jnp.maximum(n1, 1.0)
                delta = mean1 - mean0
                corr = delta * delta * (n0 * n1 / n)
                have_both = jnp.logical_and(n0 > 0, n1 > 0)
                colvar_ref[:] = jnp.where(
                    have_both,
                    prev_var + local_var + corr,
                    prev_var + local_var,
                )
            colsum_ref[:] = colsum_ref[:] + local_sum

    if split_matmul:
        # hoisted mask decomposition (see the kernel comment and
        # _split_mask_terms): three exactly-bf16-valued f32 terms,
        # computed ONCE at XLA level (loop-invariant, ~5 KB/mask)
        # instead of per grid step on the kernel's VPU-bound
        # critical path
        mask_op = jnp.concatenate(
            _split_mask_terms(masks_t), axis=0
        )
    else:
        mask_op = masks_t
    out_shapes = (
        jax.ShapeDtypeStruct((depth, n_masks), jnp.float32),
        jax.ShapeDtypeStruct((1, pixels), jnp.float32),
        jax.ShapeDtypeStruct((1, pixels), jnp.float32),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(
                (td, pixels), lambda i, *_: (i, 0),
            ),
            pl.BlockSpec(
                (mask_op.shape[0], pixels), lambda i, *_: (0, 0),
            ),
        ],
        out_specs=(
            pl.BlockSpec((td, n_masks), lambda i, *_: (i, 0)),
            pl.BlockSpec((1, pixels), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, pixels), lambda i, *_: (0, 0)),
        ),
    )
    y, colsum, colvar = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * depth * pixels * n_masks + 6 * depth * pixels,
            bytes_accessed=(
                x.size * x.dtype.itemsize
                + masks_t.size * 4
                + depth * n_masks * 4 + 2 * pixels * 4
            ),
            transcendentals=0,
        ),
    )(valid_count.reshape(1).astype(jnp.int32), x, mask_op)
    return y, colsum[0], colvar[0]


class _ReadEnv:
    """Sentinel: 'read LIBERTEM_TPU_MATMUL_PRECISION at trace time'."""


_READ_ENV = _ReadEnv()


def _fused_moments_xla(x, masks_t, valid_count, compute_var=True,
                       precision=_READ_ENV):
    """Reference/fallback implementation with plain XLA ops.

    ``x`` may be (depth, pixels) OR (depth, *sig) — the matmul
    contracts over ALL trailing dims, so blocks keep their native
    (depth, h, w) device layout.  A ``reshape(depth, -1)`` on TPU is
    a physical relayout of the whole block ((8, 128)-tiled (h, w)
    minor dims -> flat lanes), measured at ~30% of total pipeline
    throughput — contracting in the native layout avoids the copy
    entirely.  ``masks_t`` is (n_masks, pixels) and is reshaped to
    the sig shape (a one-time constant-layout assignment, not a
    per-block copy).

    Padding rows are zero-filled by the host streaming layer
    (Partition.gen_blocks), so the matmul and colsum need no row
    masking — only the variance's centered term does (padded rows
    would otherwise contribute mean² each).
    """
    if precision is _READ_ENV:
        precision = _matmul_precision()
    depth = x.shape[0]
    sig_dims = tuple(range(1, x.ndim))
    masks_nd = masks_t.reshape((masks_t.shape[0],) + x.shape[1:])
    xt = x.astype(jnp.float32)
    y = jax.lax.dot_general(
        xt, masks_nd,
        dimension_numbers=((sig_dims, sig_dims), ((), ())),
        preferred_element_type=jnp.float32,
        # full-f32 MXU passes: the TPU default is bf16-class
        # (~1e-4 rel error on non-integer data); the baseline
        # demands float32 results
        precision=precision,
    )
    colsum = xt.sum(axis=0)
    if compute_var:
        row_valid = (
            jnp.arange(depth, dtype=jnp.int32) < valid_count
        ).astype(jnp.float32).reshape(
            (depth,) + (1,) * len(sig_dims)
        )
        n = jnp.maximum(valid_count.astype(jnp.float32), 1.0)
        mean = colsum / n
        diff = (xt - mean) * row_valid
        colvar = (diff * diff).sum(axis=0)
    else:
        colvar = jnp.zeros_like(colsum)
    return y, colsum, colvar


def _fused_moments_xla_onepass(x, masks_t, valid_count,
                               compute_var=True):
    """One-pass variance via per-pixel shifted moments:

      sum_valid (x - c)^2 - n*(mean - c)^2  ==  sum (x - mean)^2

    with c = the block's first row (always valid for n > 0, and close
    to the per-pixel mean for detector data), so there is no
    colsum -> mean -> diff data dependency forcing XLA into a second
    HBM pass over a materialized f32 copy: the cast block is read once
    and feeds the matmul + both reduction trees.  Numerically this is
    the classic "shifted data" variance — stable when c ~ mean, unlike
    a c=0 raw-moment sum of squares.
    """
    depth = x.shape[0]
    xt = x.astype(jnp.float32)
    y = jax.lax.dot_general(
        xt, masks_t,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_matmul_precision(),
    )
    colsum = xt.sum(axis=0)
    if compute_var:
        row_valid = (
            jnp.arange(depth, dtype=jnp.int32) < valid_count
        ).astype(jnp.float32)[:, None]
        c = jax.lax.stop_gradient(xt[0])
        diff = (xt - c) * row_valid
        m2 = (diff * diff).sum(axis=0)
        n = jnp.maximum(valid_count.astype(jnp.float32), 1.0)
        mean = colsum / n
        shift = mean - c
        colvar = jnp.maximum(m2 - n * shift * shift, 0.0)
    else:
        colvar = jnp.zeros_like(colsum)
    return y, colsum, colvar


# Kernel-dispatch history (all numbers same-chip-session, honest
# anti-DCE benchmarking via benchmarks/bench_fused_variants.py):
#   * the original "XLA 260 vs Pallas 140" comparison was invalid —
#     the harness let XLA dead-code-eliminate the mask matmul from
#     the timed loop while the opaque pallas_call could not be DCE'd;
#   * at the TPU-default (bf16-class) matmul precision the Pallas
#     kernel wins (~240 vs ~220 GB/s), but that precision shows
#     ~1e-4 relative error on non-integer (corrected) data — the
#     baseline demands float32 results;
#   * at Precision.HIGHEST (full-f32 MXU passes) XLA schedules the
#     multi-pass matmul against the reductions far better:
#     XLA ~183 vs Pallas ~121 GB/s.
# So the dispatch is precision-aware: at the full-f32 default the
# VMEM split-matmul kernel decomposes both operands into bf16 terms
# inside the tile (exact for narrow ints, ~2^-24 residual for f32)
# and runs every pass at native single-pass MXU speed — beating
# XLA's Precision.HIGHEST multi-pass scheduling; when
# LIBERTEM_TPU_MATMUL_PRECISION=default picks the native matmul the
# plain Pallas kernel wins (~189 vs ~143 GB/s end-to-end).  Set
# True/False to force one path.
USE_PALLAS = None  # None = auto (per matmul precision)


def _pallas_eligible(x, masks_t) -> bool:
    """Static eligibility check for the Pallas kernel.  The dispatch
    happens inside an outer jit trace, so a try/except around
    pallas_call cannot catch Mosaic lowering errors (they surface at
    the outer compile) — rule out the known-unsupported layouts
    up front instead."""
    depth, pixels = x.shape
    itemsize = np.dtype(x.dtype).itemsize
    sublane = _SUBLANE.get(itemsize, 8)
    td = _pick_row_tile(
        depth, pixels, max(4, itemsize), sublane=sublane
    )
    # the full mask stack is VMEM-resident (3 precomputed f32 split
    # terms on the split path = 3x); large stacks (e.g. radial-
    # Fourier bin series on big sig shapes) must take the XLA path
    # instead of failing the Mosaic compile with a VMEM overflow
    masks_bytes = int(masks_t.shape[0]) * pixels * 4
    # the chosen row tile must satisfy the dtype's sublane minimum
    # and lanes must fill a 128 block
    return (
        np.dtype(x.dtype).kind in "fiu"
        and td % sublane == 0
        and pixels % 128 == 0
        and masks_bytes * 3 <= 4 * 1024 * 1024
    )


def _splittable(x) -> bool:
    """Dtypes the VMEM split-matmul decomposes losslessly-enough:
    narrow ints (exact 256*hi + lo terms, signed via arithmetic
    shift) and f32 (three-term bf16 decomposition, ~2^-24 residual).
    Wider ints would need four byte terms — XLA handles those."""
    dt = np.dtype(x.dtype)
    return (dt.kind in "ui" and dt.itemsize <= 2) or dt == np.float32


def fused_moments(
    x, masks_t, valid_count, compute_var: bool = True,
    force_xla: bool = False, precision=_READ_ENV,
    data_terms: Optional[int] = None,
):
    """Dispatch, precision-aware (see USE_PALLAS comment): the
    Pallas kernel runs whenever the layout is eligible — in VMEM
    split-matmul form at the full-f32 default precision, in native
    single-pass form when LIBERTEM_TPU_MATMUL_PRECISION=default;
    ``USE_PALLAS`` True/False forces one path.

    x: (depth, pixels) or (depth, *sig) real array (any dtype; cast
       to f32 inside).  nD inputs contract over all trailing dims
       (XLA path only) and return sig-shaped colsum/colvar.
    masks_t: (n_masks, pixels) f32 (transposed mask stack)
    valid_count: () int32 — rows >= valid_count are padding
    precision: the matmul precision latched by the caller (the UDF
       runner reads the env var ONCE per run in ``_prepare`` and
       threads it through, so a mid-process env flip takes effect at
       the next run, never mid-run); direct callers that omit it get
       a trace-time env read.
    data_terms: optional static value-range certificate from the
       host feed — the number of bf16 round-trip terms that EXACTLY
       represent every element of ``x`` (1 when the block's values
       are integers with |x| <= 256).  Only consulted on the split
       Pallas path; fewer terms = fewer MXU passes, identical bits.

    Returns (y (depth, n_masks) f32, colsum/colvar shaped like
    x.shape[1:], f32).
    """
    backend = jax.default_backend()
    if precision is _READ_ENV:
        precision = _matmul_precision()
    eligible = (
        not force_xla and x.ndim == 2
        and backend in ("tpu", "axon")
        and _pallas_eligible(x, masks_t)
    )
    # a host-feed value certificate makes ANY storage dtype split-
    # eligible: the certified term count bounds |x| <= 65536, so the
    # bf16 round-trip decomposition is exact regardless of how wide
    # the container is (i32/u32 counting data in wide storage)
    certified = data_terms is not None
    use_pallas = USE_PALLAS
    if use_pallas is None:
        # auto: Pallas wins outright at native matmul precision; at
        # the default full-f32 precision the VMEM split-matmul
        # kernel (f32-grade products from native bf16 MXU passes)
        # beats XLA's multi-pass Precision.HIGHEST scheduling
        use_pallas = (
            precision is None or _splittable(x) or certified
        )
    if eligible and use_pallas:
        split = precision is not None and (
            _splittable(x) or certified
        )
        return _fused_moments_pallas(
            x, masks_t, jnp.asarray(valid_count),
            compute_var=compute_var,
            # static args: a mid-process precision change must not
            # hit a stale cached executable
            precision=None if split else precision,
            split_matmul=split,
            data_terms=data_terms if split else None,
        )
    return _fused_moments_xla(
        x, masks_t, valid_count, compute_var, precision=precision
    )
