"""ApplyMasksUDF: virtual detectors via mask-stack matmul — the
flagship kernel.

Counterpart of the reference's ``libertem/udf/masks.py``
(ApplyMasksUDF:127, ApplyMasksEngine:12) and ``common/container.py``
(MaskContainer:97).

TPU-native design: the reference dispatches between torch.mm /
scipy.sparse / sparse.pydata per tile on the host; here the mask stack
is evaluated once into a flattened ``(sig_pixels, n_masks)`` operand
held in device HBM, and each tile does one MXU matmul
``(depth, sig_pixels) @ (sig_pixels, n_masks)`` with float32
accumulation, fused by XLA into the tile step (cast + corrections +
matmul in one program).  Sparse mask stacks are densified into the
operand; when the stack's union support is small (tiny-template
stacks, point selectors) the operand is block-compacted instead —
static column gather + a small MXU matmul over the support blocks
(:mod:`libertem_tpu.ops.sparse_masks`), the TPU counterpart of the
reference's scipy.sparse/pydata kernels.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..common.slice import Slice
from .base import UDF


def _to_dense(mask) -> np.ndarray:
    if hasattr(mask, "todense"):
        return np.asarray(mask.todense())
    if hasattr(mask, "toarray"):
        return np.asarray(mask.toarray())
    return np.asarray(mask)


class MaskContainer:
    """Evaluate mask factories once; serve flattened per-sig-slice
    device operands (counterpart of common/container.py:97)."""

    def __init__(
        self,
        mask_factories: Union[Callable, Sequence[Callable]],
        dtype=None,
        use_sparse=None,
        count: Optional[int] = None,
        backend=None,
        default_sparse="scipy.sparse",
    ):
        self._factories = mask_factories
        self._dtype = dtype
        self._count = count
        self._stack: Optional[np.ndarray] = None  # (n_masks, *sig)
        self._cache: dict = {}
        # -- reference-parity sparse/backend negotiation ---------------
        # (common/container.py:122) — the TPU compute path is dense
        # MXU, but the declared use_sparse/backend contract is public
        # API: resolve it the same way.
        self.backend = "numpy" if backend is None else backend
        self._default_sparse = default_sparse
        # "sparse" resolution follows the reference: the stack counts
        # as sparse only when ALL factories return sparse masks
        self._all_sparse_factories = False
        self._get_masks_for_slice: dict = {}
        if use_sparse is True:
            self._use_sparse = default_sparse
        elif use_sparse is False:
            self._use_sparse = False
        elif isinstance(use_sparse, str) and (
            use_sparse.lower().startswith("scipy.sparse")
            or use_sparse.lower().startswith("sparse.pydata")
        ):
            self._use_sparse = use_sparse
        elif use_sparse is None:
            if (
                default_sparse.startswith("sparse.pydata")
                and str(self.backend).startswith("cupy")
            ):
                # pydata sparse cannot run on cupy-style backends
                self._use_sparse = False
            else:
                self._use_sparse = None  # resolve on first access
        else:
            raise ValueError(
                f"use_sparse not an allowed value: {use_sparse}"
            )

    @property
    def dtype(self):
        if self._dtype is not None:
            return self._dtype
        return self.computed_masks.dtype

    @property
    def use_sparse(self):
        if self._use_sparse is None:
            self._compute_stack(None)
            self._use_sparse = (
                self._default_sparse if self._all_sparse_factories
                else False
            )
        return self._use_sparse

    @property
    def computed_masks(self) -> np.ndarray:
        """The merged (n_masks, *sig) stack — dense (the TPU operand
        layout), whatever the factories returned."""
        return self._compute_stack(None)

    def __len__(self):
        return self.n_masks

    def get(self, key, dtype=None, sparse_backend=None,
            transpose=True, backend=None):
        """Mask operand for a tile/partition Slice — nav is discarded,
        so all tiles sharing a sig slice share one cache entry
        (reference common/container.py:221)."""
        if not isinstance(key, Slice):
            raise TypeError(
                "MaskContainer.get() can only be called with "
                "DataTile/Slice/Partition instances"
            )
        return self.get_masks_for_slice(
            key.discard_nav(), dtype=dtype,
            sparse_backend=sparse_backend, transpose=transpose,
            backend=backend or self.backend,
        )

    def get_masks_for_slice(self, slice_, dtype=None,
                            sparse_backend=None, transpose=True,
                            backend="numpy"):
        """Flattened (pixels, n_masks) [transpose=True] or (n_masks,
        pixels) operand for a sig slice, with a per-(dtype, sparse,
        transpose, backend) LRU cache keyed by the slice (reference
        get_masks_for_slice, common/container.py:316)."""
        import functools
        if dtype is None:
            dtype = self.dtype
        if sparse_backend is None:
            sparse_backend = self.use_sparse
        if backend is None:
            backend = self.backend
        key = (dtype, sparse_backend, transpose, backend)
        if key not in self._get_masks_for_slice:
            stack = self.computed_masks

            @functools.lru_cache(maxsize=None)
            def slicer(slc: Slice):
                slc = slc.discard_nav()
                sub = stack[(slice(None),) + slc.get(sig_only=True)]
                flat = sub.reshape(sub.shape[0], -1).astype(dtype)
                if transpose:
                    flat = flat.T
                out = np.ascontiguousarray(flat)
                if sparse_backend:
                    sb = str(sparse_backend).lower()
                    if sb.startswith("sparse.pydata"):
                        import sparse as pydata_sparse
                        return pydata_sparse.COO.from_numpy(out)
                    import scipy.sparse as sp
                    if sb.endswith("csc"):
                        return sp.csc_matrix(out)
                    return sp.csr_matrix(out)
                return out

            self._get_masks_for_slice[key] = slicer
        return self._get_masks_for_slice[key](slice_)

    def _is_sparse_mask(self, m) -> bool:
        return hasattr(m, "todense") or hasattr(m, "toarray")

    def _compute_stack(self, sig_shape) -> np.ndarray:
        if self._stack is not None:
            return self._stack
        if callable(self._factories):
            raw = self._factories()
            if isinstance(raw, (list, tuple)):
                self._all_sparse_factories = all(
                    self._is_sparse_mask(m) for m in raw
                )
                masks = [_to_dense(m) for m in raw]
            else:
                self._all_sparse_factories = self._is_sparse_mask(raw)
                raw = _to_dense(raw)
                if sig_shape is not None and \
                        raw.ndim == len(sig_shape):
                    masks = [raw]
                elif sig_shape is None and raw.ndim <= 2:
                    masks = [raw]
                else:
                    masks = list(raw)
        else:
            raws = [f() for f in self._factories]
            self._all_sparse_factories = all(
                self._is_sparse_mask(m) for m in raws
            )
            masks = [_to_dense(m) for m in raws]
        stack = np.stack(masks, axis=0)
        if sig_shape is not None and stack.shape[1:] != tuple(sig_shape):
            raise ValueError(
                f"mask shape {stack.shape[1:]} != sig {tuple(sig_shape)}"
            )
        if self._dtype is not None:
            stack = stack.astype(self._dtype)
        if self._count is not None and stack.shape[0] != self._count:
            # catch this here with a clear message — downstream it
            # surfaces as an opaque trace-time broadcast error
            raise ValueError(
                f"mask_count={self._count} but the factories "
                f"produced {stack.shape[0]} masks"
            )
        self._stack = stack
        return stack

    @property
    def n_masks(self) -> int:
        if self._count is not None:
            return self._count
        if self._stack is not None:
            return self._stack.shape[0]
        if not callable(self._factories):
            return len(self._factories)
        raise ValueError(
            "mask_count must be given for a single bulk factory"
        )

    def dtype_for(self, input_dtype, sig_shape=None) -> np.dtype:
        if (
            self._stack is None and self._dtype is None
            and sig_shape is not None
        ):
            # evaluate the factories to learn the real mask dtype —
            # complex masks (radial Fourier!) must yield a complex
            # result buffer, not silently drop the imaginary part
            self._compute_stack(sig_shape)
        if self._stack is not None:
            mdt = self._stack.dtype
        elif self._dtype is not None:
            mdt = np.dtype(self._dtype)
        else:
            mdt = np.dtype(np.float32)
        return np.result_type(mdt, input_dtype)

    def get_for_sig_slice(self, sig_slice: Slice, sig_shape, dtype):
        """Flattened (tile_pixels, n_masks) operand for one sig tile.

        The cache holds NUMPY arrays — caching jnp values created
        inside a trace would leak tracers across traces; jnp.asarray
        at use time folds into a compile-time constant anyway."""
        key = (sig_slice.origin, tuple(sig_slice.shape), np.dtype(dtype))
        if key not in self._cache:
            stack = self._compute_stack(sig_shape)
            sub = stack[(slice(None),) + sig_slice.get()]
            flat = sub.reshape(sub.shape[0], -1).T
            self._cache[key] = np.ascontiguousarray(flat).astype(
                dtype
            )
        return jnp.asarray(self._cache[key])

    def get_compaction(self, sig_shape, dtype):
        """Block-compaction plan for the whole-sig operand, or None
        when the stack's union support is too dense to pay off
        (ops/sparse_masks.py — the TPU counterpart of the reference's
        sparse mask kernels)."""
        key = ("compaction", np.dtype(dtype))
        if key not in self._cache:
            from ..ops.sparse_masks import plan_compaction
            stack = self._compute_stack(sig_shape)
            flat = stack.reshape(stack.shape[0], -1)
            if np.iscomplexobj(flat):
                plan = plan_compaction(flat.astype(np.complex64))
            else:
                plan = plan_compaction(flat.astype(dtype))
            self._cache[key] = plan
        return self._cache[key]


class ApplyMasksUDF(UDF):
    """Apply a stack of masks to each frame: the virtual-detector UDF.

    Parameters mirror the reference (udf/masks.py:127):
    mask_factories (callable or list of callables), mask_count,
    mask_dtype, dtype; ``use_sparse`` is accepted and ignored (dense
    MXU path), ``shifts`` gives per-frame mask shifts (aux data or a
    constant (2,) vector) applied by rolling the frame.
    """

    def __init__(
        self,
        mask_factories=None,
        use_torch=None,
        use_sparse=None,
        mask_count=None,
        mask_dtype=None,
        preferred_dtype=None,
        backends=None,
        dtype=None,
        shifts=None,
        use_bf16=False,
        **kwargs,
    ):
        if mask_factories is None:
            raise ValueError("mask_factories is required")
        # reference-signature compat: use_torch picks the reference's
        # CPU BLAS path (meaningless on the MXU — ignored); dtype is
        # this repo's original spelling of preferred_dtype
        if preferred_dtype is not None and dtype is None:
            dtype = preferred_dtype
        if shifts is not None and isinstance(use_sparse, str) and \
                use_sparse.lower().startswith("scipy.sparse"):
            # scipy.sparse cannot express the shifted-mask roll
            # (reference udf/masks.py:262 raises the same way)
            raise ValueError(
                "use_sparse='scipy.sparse' is not supported together "
                "with shifts; use 'sparse.pydata' or dense masks"
            )
        if backends is not None:
            known = set(UDF.BACKEND_ALL)
            bad = set(
                (backends,) if isinstance(backends, str)
                else backends
            ) - known
            if bad:
                raise ValueError(
                    f"unknown backends {sorted(bad)}; valid: "
                    f"{sorted(known)}"
                )
        super().__init__(
            mask_factories=mask_factories,
            use_sparse=use_sparse,
            mask_count=mask_count,
            mask_dtype=mask_dtype,
            dtype=dtype,
            shifts=shifts,
            use_bf16=use_bf16,
            **kwargs,
        )
        if backends is not None:
            if isinstance(backends, str):
                backends = (backends,)
            self._backend_restriction = tuple(backends)
        self._container = MaskContainer(
            mask_factories, dtype=mask_dtype, count=mask_count,
            use_sparse=use_sparse,
        )

    @property
    def masks(self) -> "MaskContainer":
        """The mask container (reference udf/masks.py:330 .masks) —
        public API for inspecting the resolved operands and sparse
        policy."""
        return self._container

    def on_params_updated(self):
        # rebuild mask operands from the patched factories
        self._container = MaskContainer(
            self._kwargs["mask_factories"],
            dtype=self._kwargs.get("mask_dtype"),
            count=self._kwargs.get("mask_count"),
            use_sparse=self._kwargs.get("use_sparse"),
        )

    def get_preferred_input_dtype(self):
        if self._kwargs.get("dtype") is not None:
            return np.dtype(self._kwargs["dtype"])
        return np.float32

    def get_tiling_preferences(self):
        prefs = super().get_tiling_preferences()
        if self._kwargs.get("shifts") is not None:
            # per-frame shifts roll pixels across the whole frame —
            # a sig-split tile would zero content at tile borders
            # instead of moving it into the neighboring tile
            prefs = dict(prefs)
            prefs["whole_frames"] = True
        return prefs

    def get_result_buffers(self):
        # result dtype = result_type(input, masks) — the
        # dtype/preferred_dtype kwarg only shapes the INPUT dtype via
        # get_preferred_input_dtype (reference udf/masks.py:362; a
        # dtype=USE_NATIVE_DTYPE sentinel must not leak into the
        # buffer declaration).  The DECLARED input dtype is the
        # reference's unclamped result_type(preference, dataset) —
        # meta.input_dtype may be the engine's narrower device
        # compute dtype (f64 is emulated on TPU); the result buffer
        # still declares the wide dtype and the wrap casts up
        # (test_multi_mask_autodtype_wide).
        declared_input = np.result_type(
            self.get_preferred_input_dtype(), self.meta.dataset_dtype
        )
        dtype = self._container.dtype_for(
            declared_input, tuple(self.meta.sig_shape)
        )
        return {
            "intensity": self.buffer(
                kind="nav",
                extra_shape=(self._container.n_masks,),
                dtype=dtype,
                where="device",
            ),
        }

    def _operand(self):
        return self._container.get_for_sig_slice(
            self.meta.sig_slice, self.meta.sig_shape,
            self._operand_dtype(),
        )

    def _wants_64bit(self) -> bool:
        """Only an EXPLICIT 64-bit request is a precision demand:

        * ``mask_dtype=`` / ``dtype=`` kwarg of f64/c128, or
        * a 64-bit dataset dtype — the data itself carries more than
          f32 precision (e.g. radialfourier's test_symmetries feeds a
          float64 dataset whose complex accumulation must cancel
          symmetric disks to atol=1e-6; the reference computes at
          result_type(mask_dtype, result_type(preferred_input,
          dataset)), udf/masks.py:311 + base.py:1495).

        TPU f64 is emulated, so those runs execute on the host engine
        with real numpy f64/c128 accumulation (reference numerics
        contract, test_numerics_succeed).  Implicit factory-output
        float64 — numpy's DEFAULT dtype, what most mask factories
        return — is NOT a precision demand: template/geometry mask
        values are f32-exact, and reading the implicit dtype as a
        demand silently evicted whole runs from the fused/compacted
        MXU path to the single-threaded host engine (round-4
        regression).  Those operands are cast to f32 on the device
        path (``_operand_dtype``)."""
        for k in ("mask_dtype", "dtype"):
            v = self._kwargs.get(k)
            if v is None:
                continue
            d = np.dtype(v)
            if (d.kind == "f" and d.itemsize >= 8) or (
                d.kind == "c" and d.itemsize >= 16
            ):
                return True
        meta = getattr(self, "meta", None)
        if meta is not None and meta.dataset_dtype is not None:
            ds = np.dtype(meta.dataset_dtype)
            if (ds.kind == "f" and ds.itemsize >= 8) or (
                ds.kind == "c" and ds.itemsize >= 16
            ):
                return True
        return False

    def get_backends(self):
        if getattr(self, "_backend_restriction", None) is not None:
            # reference semantics: backends= IS the declared set
            # (udf/masks.py:371 returns params.backends) — an
            # explicit choice overrides the 64-bit host rerouting
            return tuple(self._backend_restriction)
        if self._wants_64bit():
            return (self.BACKEND_NUMPY,)
        return (self.BACKEND_JAX,)

    def _process_tile_host(self, tile):
        """Host-engine path (numpy semantics): exact f64/c128
        accumulation for explicit 64-bit requests."""
        shifts = self.params.get("shifts")
        if shifts is not None:
            tile = np.asarray(
                self._shift_tile(jnp.asarray(tile), shifts)
            )
        flat = np.asarray(tile).reshape(tile.shape[0], -1)
        dtype = self._container.dtype_for(
            np.result_type(
                self.get_preferred_input_dtype(),
                self.meta.dataset_dtype,
            ),
            self.meta.sig_shape,
        )
        stack = self._container._compute_stack(self.meta.sig_shape)
        sub = stack[
            (slice(None),) + self.meta.sig_slice.get(sig_only=True)
        ]
        op = np.ascontiguousarray(
            sub.reshape(sub.shape[0], -1).T
        ).astype(dtype)
        self.results.intensity[:] += flat.astype(
            np.result_type(dtype, flat.dtype)
        ) @ op

    def process_tile(self, tile):
        if self._host_mode:
            return self._process_tile_host(tile)
        flat = tile.reshape(tile.shape[0], -1)
        shifts = self.params.get("shifts")
        if shifts is not None:
            tile = self._shift_tile(tile, shifts)
            flat = tile.reshape(tile.shape[0], -1)
        whole_sig = tuple(self.meta.sig_slice.shape) == tuple(
            self.meta.sig_shape
        )
        comp = None
        if whole_sig and shifts is None:
            mdt = self._operand_dtype()
            comp = self._container.get_compaction(
                self.meta.sig_shape, mdt
            )
        if comp is not None:
            # block-compacted path: static column gather + small MXU
            # matmul over the stack's union support
            from ..ops.sparse_masks import gather_blocks
            masks = jnp.asarray(comp["operand_c"])
            flat = gather_blocks(flat, comp["support"],
                                 comp["block"])
        else:
            masks = self._operand()
        if jnp.iscomplexobj(masks) and not jnp.iscomplexobj(flat):
            # x @ (A + iB) == x@A + i*(x@B): one REAL matmul against
            # the stacked [Re | Im] operand instead of materializing
            # an 8-byte/px complex copy of the block (a complex
            # matmul lowers to 4 real MXU passes, two of them against
            # the known-zero imaginary part).  Radial Fourier is the
            # big consumer (analysis/radialfourier.py).  Measured
            # (benchmarks/bench_radial_fourier.py): 4x on CPU;
            # on TPU equal-throughput in the sampled window but the
            # complex matmul COMPILES 30x slower (101 s vs 3 s) —
            # and, decisively, the real path needs no complex
            # constants/transfers, which the dev tunnel's PJRT
            # backend rejects.
            m = masks.shape[1]
            op = jnp.concatenate([masks.real, masks.imag], axis=1)
            y = jnp.matmul(
                flat.astype(op.dtype), op,
                preferred_element_type=_acc_dtype(op.dtype),
                precision=_mask_matmul_precision(),
            )
            self.results.intensity += jax.lax.complex(
                y[:, :m], y[:, m:]
            ).astype(self.results.intensity.dtype)
            return
        if self.params.get("use_bf16") and not jnp.iscomplexobj(masks):
            # opt-in bf16 matmul inputs, f32 accumulation.  Precision
            # contract: bf16 keeps 8 mantissa bits, so projections are
            # accurate to ~0.4% of each pixel's magnitude (exact for
            # counts <= 256); the MXU runs bf16 at up to ~4x the f32
            # rate, which matters once the mask count makes the matmul
            # MXU-bound (>~60 f32 columns).
            flat = flat.astype(jnp.bfloat16)
            masks = masks.astype(jnp.bfloat16)
        self.results.intensity += jnp.matmul(
            flat, masks,
            preferred_element_type=_acc_dtype(masks.dtype),
            # f32-grade products by default (the TPU's native matmul
            # pass is bf16-class, ~1e-4 rel err); the bf16 opt-in
            # path above manages its own precision contract
            precision=(
                None if flat.dtype == jnp.bfloat16
                else _mask_matmul_precision()
            ),
        ).astype(self.results.intensity.dtype)

    def _operand_dtype(self):
        mdt = self._container.dtype_for(self.meta.input_dtype)
        if mdt == np.complex128:
            mdt = np.complex64
        if mdt == np.float64:
            mdt = np.float32
        return mdt

    def _shift_tile(self, tile, shifts):
        """Per-frame integer shifts: roll each frame by (-dy, -dx) so
        a static mask sees the shifted frame, then zero the wrapped
        border region — matching the reference's truncating overlap
        slicing (udf/masks.py:85 process_frame_shifted)."""
        shifts = jnp.asarray(shifts)
        if shifts.ndim == 1:
            shifts = jnp.broadcast_to(
                shifts, (tile.shape[0],) + shifts.shape
            )
        import jax
        h, w = tile.shape[-2:]
        rows = jnp.arange(h)
        cols = jnp.arange(w)

        def roll_one(frame, sh):
            dy = sh[0].astype(jnp.int32)
            dx = sh[1].astype(jnp.int32)
            rolled = jnp.roll(frame, (-dy, -dx), axis=(0, 1))
            # rows/cols that wrapped around carry data from the other
            # edge: zero them (a frame shifted by dy>0 exposes the
            # last dy rows, dy<0 the first |dy| rows)
            row_ok = jnp.where(
                dy >= 0, rows < (h - dy), rows >= (-dy)
            )
            col_ok = jnp.where(
                dx >= 0, cols < (w - dx), cols >= (-dx)
            )
            return rolled * (
                row_ok[:, None] & col_ok[None, :]
            ).astype(rolled.dtype)

        return jax.vmap(roll_one)(tile, shifts)

    def fused_moments_spec(self):
        """Join the cross-UDF fused moments pass: contribute the mask
        stack as matmul columns (real-valued, unshifted masks only)."""
        if self.params.get("shifts") is not None:
            return None
        if self.params.get("use_bf16"):
            # bf16 mode runs through process_tile (the fused op is
            # f32; mixing precisions per-UDF inside one fused matmul
            # isn't possible)
            return None
        try:
            stack = self._container._compute_stack(self.meta.sig_shape)
        except Exception:
            return None
        if np.iscomplexobj(stack):
            return None
        out_dtype = self._container.dtype_for(self.meta.input_dtype)
        if self._kwargs.get("dtype") is not None:
            out_dtype = np.dtype(self._kwargs["dtype"])
        if np.dtype(out_dtype) not in (np.dtype(np.float32),
                                       np.dtype(np.float64)):
            return None
        operand = stack.reshape(stack.shape[0], -1).astype(np.float32)
        return {"mode": "masks", "operand": operand,
                "name": "intensity"}


def _mask_matmul_precision():
    """Same env-controlled precision as the fused kernel
    (ops/moments.py _matmul_precision): full-f32 MXU passes by
    default, native bf16-class via
    LIBERTEM_TPU_MATMUL_PRECISION=default.  Read at trace time —
    the step is re-traced per run, so a flip takes effect at the
    next run."""
    from ..ops.moments import _matmul_precision
    return _matmul_precision()


def _acc_dtype(dtype):
    if np.dtype(dtype).kind == "c":
        return np.complex64
    return np.float32
