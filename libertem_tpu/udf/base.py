"""UDF contract + jit-compiled runner — the compute engine.

TPU-native counterpart of the reference's ``libertem/udf/base.py``
(UDF:1270, UDFMeta:332, UDFRunner:2338, UDFPartRunner:2094,
UDFResults:2806, mixins :805–943).

Execution model (vs the reference's per-tile Python dispatch loop,
udf/base.py:2147–2309):

* The dataset streams as fixed-shape ``(depth, *sig)`` blocks
  (:meth:`Partition.gen_blocks`); **one** jit-compiled ``tile step`` is
  traced per run and reused for every block — cast, corrections, and all
  UDFs' process functions fuse into a single XLA program.
* Result state is a pytree of ``jnp`` arrays threaded functionally:

  - ``kind='nav'`` buffers live in the *global* state; each step
    updates the block's rows via ``lax.dynamic_update_slice`` (frames
    within a partition are contiguous in roi-compressed flat nav, so no
    scatter is needed).  Padding rows are masked out.
  - ``kind='sig'|'single'`` buffers accumulate in a *partition* state
    that starts from zeros; after the partition the (traced)
    ``UDF.merge`` folds it into the global state — the same hook that
    becomes the cross-chip combine on a device mesh.

* ``process_frame`` lowers to ``jax.vmap`` over the block when the UDF
  only writes nav buffers, else to ``lax.scan`` (sequential reduction
  semantics preserved).
* ``process_tile`` receives the whole ``(depth, *sig_tile)`` block; the
  framework guarantees zero-padded tails and exposes
  ``self.meta.tile_valid`` / ``valid_frames`` for padding-sensitive
  reductions.

User-facing API matches the reference in shape: declare buffers in
``get_result_buffers`` via ``self.buffer(...)``, implement
``process_tile/frame/partition``, ``merge``, optional ``get_results``.
The one JAX-ism: inside process functions, update buffers by
**assignment** (``self.results.x = self.results.x + v`` or ``+=``),
never by in-place slice mutation (jax arrays are immutable).
"""
from __future__ import annotations

import enum
import logging
import os
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..common.backend import (
    asarray_safe,
    device_put_safe,
    device_zeros_safe,
)
from ..common.buffers import (
    AuxBufferWrapper,
    BufferWrapper,
    PlaceholderBufferWrapper,
)
from ..common.shape import Shape
from ..common.slice import Slice
from ..io.corrections import CorrectionSet
from ..io.dataset.base import DataSet, Partition
from ..io.tiling import (
    TILE_DEPTH_DEFAULT,
    TILE_DEPTH_MAX,
    TILE_SIZE_BEST_FIT,
    TILE_SIZE_MAX,
    Negotiator,
    TileDepthEnum,  # noqa: F401  (re-export: common/udf.py parity)
    TileSizeEnum,  # noqa: F401
    TilingPreferences,  # noqa: F401
    TilingScheme,
)

log = logging.getLogger(__name__)

# single canonical exception type — user code catching
# common.exceptions.UDFException must also catch runner-raised ones
from ..common.exceptions import (  # noqa: E402
    UDFException,
    UDFRunCancelled,
)
from ..executor.base import JobCancelledError  # noqa: E402


# ---------------------------------------------------------------------------
# accessors
# ---------------------------------------------------------------------------

class MergeAttrMapping:
    """Reference-compat dest/src wrapper for host-side ``merge``
    (reference udf/base.py:596): attribute access over a dict of
    arrays, attribute ASSIGNMENT writes in place (``[:] =``
    semantics).  The engine itself uses :class:`UDFData`; this exists
    for code and tests constructing the reference type directly."""

    def __init__(self, dict_input: dict):
        object.__setattr__(self, "_dict", dict_input)

    def __iter__(self):
        return iter(self._dict)

    def __contains__(self, k) -> bool:
        return k in self._dict

    def __getattr__(self, k):
        try:
            return object.__getattribute__(self, "_dict")[k]
        except KeyError:
            raise AttributeError(k) from None

    def __setattr__(self, k, v):
        self._dict[k][:] = v

    def __getitem__(self, k):
        from ..warnings import UseDiscouragedWarning
        import warnings
        warnings.warn(
            "dict-style access on merge arguments is discouraged; "
            "use attribute access (dest.name)",
            UseDiscouragedWarning, stacklevel=2,
        )
        return self._dict[k]


class _LegacyBufferView(np.ndarray):
    """ndarray view answering the legacy BufferWrapper accessors that
    dict-style ``self.results['name']`` used to return."""

    @property
    def raw_data(self):
        return np.asarray(self)

    @property
    def data(self):
        return np.asarray(self)


class UDFData:
    """Attribute-style accessor over a dict of arrays; records writes."""

    def __init__(self, data: dict):
        object.__setattr__(self, "_data", dict(data))
        object.__setattr__(self, "_touched", set())

    def __getattr__(self, k):
        try:
            return object.__getattribute__(self, "_data")[k]
        except KeyError:
            raise AttributeError(k) from None

    def __setattr__(self, k, v):
        self._data[k] = v
        self._touched.add(k)

    def __getitem__(self, k):
        # user-facing dict-style access is a reference legacy idiom
        # (the engine uses _get); warn like the reference does, and
        # hand back a view that still answers the old BufferWrapper
        # accessors (.raw_data/.data) legacy code expects
        from ..warnings import UseDiscouragedWarning
        import warnings
        warnings.warn(
            "dict-style access on UDF results is discouraged; use "
            "attribute access (self.results.name)",
            UseDiscouragedWarning, stacklevel=2,
        )
        v = self._data[k]
        if isinstance(v, np.ndarray):
            return v.view(_LegacyBufferView)
        return v

    def _get(self, k):
        return self._data[k]

    def __setitem__(self, k, v):
        self._data[k] = v
        self._touched.add(k)

    def __contains__(self, k):
        return k in self._data

    def get(self, k, default=None):
        return self._data.get(k, default)

    def keys(self):
        return self._data.keys()

    def items(self):
        return self._data.items()

    def as_dict(self) -> dict:
        return dict(self._data)


class UDFParams:
    """Accessor for UDF constructor kwargs; aux entries resolve to the
    current tile/frame rows during processing (reference:
    UDFKwargsWrapper udf/base.py:781)."""

    def __init__(self, kwargs: dict, aux_views: Optional[dict] = None):
        object.__setattr__(self, "_kwargs", kwargs)
        object.__setattr__(self, "_aux_views", aux_views or {})

    def __getattr__(self, k):
        aux_views = object.__getattribute__(self, "_aux_views")
        if k in aux_views:
            return aux_views[k]
        kwargs = object.__getattribute__(self, "_kwargs")
        try:
            return kwargs[k]
        except KeyError:
            raise AttributeError(k) from None

    def get(self, k, default=None):
        if k in self._aux_views:
            return self._aux_views[k]
        return self._kwargs.get(k, default)

    def items(self):
        return self._kwargs.items()

    @classmethod
    def from_udfs(cls, udfs, roi=None, corrections=None,
                  tiling_scheme=None) -> "UDFParams":
        """Bundle run parameters for the worker protocol (reference
        UDFParams.from_udfs, udf/base.py:1804) — consumed by
        :class:`UDFPartRunner`."""
        return cls({
            "kwargs": [dict(u._kwargs) for u in udfs],
            "roi": roi,
            "corrections": corrections,
            "tiling_scheme": tiling_scheme,
        })


class UDFMethod(str, enum.Enum):
    """Which ``process_*`` entry point a UDF runs through (reference:
    common/udf.py:12 UDFMethod).  A ``str`` enum so engine-internal
    comparisons against the plain spellings keep working."""

    TILE = "tile"
    FRAME = "frame"
    PARTITION = "partition"

    def __str__(self):  # str(UDFMethod.TILE) == 'tile'
        return self.value


class UDFMeta:
    """Metadata visible to process functions as ``self.meta``
    (reference: UDFMeta udf/base.py:332)."""

    def __init__(
        self,
        dataset_shape: Shape,
        dataset_dtype,
        input_dtype,
        roi=None,
        tiling_scheme: Optional[TilingScheme] = None,
        device_class: str = "tpu",
        corrections: Optional[CorrectionSet] = None,
        threads_per_worker: int = 1,
        partition_slice: Optional[Slice] = None,
        array_backend: Optional[str] = None,
    ):
        self.dataset_shape = dataset_shape
        self.dataset_dtype = np.dtype(dataset_dtype)
        self.input_dtype = np.dtype(input_dtype)
        self._roi = roi
        self.tiling_scheme = tiling_scheme
        self.device_class = device_class
        self.corrections = corrections
        self.threads_per_worker = threads_per_worker
        # per-tile/frame traced values, set by the runner during tracing:
        self.coordinates = None       # (depth, nav_dims) int32 | (nav_dims,)
        self.tile_valid = None        # (depth,) bool
        self.valid_frames = None      # scalar int32
        self.global_offset = None     # scalar int32 (roi-compressed nav)
        self.sig_slice: Optional[Slice] = None   # static, current sig tile
        self.tiling_scheme_idx: int = 0          # static
        # 'jax' on the traced device path, 'numpy' while the host
        # engine drives this UDF (reference UDFMeta.array_backend,
        # udf/base.py:538)
        self.array_backend: str = (
            "jax" if array_backend is None else array_backend
        )
        self._valid_nav_mask = None
        # concrete Slice when one is known (host engine blocks,
        # get_task_data at run scope) — None on the traced path,
        # where `slice` raises a guided error instead
        self._slice: Optional[Slice] = None
        self._partition_slice: Optional[Slice] = partition_slice

    @property
    def roi(self):
        """The run's roi in NAV shape (reference UDFMeta.roi keeps
        the navigation dimensions; the engine stores it flat)."""
        if self._roi is None:
            return None
        return np.asarray(self._roi, dtype=bool).reshape(
            tuple(self.dataset_shape.nav)
        )

    @roi.setter
    def roi(self, value):
        self._roi = value

    def get_valid_nav_mask(self, full_nav: bool = False):
        """Mask of already-computed nav positions, flat 1D (reference
        udf/base.py:561).  Available in ``get_results`` (and in
        host-engine merges); ``full_nav`` expands a roi-compressed
        mask to the full navigation space."""
        if self._valid_nav_mask is None:
            return None
        m = np.asarray(self._valid_nav_mask, dtype=bool).reshape(-1)
        if full_nav and self.roi is not None:
            full = np.zeros(self.dataset_shape.nav.size, dtype=bool)
            full[np.asarray(self.roi, dtype=bool).reshape(-1)] = m
            return full
        return m

    def set_valid_nav_mask(self, new_valid_nav_mask):
        """Override the validity mask (reference udf/base.py:592)."""
        self._valid_nav_mask = new_valid_nav_mask

    @property
    def slice(self):
        """The current processing Slice (flattened nav + sig), when a
        concrete one exists: the host engine sets it per block/frame
        (reference UDFMeta.slice, udf/base.py:419), and it covers the
        whole selected nav range during ``get_task_data``.  On the
        traced device path blocks have a TRACED position instead, so
        this raises a guided error — use ``meta.global_offset`` /
        ``meta.coordinates`` / ``meta.sig_slice`` there."""
        if self._slice is not None:
            return self._slice
        raise AttributeError(
            "meta.slice is not available in the traced TPU engine; "
            "use meta.global_offset / meta.coordinates / "
            "meta.sig_slice (see UDFMeta docs)"
        )

    @property
    def partition_slice(self):
        """The current partition's Slice when a concrete one exists
        (host engine); on the traced path the unit of compute is the
        fixed-shape block, not the reference's Partition, so this
        raises a guided error — use ``meta.coordinates`` (per-frame
        nav coords) or ``meta.global_offset`` instead."""
        if self._partition_slice is not None:
            return self._partition_slice
        raise AttributeError(
            "partition_slice is not available in the traced TPU "
            "engine; use meta.coordinates / meta.global_offset "
            "(see UDFMeta docs)"
        )

    @property
    def partition_shape(self) -> Shape:
        """Shape of the current partition, roi-adjusted (reference
        UDFMeta.partition_shape, udf/base.py:409)."""
        return self.partition_slice.shape

    @property
    def sig_shape(self) -> tuple:
        return tuple(self.dataset_shape.sig)


# ---------------------------------------------------------------------------
# UDF base class
# ---------------------------------------------------------------------------

class UDF:
    """Base class for user-defined functions.

    Subclass and implement ``get_result_buffers`` plus at least one of
    ``process_tile(tile)``, ``process_frame(frame)``,
    ``process_partition(partition)``; implement ``merge(dest, src)``
    when declaring non-nav buffers.
    """

    USE_NATIVE_DTYPE = np.bool_  # result_type(bool, x) == x
    UDF_METHOD = UDFMethod
    TILE_SIZE_BEST_FIT = TILE_SIZE_BEST_FIT
    TILE_SIZE_MAX = TILE_SIZE_MAX
    TILE_DEPTH_DEFAULT = TILE_DEPTH_DEFAULT
    TILE_DEPTH_MAX = TILE_DEPTH_MAX

    BACKEND_JAX = "jax"
    BACKEND_NUMPY = "numpy"
    # reference backend constants (common/udf.py:43-57) so ported
    # UDFs declaring them keep importing: anything CUDA/cupy-flavored
    # has no meaning on a TPU and maps to the device path; the
    # sparse spellings run on the host engine like numpy (the engine
    # feeds dense host blocks — a UDF written against sparse inputs
    # must densify, which dense blocks trivially are)
    BACKEND_CUPY = "cupy"
    BACKEND_CUDA = "cuda"
    BACKEND_SPARSE_COO = "sparse.COO"
    BACKEND_SPARSE_GCXS = "sparse.GCXS"
    BACKEND_SPARSE_DOK = "sparse.DOK"
    BACKEND_SCIPY_COO = "scipy.sparse.coo_matrix"
    BACKEND_SCIPY_CSR = "scipy.sparse.csr_matrix"
    BACKEND_SCIPY_CSC = "scipy.sparse.csc_matrix"
    BACKEND_SCIPY_COO_ARRAY = "scipy.sparse.coo_array"
    BACKEND_SCIPY_CSR_ARRAY = "scipy.sparse.csr_array"
    BACKEND_SCIPY_CSC_ARRAY = "scipy.sparse.csc_array"
    BACKEND_CUPY_SCIPY_COO = "cupyx.scipy.sparse.coo_matrix"
    BACKEND_CUPY_SCIPY_CSR = "cupyx.scipy.sparse.csr_matrix"
    BACKEND_CUPY_SCIPY_CSC = "cupyx.scipy.sparse.csc_matrix"
    BACKEND_ALL = (
        BACKEND_JAX, BACKEND_NUMPY, BACKEND_CUPY, BACKEND_CUDA,
        BACKEND_SPARSE_COO, BACKEND_SPARSE_GCXS, BACKEND_SPARSE_DOK,
        BACKEND_SCIPY_COO, BACKEND_SCIPY_CSR, BACKEND_SCIPY_CSC,
        BACKEND_SCIPY_COO_ARRAY, BACKEND_SCIPY_CSR_ARRAY,
        BACKEND_SCIPY_CSC_ARRAY, BACKEND_CUPY_SCIPY_COO,
        BACKEND_CUPY_SCIPY_CSR, BACKEND_CUPY_SCIPY_CSC,
    )

    def __init__(self, **kwargs):
        self._kwargs = kwargs
        self.params = UDFParams(kwargs)
        self.results: Optional[UDFData] = None
        self.meta: Optional[UDFMeta] = None
        self.task_data: Optional[UDFData] = None
        self._host_mode = False

    def copy(self) -> "UDF":
        return type(self)(**self._kwargs)

    def __deepcopy__(self, memo):
        """Deep-copy ONLY the constructor kwargs: runtime bindings
        (meta/results) may hold traced jax values mid-run, which
        cannot be deep-copied — and a copied UDF is for a FRESH run
        anyway (reference semantics: copies are reconstructed from
        kwargs, udf/base.py copy_for_partition)."""
        import copy as _copy
        return type(self)(**_copy.deepcopy(self._kwargs, memo))

    # -- reference worker protocol (compat) ------------------------------
    # The TPU engine binds buffers and meta itself (see UDFRunner);
    # these methods exist for user code and tests that drive the
    # reference's worker-side protocol directly
    # (reference udf/base.py:961–1060 set_meta/set_backend/
    # init_result_buffers/allocate_for_part, used by UDFPartRunner).

    def copy_for_partition(self, partition, roi=None) -> "UDF":
        """Fresh instance for processing one partition (reference
        udf/base.py:1005)."""
        return type(self)(**self._kwargs)

    def set_backend(self, backend: str) -> None:
        self._array_backend = backend

    def set_meta(self, meta: "UDFMeta") -> None:
        self.meta = meta

    def set_slice(self, slc: Slice) -> None:
        if self.meta is not None:
            self.meta._slice = slc

    def set_tile_idx(self, idx: int) -> None:
        if self.meta is not None:
            self.meta.tiling_scheme_idx = idx

    def init_result_buffers(self, executor=None) -> None:
        """Declare this instance's result buffers (worker protocol).
        Shapes bind in :meth:`allocate_for_part`."""
        self._part_decls = self.get_result_buffers()

    def allocate_for_part(self, partition, roi) -> None:
        """Allocate host arrays for one partition's results (worker
        protocol; reference udf/base.py:1043).  ``kind='nav'`` buffers
        get the partition's roi-selected frame count; sig/single get
        their full shapes."""
        decls = getattr(self, "_part_decls", None)
        if decls is None:
            self.init_result_buffers()
            decls = self._part_decls
        if roi is None:
            n_sel = partition.num_frames
        else:
            flat = np.asarray(roi).reshape(-1)
            lo = partition.start_frame
            n_sel = int(np.count_nonzero(
                flat[lo:lo + partition.num_frames]
            ))
        sig = tuple(partition.meta.shape.sig)
        bufs = {}
        for name, decl in decls.items():
            if decl.use == "result_only":
                bufs[name] = None
            elif decl.kind == "nav":
                bufs[name] = np.zeros(
                    (n_sel,) + decl.extra_shape, dtype=decl.dtype
                )
            elif decl.kind == "sig":
                bufs[name] = np.zeros(
                    sig + decl.extra_shape, dtype=decl.dtype
                )
            else:  # 'single'
                bufs[name] = np.zeros(
                    decl.extra_shape or (1,), dtype=decl.dtype
                )
        self.results = UDFData(bufs)

    def clear_views(self) -> None:
        pass

    def init_task_data(self) -> None:
        self.task_data = UDFData(self.get_task_data())

    # -- declarations --------------------------------------------------

    def get_result_buffers(self) -> dict:
        raise NotImplementedError()

    @staticmethod
    def buffer(kind, extra_shape=(), dtype="float32", where=None, use=None):
        if use == "result_only":
            return PlaceholderBufferWrapper(kind, extra_shape, dtype)
        return BufferWrapper(kind, extra_shape, dtype, where, use)

    @classmethod
    def aux_data(cls, data, kind="nav", extra_shape=(), dtype="float32"):
        return AuxBufferWrapper(kind, extra_shape, dtype, data=data)

    @staticmethod
    def with_mask(data, mask):
        """Mark the valid region of a ``get_results`` value
        (reference: udf/base.py:1611).  ``mask`` is a bool array
        broadcastable to ``data`` (or a plain True/False)."""
        from ..common.buffers import ArrayWithMask
        return ArrayWithMask(data, mask)

    # -- hooks -----------------------------------------------------------

    def merge(self, dest: UDFData, src: UDFData):
        """Combine a partition's sig/single buffers into the global ones.

        Default requires nav-only buffers (handled automatically);
        reference: udf/base.py:1420 + requires_custom_merge:1386.
        """
        raise UDFException(
            f"{type(self).__name__} declares non-nav buffers and must "
            f"implement merge(dest, src)"
        )

    def merge_all(self, ordered_results: Sequence[UDFData]) -> dict:
        """Fold a sequence of partial sig/single states (reference
        udf/base.py:943 + _default_merge_all:985): default folds
        pairwise with merge(); override for a vectorized combine.

        NOTE: the engine itself never calls this hook — both run
        loops fold incrementally with merge() (the sharded fold
        applies it pairwise inside one traced program).  It exists
        for API parity and for user code that folds recorded
        partial results (e.g. snapshots from run_udf_iter).
        """
        if not ordered_results:
            return {}
        acc = UDFData(dict(ordered_results[0].items()))
        for src in ordered_results[1:]:
            self.merge(acc, src)
        return acc.as_dict()

    def get_results(self) -> dict:
        return {}

    def _do_get_results(self) -> dict:
        """Run ``get_results`` post-processing and wrap every public
        buffer into a result :class:`BufferWrapper` (reference
        udf/base.py:1226).  Called by the runner at wrap time;
        override to post-process the WRAPPED results (e.g. the
        reference's ValidationUDF coverage check)."""
        return UDFRunner._default_do_get_results(self)

    def preprocess(self):
        pass

    def postprocess(self):
        pass

    def cleanup(self):
        """Lifecycle hook called after the run completes (reference
        udf/base.py:1607) — release task_data resources here."""
        pass

    def on_params_updated(self):
        """Invalidate caches derived from ``self.params`` after a
        mid-run parameter patch (update_parameters_experimental).
        Override in UDFs that precompute operands from kwargs; the
        default is a no-op."""
        pass

    def get_preferred_input_dtype(self):
        return np.float32

    def get_backends(self):
        return (self.BACKEND_JAX,)

    def get_tiling_preferences(self) -> dict:
        return {
            "depth": TILE_DEPTH_DEFAULT,
            "total_size": TILE_SIZE_MAX,
        }

    def get_task_data(self) -> dict:
        return {}

    def get_method(self) -> "UDFMethod":
        """Which entry point to dispatch through; override to choose
        among several implemented ``process_*`` methods (reference
        udf/base.py:1544 — default priority tile > frame > partition,
        TypeError when nothing is implemented)."""
        if hasattr(self, "process_tile"):
            return UDFMethod.TILE
        if hasattr(self, "process_frame"):
            return UDFMethod.FRAME
        if hasattr(self, "process_partition"):
            return UDFMethod.PARTITION
        raise TypeError(
            f"{type(self).__name__} must implement one of process_tile / "
            f"process_frame / process_partition"
        )

    # -- conveniences ------------------------------------------------------

    @property
    def xp(self):
        return np if self._host_mode else jnp

    def forbuf(self, arr, target=None):
        """Backend-coercion helper (reference udf/base.py:1563); identity
        on TPU where everything is a jnp array."""
        return arr

    def requires_custom_merge(self, decls: dict) -> bool:
        return any(
            b.kind != "nav"
            for b in decls.values()
            if b.use not in ("result_only",)
        )

    def requires_custom_merge_all(self, decls: dict) -> bool:
        """Like :meth:`requires_custom_merge` but counting
        ``result_only`` buffers too — ``merge_all`` must handle them
        (reference udf/base.py:1406)."""
        return any(b.kind != "nav" for b in decls.values())

    def _has_custom_merge(self) -> bool:
        return type(self).merge is not UDF.merge


# Reference-API alias: the reference splits the backend/tiling
# constants onto a typing.Protocol (common/udf.py:34 UDFProtocol)
# that MIT-licensed code imports; here UDF itself carries all of
# them, so the protocol IS the class.
UDFProtocol = UDF


# Mixin markers for reference-API familiarity (udf/base.py:805–943).
# Method detection is duck-typed here (get_method inspects which
# process_* the subclass defines), so these carry no behavior.
class UDFFrameMixin:
    """Declare process_frame(frame)."""


class UDFTileMixin:
    """Declare process_tile(tile)."""


class UDFPartitionMixin:
    """Declare process_partition(partition)."""


class UDFPreprocessMixin:
    """Declare preprocess()."""


class UDFPostprocessMixin:
    """Declare postprocess()."""


class UDFMergeAllMixin:
    """Declare merge_all(ordered_results)."""


class NoOpUDF(UDF):
    """Reads tiles, does nothing — I/O benchmark
    (reference udf/base.py:1735)."""

    def process_tile(self, tile):
        pass

    def get_result_buffers(self):
        return {}

    def fused_moments_spec(self):
        return {"mode": "noop"}


# ---------------------------------------------------------------------------
# results
# ---------------------------------------------------------------------------

class UDFResults:
    """Results of a (possibly partial) run: one dict of BufferWrappers
    per UDF + the damage buffer (reference: UDFResults udf/base.py:2806).

    ``buffers`` is LAZY when built from a thunk: ``UDF.get_results``
    post-processing runs only when the buffers are first accessed
    (reference contract, test_lazy_get_results_not_called) — a
    partial-results consumer that only watches ``damage`` never pays
    for result derivation."""

    def __init__(self, buffers: Optional[Sequence[dict]] = None,
                 damage: BufferWrapper = None, buffers_thunk=None):
        self._buffers = (
            list(buffers) if buffers is not None else None
        )
        self._buffers_thunk = buffers_thunk
        self.damage = damage

    @property
    def buffers(self) -> list:
        if self._buffers is None:
            self._buffers = list(self._buffers_thunk())
        return self._buffers


class SingleUDFResults(dict):
    """dict-like results for a single UDF, with attribute access."""

    def __init__(self, buffers: dict, damage: BufferWrapper):
        super().__init__(buffers)
        self.damage = damage

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k) from None


# ---------------------------------------------------------------------------
# runner
# ---------------------------------------------------------------------------

def _get_input_dtype(udfs: Sequence[UDF], ds_dtype) -> np.dtype:
    """Reference rule (_get_dtype udf/base.py:106): result_type of all
    UDF preferences and the dataset dtype."""
    parts = [u.get_preferred_input_dtype() for u in udfs]
    return np.result_type(*parts, ds_dtype)


class _UDFPlanEntry:
    """Per-UDF static plan: declarations split by residency."""

    def __init__(self, udf: UDF, decls: dict,
                 run_restriction=None):
        self.udf = udf
        self.decls = decls
        self._run_restriction = run_restriction
        self.nav_names = [
            n for n, b in decls.items()
            if b.kind == "nav" and b.use != "result_only"
        ]
        self.part_names = [
            n for n, b in decls.items()
            if b.kind in ("sig", "single") and b.use != "result_only"
        ]
        self.result_only_names = [
            n for n, b in decls.items() if b.use == "result_only"
        ]
        # validate get_method (possibly overridden) like the reference
        # runner does (udf/base.py:2243): unknown values and methods
        # the UDF does not actually implement both raise UDFException
        method = udf.get_method()
        if method not in tuple(UDFMethod):
            raise UDFException(
                f"{type(udf).__name__}.get_method() returned "
                f"unrecognized method {method!r}"
            )
        self.method = UDFMethod(method).value
        if not hasattr(udf, f"process_{self.method}"):
            raise UDFException(
                f"{type(udf).__name__}.get_method() chose "
                f"{self.method!r} but process_{self.method} is not "
                f"implemented"
            )
        backends = udf.get_backends()
        # the reference accepts a bare string declaration
        # (udf/test_sparse.py OnlySparseSumUDF returns one spelling)
        if isinstance(backends, str):
            backends = (backends,)
        # the per-RUN restriction (Context.run_udf backends=) and the
        # per-INSTANCE one (ApplyMasksUDF(backends=...)) both apply
        restriction = getattr(udf, "_backend_restriction", None)
        if self._run_restriction is not None:
            restriction = (
                tuple(set(restriction) & set(self._run_restriction))
                if restriction is not None
                else tuple(self._run_restriction)
            )
        if restriction is not None:
            allowed = set(backends) & set(restriction)
            if not allowed:
                raise UDFException(
                    f"{type(udf).__name__} supports backends "
                    f"{backends}, none of which are in the "
                    f"requested restriction {restriction}"
                )
            backends = tuple(allowed)
        # numpy-only UDFs run on the host with mutable-view semantics
        # (see udf/host.py).  Reference backend spellings: sparse/
        # scipy variants run on the host like numpy (dense host
        # blocks trivially satisfy a sparse-capable UDF); cupy/cuda
        # without a CPU spelling map to the device path (self.xp is
        # jnp there — the closest thing to a GPU array module);
        # declaring NOTHING the engine can provide is an error.
        host_like = {
            UDF.BACKEND_NUMPY, UDF.BACKEND_SPARSE_COO,
            UDF.BACKEND_SPARSE_GCXS, UDF.BACKEND_SPARSE_DOK,
            UDF.BACKEND_SCIPY_COO, UDF.BACKEND_SCIPY_CSR,
            UDF.BACKEND_SCIPY_CSC, UDF.BACKEND_SCIPY_COO_ARRAY,
            UDF.BACKEND_SCIPY_CSR_ARRAY, UDF.BACKEND_SCIPY_CSC_ARRAY,
        }
        device_like = {
            UDF.BACKEND_JAX, UDF.BACKEND_CUPY, UDF.BACKEND_CUDA,
            UDF.BACKEND_CUPY_SCIPY_COO, UDF.BACKEND_CUPY_SCIPY_CSR,
            UDF.BACKEND_CUPY_SCIPY_CSC,
        }
        bset = set(backends)
        if not bset & (host_like | device_like):
            raise UDFException(
                f"{type(udf).__name__} declares backends "
                f"{backends}, none of which this engine can provide "
                f"(jax/numpy or a reference spelling of either)"
            )
        self.host = bool(
            bset & host_like and UDF.BACKEND_JAX not in bset
        )
        # the host feed format: first host-capable spelling in the
        # UDF's DECLARED order (reference TileConverter semantics —
        # a sparse-only UDF receives sparse tiles, converted from
        # the dense host blocks; udf/test_sparse.py)
        self.host_array_backend = UDF.BACKEND_NUMPY
        if self.host:
            for b in backends:
                if b in host_like:
                    self.host_array_backend = b
                    break
        # frame-mode UDFs that only write nav buffers can be vmapped
        self.frame_navonly = self.method == "frame" and not self.part_names


# backend classes for the resource algebra (reference
# common/backend.py CPU_BACKENDS/CUDA_BACKENDS).  'jax' counts as a
# CPU-class backend here: in the single-controller design the
# controller process owns the TPU, so a jax UDF is satisfiable
# wherever the controller runs.
CPU_BACKENDS = frozenset({
    UDF.BACKEND_JAX, UDF.BACKEND_NUMPY, UDF.BACKEND_SPARSE_COO,
    UDF.BACKEND_SPARSE_GCXS, UDF.BACKEND_SPARSE_DOK,
    UDF.BACKEND_SCIPY_COO, UDF.BACKEND_SCIPY_CSR,
    UDF.BACKEND_SCIPY_CSC, UDF.BACKEND_SCIPY_COO_ARRAY,
    UDF.BACKEND_SCIPY_CSR_ARRAY, UDF.BACKEND_SCIPY_CSC_ARRAY,
})
CUDA_BACKENDS = frozenset({
    UDF.BACKEND_CUDA, UDF.BACKEND_CUPY, UDF.BACKEND_CUPY_SCIPY_COO,
    UDF.BACKEND_CUPY_SCIPY_CSR, UDF.BACKEND_CUPY_SCIPY_CSC,
})


def _get_canonical_backends(backends):
    """Normalize a backend spec: a bare string means a single
    backend (reference udf/base.py _get_canonical_backends)."""
    if backends is None:
        return ()
    if isinstance(backends, str):
        return (backends,)
    return tuple(backends)


def get_resources_for_backends(udf_backends, user_backends):
    """Scheduling resources implied by the UDFs' declared backends
    intersected with a user restriction (reference udf/base.py:1844,
    pinned by the reference's udf/test_resources_for_backends.py):
    CPU-only sets pin CPU, CUDA-only sets pin CUDA, mixed
    availability pins neither; 'ndarray' marks array-producing
    backends (everything except bare 'cuda')."""
    canonical = [_get_canonical_backends(b) for b in udf_backends]
    user = _get_canonical_backends(user_backends)
    needs_cuda = needs_cpu = needs_ndarray = 0
    for backend_set in canonical:
        if user:
            backends = set(user).intersection(backend_set)
        else:
            backends = set(backend_set)
        needs_cuda += backends.isdisjoint(CPU_BACKENDS)
        needs_cpu += backends.isdisjoint(CUDA_BACKENDS)
        needs_ndarray += UDF.BACKEND_CUDA not in backends
    if needs_cuda and needs_cpu:
        raise ValueError(
            "There is no common supported UDF backend "
            f"(have: {udf_backends!r}, limited to {user!r})"
        )
    result = {"compute": 1}
    if needs_cpu:
        result["CPU"] = 1
    if needs_cuda:
        result["CUDA"] = 1
    if needs_ndarray:
        result["ndarray"] = 1
    return result


class _PartitionTask:
    """Minimal TaskProtocol carrier handed to
    TaskCommHandler.handle_task — one per partition (the reference
    wraps partitions in UDFTask objects, udf/base.py; this engine
    has no task objects, so the carrier exposes just the protocol
    surface handlers consume)."""

    def __init__(self, partition, udf_backends=None,
                 user_backends=None):
        self._partition = partition
        self._udf_backends = udf_backends
        self._user_backends = user_backends

    def get_partition(self):
        return self._partition

    def get_locations(self):
        return None

    def get_resources(self):
        if self._udf_backends is None:
            return {"compute": 1}
        return get_resources_for_backends(
            self._udf_backends, self._user_backends
        )


class UDFRunner:
    def __init__(self, udfs: Sequence[UDF], debug: bool = False,
                 progress_reporter=None, backends=None,
                 threads_per_worker: int = 1):
        """``progress_reporter``: a ProgressReporter instance used
        when ``progress=True`` (reference udf/base.py UDFRunner
        signature); ``progress=<reporter>`` per run also works.
        ``backends``: per-RUN backend restriction (the Context's
        ``backends=`` kwarg) — scoped to this runner, NOT written
        onto the UDF instances.  ``threads_per_worker`` flows into
        ``meta.threads_per_worker`` (the executor's fine-grained
        thread allowance; reference Environment.threads_per_worker)."""
        self._udfs = list(udfs)
        self._debug = debug
        self._progress_reporter = progress_reporter
        self._backends = (
            (backends,) if isinstance(backends, str)
            else tuple(backends) if backends is not None else None
        )
        self._threads_per_worker = max(1, int(threads_per_worker))
        self._params_patched = False

    def _make_udf_tasks(self, dataset, roi=None, backends=None):
        """Reference task enumeration (udf/base.py
        UDFRunner._make_udf_tasks): one task per partition carrying
        the combined resource demand of all UDFs.  This engine
        schedules partitions itself — the tasks serve resource-
        introspection consumers (pinned by the reference's
        udf/test_get_resources.py)."""
        udf_backends = [u.get_backends() for u in self._udfs]
        user = backends if backends is not None else self._backends
        for partition in dataset.get_partitions():
            yield _PartitionTask(
                partition, udf_backends=udf_backends,
                user_backends=user,
            )

    def _debug_check_picklable(self):
        """debug=True semantics (reference: debug executors force
        pickle round-trips every run, udf/base.py:2325): catch UDFs
        whose parameters or state can't cross a process boundary —
        important for code that later moves to multi-host meshes,
        where each process must construct identical UDFs."""
        import pickle

        for udf in self._udfs:
            try:
                clone_kwargs = pickle.loads(pickle.dumps(udf._kwargs))
                pickle.loads(pickle.dumps(type(udf)))
                type(udf)(**clone_kwargs)
            except Exception as e:
                raise UDFException(
                    f"{type(udf).__name__} is not pickle-safe "
                    f"(debug=True check): {e}"
                ) from e

    def update_parameters_experimental(
        self, patches: Sequence[dict]
    ) -> None:
        """Patch UDF constructor kwargs mid-run (reference:
        udf/base.py:96); applied from the next partition on.  Params
        baked into the traced step (mask operands etc.) force a
        re-trace at the partition boundary.

        Each UDF invalidates its own derived caches via
        :meth:`UDF.on_params_updated`; the engine knows nothing about
        subclass internals."""
        if len(patches) != len(self._udfs):
            raise ValueError(
                f"got {len(patches)} patches for {len(self._udfs)} "
                f"UDFs — pass one entry per UDF ({{}} for no change)"
            )
        for udf, patch in zip(self._udfs, patches):
            if not patch:
                continue
            udf._kwargs.update(patch)
            udf.params = UDFParams(udf._kwargs)
            udf.on_params_updated()
        self._params_patched = True

    # -- public entry points ---------------------------------------------

    def run_for_dataset(
        self,
        dataset: DataSet,
        executor=None,
        *,
        roi: Optional[np.ndarray] = None,
        corrections: Optional[CorrectionSet] = None,
        progress: bool = False,
        device=None,
        devices=None,
        backends=None,
        dry: bool = False,
    ) -> UDFResults:
        """Run all UDFs over ``dataset`` and return the final results.

        Mirrors the reference entry point (udf/base.py:2559): the
        optional ``executor`` argument (second positional there) is
        honored by deriving the device set from it — this framework's
        executors are thin handles onto the single jax mesh loop, so
        the executor's identity only selects single-device vs sharded
        execution.  Everything after ``executor`` is keyword-only:
        the reference's positional order differs (roi, progress,
        corrections, ...), so ambiguous positional calls are rejected
        rather than silently misbound.
        """
        if backends is not None:
            self._backends = (
                (backends,) if isinstance(backends, str)
                else tuple(backends)
            )
        if executor is not None:
            if device is None:
                device = getattr(executor, "main_device", None)
            if devices is None:
                exec_devices = getattr(executor, "devices", None)
                if exec_devices is not None and len(exec_devices) > 1:
                    devices = exec_devices
        if dry:
            return self.dry_run(dataset, roi=roi)
        gen = self.run_for_dataset_iter(
            dataset, roi=roi, corrections=corrections,
            progress=progress, device=device, devices=devices,
            yield_partial=False,
        )
        result = next(gen)
        # the sync entry point materializes NOW — get_results must
        # run while task_data is still alive (cleanup happens when
        # the generator is driven to completion below); only
        # iterator partials stay lazy
        result.buffers
        for _ in gen:
            pass
        return result

    def run_for_dataset_async(
        self,
        dataset: DataSet,
        executor=None,
        roi: Optional[np.ndarray] = None,
        corrections: Optional[CorrectionSet] = None,
        progress: bool = False,
        cancel_id=None,
        device=None,
        devices=None,
    ):
        """Async generator of UDFResults snapshots (reference
        udf/base.py:2735): the synchronous partition loop is driven
        on a worker thread so the event loop stays responsive between
        snapshots.  ``cancel_id`` is accepted for API parity (the
        in-process loop cancels by dropping the iterator)."""
        if executor is not None:
            sync_exec = getattr(executor, "ensure_sync", None)
            if sync_exec is not None:
                executor = sync_exec()
            if device is None:
                device = getattr(executor, "main_device", None)
            if devices is None:
                exec_devices = getattr(executor, "devices", None)
                if exec_devices is not None and len(exec_devices) > 1:
                    devices = exec_devices

        async def agen():
            import asyncio
            loop = asyncio.get_event_loop()
            gen = self.run_for_dataset_iter(
                dataset, roi=roi, corrections=corrections,
                progress=progress, device=device, devices=devices,
            )
            sentinel = object()
            try:
                while True:
                    item = await loop.run_in_executor(
                        None, next, gen, sentinel
                    )
                    if item is sentinel:
                        break
                    yield item
            finally:
                gen.close()

        return agen()

    def run_for_dataset_iter(
        self,
        dataset: DataSet,
        roi: Optional[np.ndarray] = None,
        corrections: Optional[CorrectionSet] = None,
        progress: bool = False,
        device=None,
        devices=None,
        yield_partial: bool = True,
    ):
        """Generator of UDFResults snapshots, one per merged partition
        (the last one is the final result).

        With ``devices`` (a list of >1 jax devices) the run is sharded
        over a device mesh: the nav axis splits into one contiguous
        shard per device, the tile loop runs as a single shard_mapped
        XLA program per super-step, and the final sig/single states are
        folded across devices with the UDF's merge().
        """
        if devices is not None and len(devices) > 1:
            blocked = [
                type(u).__name__ for u in self._udfs
                if not getattr(u, "SUPPORTS_SHARDED", True)
            ]
            if blocked:
                raise UDFException(
                    f"{', '.join(blocked)} cannot run on the sharded "
                    "executor (ordered host io_callback inside "
                    "shard_map is unsupported); use an "
                    "InlineJobExecutor / single-device Context"
                )
            part_udfs = [
                type(u).__name__ for u in self._udfs
                if u.get_method() == "partition"
            ]
            if part_udfs:
                # documented mesh semantics: each device block plays
                # the partition role (NOT the dataset's partition
                # split, which the single-device loop honors whole)
                log.warning(
                    "sharded run: process_partition receives device "
                    "blocks, not whole dataset partitions (%s) — "
                    "per-partition-identity statistics need the "
                    "single-device loop", ", ".join(part_udfs),
                )
            # in-order single-consumer sources (live rings) run via
            # BLOCK-CYCLIC shard assignment + serial reads — see
            # _run_loop_sharded; no rejection needed
            # device=None: prep stays host-side; the sharded loop
            # owns device placement (replication / NamedShardings)
            prep = self._prepare(dataset, roi, corrections, None)
            if (
                any(e.host for e in prep["plan"])
                and jax.process_count() > 1
            ):
                raise UDFException(
                    "numpy-backend UDFs process the host block feed, "
                    "which is split across processes on a multi-host "
                    "mesh — run them single-host or on an "
                    "InlineJobExecutor"
                )
            yield from self._run_loop_sharded(
                prep, dataset, roi, progress, yield_partial, devices
            )
        else:
            if device is None and devices:
                # a single-entry devices list means "run on THAT
                # device", not the default one
                device = devices[0]
            prep = self._prepare(dataset, roi, corrections, device)
            yield from self._run_loop(
                prep, dataset, roi, progress, yield_partial
            )

    def dry_run(self, dataset, roi=None) -> UDFResults:
        """Buffer declarations without reading data
        (reference: udf/base.py:2440)."""
        prep = self._prepare(dataset, roi, None, None)
        damage_host = np.zeros(prep["n_nav"], dtype=bool)
        return self._wrap_results(prep, self._init_state(prep), damage_host)

    # -- preparation -------------------------------------------------------

    def _prepare(self, dataset, roi, corrections, device):
        udfs = self._udfs
        if self._debug:
            self._debug_check_picklable()
        meta0 = dataset.meta
        if roi is not None:
            roi = np.asarray(roi).reshape(-1).astype(bool)
            if roi.size != meta0.shape.nav.size:
                raise ValueError(
                    f"roi size {roi.size} != nav size "
                    f"{meta0.shape.nav.size}"
                )
        # a UDF instance reused on a dataset with a different sig
        # shape must drop its shape-derived caches (mask stacks, flat
        # pixel indices, FFT plans) — reuse the parameter-patch hook,
        # which every caching UDF already implements
        sig_key = tuple(meta0.shape.sig)
        for u in udfs:
            prev = getattr(u, "_prepared_sig_shape", None)
            if prev is not None and prev != sig_key:
                u.on_params_updated()
            u._prepared_sig_shape = sig_key

        input_dtype = _get_input_dtype(udfs, meta0.native_dtype)
        # keep device compute in f32/bf16/ints — f64 is emulated on TPU
        if input_dtype == np.float64:
            input_dtype = np.dtype(np.float32)
        if input_dtype == np.complex128:
            input_dtype = np.dtype(np.complex64)

        partitions = list(dataset.get_partitions())
        max_part_frames = max(
            (p.frames_in_roi(roi) for p in partitions), default=1
        )
        if corrections is None:
            corrections = dataset.get_correction_data()
        if (
            corrections is not None
            and corrections.have_corrections()
            and not np.issubdtype(input_dtype, np.floating)
            and not np.issubdtype(input_dtype, np.complexfloating)
        ):
            # dark subtraction / gain multiplication in integer
            # arithmetic wraps around and truncates — force float
            # (the reference upgrades to >= float32 whenever
            # corrections are active, corrset.py)
            input_dtype = np.dtype(np.float32)

        # self.meta must already be usable inside
        # get_tiling_preferences (reference contract, udf/base.py:1525
        # — SSB-style UDFs size their tiles from the dataset shape);
        # bind a preliminary meta (no tiling scheme yet), the full one
        # replaces it below
        pre_meta = UDFMeta(
            dataset_shape=meta0.shape,
            dataset_dtype=meta0.native_dtype,
            input_dtype=input_dtype,
            roi=roi,
            tiling_scheme=None,
            threads_per_worker=self._threads_per_worker,
        )
        for u in udfs:
            u.meta = pre_meta

        scheme = Negotiator().get_scheme(
            udfs,
            meta0.shape,
            input_dtype,
            max_partition_frames=max_part_frames,
            corrections=corrections,
            max_io_size=dataset.get_max_io_size(),
        )
        # dataset veto on the tile shape (reference:
        # dataset.py:301 adjust_tileshape)
        adjusted = dataset.adjust_tileshape(
            tuple(scheme.shape), roi
        )
        if adjusted is not None and scheme.intent == "partition":
            # PARTITION-method UDFs need whole partitions as one
            # device block (structural invariant of the traced step):
            # the dataset may veto the sig split but never the depth
            adjusted = (tuple(scheme.shape)[0],) + tuple(adjusted)[1:]
        if adjusted is not None and tuple(adjusted) != tuple(
            scheme.shape
        ):
            scheme = TilingScheme.make_for_shape(
                Shape(tuple(adjusted),
                      sig_dims=meta0.shape.sig.dims),
                meta0.shape, intent=scheme.intent,
            )
        if len(scheme) > 1 and any(
            u.get_method() == UDFMethod.FRAME for u in udfs
        ):
            # a dataset that forces sig-split tiles cannot serve
            # process_frame (reference: the frame dispatch loop
            # fails on partial-sig tiles, udf/base.py:2278)
            raise UDFException(
                "a process_frame UDF needs whole frames, but the "
                "dataset forces sig-split tiles "
                f"({len(scheme)} sig slices)"
            )

        # NOTE: `device` stays None for the sharded path — aux and
        # state placement is the sharded loop's job (multi-host safe);
        # only the device CLASS is probed here, which is fine to read
        # from the local process's first device
        probe = device if device is not None else jax.devices()[0]
        device_class = "tpu"
        if probe.platform not in ("tpu", "axon"):
            device_class = probe.platform

        meta = UDFMeta(
            dataset_shape=meta0.shape,
            dataset_dtype=meta0.native_dtype,
            input_dtype=input_dtype,
            roi=roi,
            tiling_scheme=scheme,
            device_class=device_class,
            corrections=corrections,
            threads_per_worker=self._threads_per_worker,
        )

        n_nav = (
            int(np.count_nonzero(roi)) if roi is not None
            else meta0.shape.nav.size
        )

        # concrete slice/coordinates for get_task_data (reference
        # calls it per partition with the partition slice + coords,
        # udf/base.py:2213; this single-controller engine calls it
        # once per run with the full selected span — task_data that
        # sizes itself from meta.coordinates sees every selected
        # frame exactly once either way)
        sig = tuple(meta0.shape.sig)
        nav_shape = tuple(meta0.shape.nav)
        flat_ids = (
            np.flatnonzero(np.asarray(roi).reshape(-1))
            if roi is not None else np.arange(n_nav)
        )
        run_coords = np.stack(
            np.unravel_index(flat_ids, nav_shape), axis=-1
        ).astype(np.int32) if n_nav else np.zeros(
            (0, len(nav_shape)), np.int32
        )
        meta._slice = Slice(
            origin=(0,) * (1 + len(sig)),
            shape=Shape((n_nav,) + sig, sig_dims=len(sig)),
        )
        meta.coordinates = run_coords

        plan = []
        for udf in udfs:
            udf.meta = meta
            # bind aux parameters to the dataset BEFORE the buffer
            # declarations run: reference UDFs inspect
            # self.params.<aux>.shape there (reference allocates aux
            # against the dataset first, udf/base.py set_views)
            from ..common.buffers import AuxBufferWrapper
            for v in udf._kwargs.values():
                if isinstance(v, AuxBufferWrapper):
                    v.set_shape_ds(meta0.shape, roi)
            decls = dict(udf.get_result_buffers())
            for b in decls.values():
                b.set_shape_ds(meta0.shape, roi)
            entry = _UDFPlanEntry(
                udf, decls, run_restriction=self._backends
            )
            if (
                udf.requires_custom_merge(decls)
                and not udf._has_custom_merge()
            ):
                # NotImplementedError for reference parity (the
                # default UDF.merge raises it there,
                # udf/base.py:1420; test_no_default_merge asserts it)
                raise NotImplementedError(
                    f"{type(udf).__name__} declares non-nav buffers "
                    f"{entry.part_names} and must implement merge()"
                )
            task_data = udf.get_task_data()
            udf.task_data = UDFData(task_data) if task_data else UDFData({})
            plan.append(entry)

        # reset the run-scope concrete slice/coords BEFORE the
        # traceability probe: the traced path must not see them (a
        # probe with a concrete meta.slice would judge slice-using
        # UDFs traceable and then fail inside jit)
        meta._slice = None
        meta.coordinates = None

        self._auto_host_fallback(plan, meta, scheme, input_dtype)

        # the f64/c128 -> f32/c64 clamp above exists for the TPU
        # step; a run whose UDFs ALL ended up on the host engine
        # keeps full 64-bit precision like the reference
        # (test_simple_udf test_dtypes complex128)
        raw_dtype = _get_input_dtype(udfs, meta0.native_dtype)
        if raw_dtype != input_dtype and plan and all(
            e.host for e in plan
        ):
            input_dtype = raw_dtype
            meta.input_dtype = np.dtype(raw_dtype)
            # declarations may derive from meta.input_dtype
            # (dtype=self.meta.input_dtype) — rebuild them with the
            # widened meta, keeping the probe's host/device verdicts
            for i, entry in enumerate(plan):
                decls = dict(entry.udf.get_result_buffers())
                for b in decls.values():
                    b.set_shape_ds(meta0.shape, roi)
                e2 = _UDFPlanEntry(
                    entry.udf, decls,
                    run_restriction=self._backends,
                )
                e2.host = entry.host
                plan[i] = e2

        # aux buffers: compress by roi, keep as host arrays for now
        aux_arrays, aux_host = self._build_aux(
            udfs, roi, n_nav, scheme, device
        )

        corr_plan = (
            corrections.make_plan(tuple(meta0.shape.sig))
            if corrections is not None else None
        )

        fused_plan = self._build_fused_plan(plan, scheme, meta)

        from ..ops.moments import _matmul_precision

        return {
            "fused": fused_plan,
            # matmul precision latched ONCE per run: a mid-process
            # LIBERTEM_TPU_MATMUL_PRECISION flip takes effect at the
            # next run, never mid-run via a stale cached executable
            "matmul_precision": _matmul_precision(),
            # feed blocks FLAT (depth, n_pix) when the fused path is
            # active: a (depth, h, w) device array's tiled (h, w)
            # layout forces a physical relayout at the matmul's
            # collapse — flat-fed blocks measured ~45% faster through
            # the fused op.  The generic path needs (depth, *sig)
            # tiles and reshapes back if a mid-run patch disables
            # fusion.
            "flat_feed": fused_plan is not None,
            "aux_host": aux_host,
            "host_global": None,
            "meta": meta,
            "plan": plan,
            "scheme": scheme,
            "partitions": partitions,
            "n_nav": n_nav,
            "input_dtype": input_dtype,
            "device": device,
            "aux": aux_arrays,
            "corr_plan": corr_plan,
            "roi": roi,
        }

    def _auto_host_fallback(self, plan, meta, scheme, input_dtype):
        """UDFs ported from the reference are often written with
        numpy mutable-view semantics and declare no backends; instead
        of failing at first dispatch with a tracer error, probe each
        DEFAULTED device entry with an abstract block and route the
        untraceable ones through the host engine (the reference's
        numpy semantics), with a warning.  Explicit get_backends()
        declarations are trusted either way."""
        for entry in plan:
            if entry.host:
                continue
            udf = entry.udf
            if type(udf).get_backends is not UDF.get_backends:
                continue
            if not self._probe_traceable(entry, meta, scheme,
                                         input_dtype):
                import warnings
                warnings.warn(
                    f"{type(udf).__name__}.process_"
                    f"{entry.method} is not jax-traceable; running "
                    "it on the HOST engine with numpy semantics. "
                    "Declare get_backends() explicitly to silence "
                    "this warning (see docs/migration.md)."
                )
                entry.host = True
            elif not self._probe_merge_traceable(entry, meta):
                import warnings
                warnings.warn(
                    f"{type(udf).__name__}.merge is not "
                    "jax-traceable (e.g. in-place slice "
                    "assignment); running the UDF on the HOST "
                    "engine with numpy semantics. Declare "
                    "get_backends() explicitly to silence this "
                    "warning (see docs/migration.md)."
                )
                entry.host = True

    def _probe_merge_traceable(self, entry, meta):
        """Abstractly evaluate a custom merge() against device-shaped
        sig/single namespaces: reference UDFs often merge with numpy
        in-place slice assignment (``dest.x[:] += src.x``), which the
        jitted device fold cannot trace — those run on the host
        engine instead."""
        udf = entry.udf
        if not udf._has_custom_merge() or not entry.part_names:
            return True
        sig = tuple(meta.dataset_shape.sig)
        decls = entry.decls

        def shapes():
            out = {}
            for name in entry.part_names:
                b = decls[name]
                shp = (
                    sig + b.extra_shape if b.kind == "sig"
                    else b.extra_shape
                )
                out[name] = jnp.zeros(shp, b.dtype)
            return out

        def run(_):
            dest = UDFData(shapes())
            src = UDFData(shapes())
            udf.merge(dest, src)
            return [dest._get(n) for n in entry.part_names]

        try:
            jax.eval_shape(run, jax.ShapeDtypeStruct((1,), jnp.float32))
            return True
        except Exception:
            return False

    def _probe_traceable(self, entry, meta, scheme, input_dtype):
        """Abstractly evaluate one process_* call with bindings
        shaped like the real traced step's — no FLOPs spent."""
        from ..common.buffers import AuxBufferWrapper
        from ..common.slice import Slice

        udf = entry.udf
        depth = scheme.depth
        sig = tuple(meta.dataset_shape.sig)
        nav_dims = meta.dataset_shape.nav.dims
        decls = entry.decls
        method = entry.method
        frame = method == "frame"

        def run(block):
            views = {}
            for name in entry.nav_names:
                b = decls[name]
                shp = (
                    b.extra_shape if frame
                    else (depth,) + b.extra_shape
                )
                views[name] = jnp.zeros(shp, b.dtype)
            for name in entry.part_names:
                b = decls[name]
                shp = (
                    sig + b.extra_shape if b.kind == "sig"
                    else b.extra_shape
                )
                views[name] = jnp.zeros(shp, b.dtype)
            ro_names = entry.result_only_names
            for name in ro_names:
                views[name] = None
            udf.results = UDFData(views)
            aux_views = {}
            for k, v in udf._kwargs.items():
                if isinstance(v, AuxBufferWrapper):
                    shp = (
                        v.extra_shape if frame
                        else (depth,) + v.extra_shape
                    )
                    aux_views[k] = jnp.zeros(shp, v.dtype)
            udf.params = UDFParams(udf._kwargs, aux_views)
            meta.coordinates = jnp.zeros(
                ((nav_dims,) if frame else (depth, nav_dims)),
                jnp.int32,
            )
            meta.tile_valid = jnp.ones((depth,), bool)
            meta.valid_frames = jnp.int32(depth)
            meta.global_offset = jnp.int32(0)
            meta.sig_slice = Slice.from_shape(sig, sig_dims=len(sig))
            if frame:
                udf.process_frame(block[0])
            elif method == "partition":
                udf.process_partition(block)
            else:
                udf.process_tile(block)
            res = udf.results
            return [res._get(n) for n in views if n not in ro_names]

        try:
            jax.eval_shape(
                run,
                jax.ShapeDtypeStruct((depth,) + sig, input_dtype),
            )
            return True
        except Exception:
            return False
        finally:
            udf.results = None
            udf.params = UDFParams(udf._kwargs)
            # the probe body stored abstract values on the shared
            # meta — clear them so they cannot escape into user code
            # (deepcopy, pickling) or a later trace
            meta.coordinates = None
            meta.tile_valid = None
            meta.valid_frames = None
            meta.global_offset = None
            # drop anything the UDF cached DURING the abstract probe
            # (e.g. a mask built on first use): it would leak probe
            # tracers into the real trace.  on_params_updated is the
            # designed cache-reset hook.
            udf.on_params_updated()

    def _build_aux(self, udfs, roi, n_nav, scheme, device):
        """Device + host copies of AuxBufferWrapper params (roi-
        compressed, one-block zero pad); rebuilt on mid-run parameter
        patches so new aux data actually takes effect."""
        aux_arrays = []
        aux_host = []
        for udf in udfs:
            entry = {}
            host_entry = {}
            for k, v in udf._kwargs.items():
                if isinstance(v, AuxBufferWrapper):
                    data = v.aux_data
                    if data is None:
                        raise UDFException(f"aux buffer {k} has no data")
                    if roi is not None:
                        data = data[roi]
                    if data.shape[0] != n_nav:
                        raise ValueError(
                            f"aux buffer {k}: {data.shape[0]} rows != "
                            f"{n_nav} selected frames"
                        )
                    # pad by one block depth so the final block's
                    # dynamic_slice never clamps (which would misalign
                    # aux rows with frames)
                    pad = np.zeros(
                        (scheme.depth,) + data.shape[1:], data.dtype
                    )
                    data = np.concatenate([data, pad], axis=0)
                    # device=None (sharded / dry-run): keep host-only —
                    # the sharded loop replicates from the host copy
                    # itself, and device_put to a single device would
                    # crash under multi-host jax.distributed where
                    # devices[0] may be non-addressable
                    if device is not None:
                        entry[k] = device_put_safe(data, device)
                    else:
                        entry[k] = data
                    host_entry[k] = data
            aux_arrays.append(entry)
            aux_host.append(host_entry)
        return aux_arrays, aux_host

    def _apply_param_patch(self, prep):
        """Mid-run parameter patch: rebuild everything derived from
        UDF kwargs — the fused plan AND the aux arrays (patched
        aux_data must actually be used by the re-traced step)."""
        prep["fused"] = self._build_fused_plan(
            prep["plan"], prep["scheme"], prep["meta"]
        )
        # the feed layout follows the fused plan — a patch that flips
        # fusion must flip the (flat vs sig-shaped) block feed too
        prep["flat_feed"] = prep["fused"] is not None
        aux_arrays, aux_host = self._build_aux(
            self._udfs, prep["roi"], prep["n_nav"], prep["scheme"],
            prep["device"],
        )
        prep["aux"] = aux_arrays
        prep["aux_host"] = aux_host

    # -- state construction -------------------------------------------------

    def _init_state(self, prep) -> list:
        """Global state: per UDF a dict name->jnp array.

        nav buffers get ``depth`` extra pad rows so the final block's
        dynamic_update_slice never clamps.
        """
        depth = prep["scheme"].depth
        device = prep["device"]
        state = []
        for entry in prep["plan"]:
            bufs = {}
            if not entry.host:
                for name in entry.nav_names:
                    b = entry.decls[name]
                    shape = (prep["n_nav"] + depth,) + b.extra_shape
                    bufs[name] = device_zeros_safe(
                        shape, b.dtype, device
                    )
                for name in entry.part_names:
                    b = entry.decls[name]
                    bufs[name] = device_zeros_safe(
                        b.shape, b.dtype, device
                    )
            state.append(bufs)
        return state

    def _init_part_state(self, prep) -> list:
        state = []
        for entry in prep["plan"]:
            bufs = {}
            if not entry.host:
                for name in entry.part_names:
                    b = entry.decls[name]
                    bufs[name] = device_zeros_safe(b.shape, b.dtype)
            state.append(bufs)
        return state

    def _refresh_task_data(self, prep, partition, roi, goff0, n_sel):
        """Per-partition get_task_data cadence (reference _init_udfs,
        udf/base.py:2213) — but only where it is OBSERVABLE: host
        entries and UDFs overriding pre/postprocess.  Purely-traced
        UDFs keep the once-per-run call from _prepare (their
        task_data is a compiled-step constant; per-partition values
        would be stale inside the trace anyway, and recomputing
        expensive task_data per partition costs real time)."""
        meta = prep["meta"]
        nav_shape = tuple(meta.dataset_shape.nav)
        sig = tuple(meta.dataset_shape.sig)
        part_coords = None
        for entry in prep["plan"]:
            udf = entry.udf
            if type(udf).get_task_data is UDF.get_task_data:
                continue
            if not (
                entry.host
                or type(udf).postprocess is not UDF.postprocess
                or type(udf).preprocess is not UDF.preprocess
            ):
                continue
            if part_coords is None:
                flat_ids = partition.local_frame_ids(roi)
                part_coords = np.stack(
                    np.unravel_index(flat_ids, nav_shape), axis=-1
                ).astype(np.int32)
            meta._slice = Slice(
                origin=(goff0,) + (0,) * len(sig),
                shape=Shape((n_sel,) + sig, sig_dims=len(sig)),
            )
            meta._partition_slice = meta._slice
            meta.coordinates = part_coords
            try:
                udf.cleanup()
                td = udf.get_task_data()
                udf.task_data = (
                    UDFData(td) if td else UDFData({})
                )
            finally:
                meta._slice = None
                meta._partition_slice = None
                meta.coordinates = None

    def _bind_device_postprocess(
        self, prep, state, part_state, goff0, n_sel
    ):
        """Bind concrete host copies of a device entry's buffers as
        ``udf.results`` for an OVERRIDDEN postprocess (reference
        cadence: postprocess mutates the partition's result buffers,
        udf/base.py:2311).  Entries with the default no-op postprocess
        skip the device round-trip entirely."""
        bound = []
        for ei, entry in enumerate(prep["plan"]):
            udf = entry.udf
            if entry.host or (
                type(udf).postprocess is UDF.postprocess
            ):
                bound.append(None)
                continue
            views = {}
            for n in entry.nav_names:
                views[n] = np.array(asarray_safe(
                    state[ei][n][goff0:goff0 + n_sel]
                ))
            for n in entry.part_names:
                views[n] = np.array(asarray_safe(part_state[ei][n]))
            udf.results = UDFData(views)
            bound.append(views)
        return bound

    def _writeback_device_postprocess(
        self, prep, state, part_state, goff0, n_sel, bound
    ):
        """Write postprocess-mutated host copies back into device
        state.  Mutation of the bound numpy copies is undetectable,
        so every bound buffer is written back (cheap: only runs for
        UDFs overriding postprocess, once per partition)."""
        device = prep["device"]
        for ei, entry in enumerate(prep["plan"]):
            if bound[ei] is None:
                continue
            udf = entry.udf
            res = udf.results
            for n in entry.nav_names:
                new = device_put_safe(
                    np.asarray(res._get(n)), device
                )
                state[ei][n] = state[ei][n].at[
                    goff0:goff0 + n_sel
                ].set(new)
            for n in entry.part_names:
                part_state[ei][n] = device_put_safe(
                    np.asarray(res._get(n)), device
                )
            udf.results = None
        return state, part_state

    # -- traced step construction -------------------------------------------

    def _apply_corrections(self, block, prep, valid_count=None):
        """Cast to input dtype and apply corrections, on device.

        With corrections active, zero-padded tail rows become
        ``(0 - dark) * gain`` garbage — they are re-zeroed afterwards
        (``valid_count``) so downstream reductions stay exact.
        """
        x = block.astype(prep["input_dtype"])
        cp = prep["corr_plan"]
        if cp is None:
            return x
        if cp["dark"] is not None:
            dark = jnp.asarray(cp["dark"], dtype=x.dtype)
            if x.ndim == 2:
                dark = dark.reshape(-1)  # flat-fed block
            x = x - dark
        if cp["gain"] is not None:
            gain = jnp.asarray(cp["gain"], dtype=x.dtype)
            if x.ndim == 2:
                gain = gain.reshape(-1)
            x = x * gain
        if cp["repair_idx"] is not None:
            d = x.shape[0]
            flat = x.reshape(d, -1)
            vals = flat[:, cp["nbr_idx"]]  # (d, k, m)
            mean = jnp.sum(
                vals * jnp.asarray(cp["nbr_w"], dtype=x.dtype), axis=-1
            )
            flat = flat.at[:, cp["repair_idx"]].set(mean)
            x = flat.reshape(x.shape)
        if valid_count is not None:
            row_valid = (
                jnp.arange(x.shape[0], dtype=jnp.int32) < valid_count
            ).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
            x = x * row_valid
        return x

    def _build_fused_plan(self, plan, scheme, meta):
        """Cross-UDF fusion: when every UDF in the set exposes a
        ``fused_moments_spec`` (ApplyMasks/CoM/Sum/SumSig/StdDev/NoOp),
        the whole pass collapses into ONE fused matmul+moments op per
        block (:func:`libertem_tpu.ops.moments.fused_moments`) —
        one HBM read instead of one per UDF.

        Sig tiling does not disable fusion: device blocks always hold
        whole frames (the scheme's sig slices only subdivide compute
        in the generic path), and every fusible UDF is a whole-frame
        linear op, so the fused op consumes the full flat frame
        regardless of ``len(scheme)``.
        """
        if np.dtype(meta.input_dtype).kind not in "fiu":
            return None
        pixels = int(np.prod(meta.sig_shape))
        mask_rows = []
        specs = []
        need_var = False
        need_colsum = False
        col_off = 0
        device_entries = [
            (ui, e) for ui, e in enumerate(plan) if not e.host
        ]
        if not device_entries:
            return None
        for ui, entry in device_entries:
            spec_fn = getattr(entry.udf, "fused_moments_spec", None)
            if spec_fn is None:
                return None
            try:
                s = spec_fn()
            except Exception:
                return None
            if s is None:
                return None
            mode = s["mode"]
            if mode == "masks":
                op = np.asarray(s["operand"], dtype=np.float32)
                if op.ndim != 2 or op.shape[1] != pixels:
                    return None
                mask_rows.append(op)
                specs.append({
                    "ui": ui, "mode": "masks", "name": s["name"],
                    "off": col_off, "n": op.shape[0],
                })
                col_off += op.shape[0]
            elif mode == "sumsig":
                specs.append({
                    "ui": ui, "mode": "sumsig", "name": s["name"],
                    "off": None,
                })
            elif mode == "colsum":
                need_colsum = True
                specs.append({
                    "ui": ui, "mode": "colsum", "name": s["name"],
                })
            elif mode == "stats":
                need_var = True
                need_colsum = True
                specs.append({"ui": ui, "mode": "stats"})
            elif mode == "noop":
                specs.append({"ui": ui, "mode": "noop"})
            else:
                return None
        sumsig_col = None
        if any(s["mode"] == "sumsig" for s in specs):
            mask_rows.append(np.ones((1, pixels), dtype=np.float32))
            sumsig_col = col_off
            col_off += 1
        for s in specs:
            if s["mode"] == "sumsig":
                s["off"] = sumsig_col
        if col_off == 0:
            # pad one zero column so the op has a mask operand
            mask_rows.append(np.zeros((1, pixels), dtype=np.float32))
            col_off = 1
        masks_t = np.concatenate(mask_rows, axis=0)
        # masks-only passes (no per-pixel colsum/var/sumsig) can run
        # block-compacted when the stack's union support is small
        # (ops/sparse_masks.py)
        compaction = None
        if (
            not need_var and not need_colsum and sumsig_col is None
            and masks_t.shape[0] > 0
        ):
            from ..ops.sparse_masks import plan_compaction
            compaction = plan_compaction(masks_t)
        return {
            "masks_t": masks_t,
            "specs": specs,
            "need_var": need_var,
            "need_colsum": need_colsum,
            "compaction": compaction,
        }

    def _fused_step(
        self, prep, state, part_state, raw_block,
        local_off, valid_count, data_terms=None,
    ):
        """Fused-path step body: one matmul+moments op, then
        distribute columns/moments into each UDF's buffers."""
        from ..ops.moments import fused_moments

        fused = prep["fused"]
        plan = prep["plan"]
        depth = raw_block.shape[0]
        sig_shape = tuple(prep["meta"].dataset_shape.sig)
        if prep["corr_plan"] is None:
            # skip the up-front cast: fused_moments converts in VMEM,
            # so narrow integer blocks are read from HBM at their raw
            # width (a pre-cast would materialize an f32 copy — 5x the
            # HBM traffic for uint16 detector data)
            block = raw_block
        else:
            block = self._apply_corrections(
                raw_block, prep, valid_count
            )
        comp = fused.get("compaction")
        if comp is not None:
            from ..ops.sparse_masks import gather_blocks
            flat = gather_blocks(
                block.reshape(depth, -1),
                comp["support"], comp["block"],
            )
            masks_t = jnp.asarray(comp["operand_c"].T)
            operand = flat
        else:
            masks_t = jnp.asarray(fused["masks_t"])
            # keep the block's NATIVE (depth, *sig) device layout:
            # reshape(depth, -1) on TPU is a physical relayout of
            # the whole block (~30% of pipeline throughput) — the
            # fused op contracts over the trailing dims directly
            operand = block
        y, colsum, colvar = fused_moments(
            operand, masks_t, valid_count,
            compute_var=fused["need_var"],
            precision=prep["matmul_precision"],
            data_terms=data_terms,
        )
        valid_mask = (
            jnp.arange(depth, dtype=jnp.int32) < valid_count
        )
        new_state = [dict(s) for s in state]
        new_part = [dict(s) for s in part_state]
        for spec in fused["specs"]:
            ui = spec["ui"]
            entry = plan[ui]
            mode = spec["mode"]
            if mode == "noop":
                continue
            state_u = new_state[ui]
            part_u = new_part[ui]
            if mode in ("masks", "sumsig"):
                name = spec["name"]
                decl = entry.decls[name]
                if mode == "masks" and len(decl.extra_shape):
                    rows = y[:, spec["off"]:spec["off"] + spec["n"]]
                else:
                    rows = y[:, spec["off"]]
                old = jax.lax.dynamic_slice(
                    state_u[name],
                    (local_off,) + (0,) * len(decl.extra_shape),
                    (depth,) + decl.extra_shape,
                )
                bshape = valid_mask.shape + (1,) * (rows.ndim - 1)
                rows = jnp.where(
                    valid_mask.reshape(bshape),
                    old + rows.astype(old.dtype), old,
                )
                state_u[name] = jax.lax.dynamic_update_slice(
                    state_u[name], rows,
                    (local_off,) + (0,) * (rows.ndim - 1),
                )
            elif mode == "colsum":
                name = spec["name"]
                part_u[name] = part_u[name] + colsum.reshape(
                    sig_shape
                ).astype(part_u[name].dtype)
            elif mode == "stats":
                from .stddev import _combine
                n1 = valid_count.astype(jnp.float32)
                n, s_, v = _combine(
                    part_u["num_frames"], part_u["sum"],
                    part_u["varsum"],
                    n1, colsum.reshape(sig_shape),
                    colvar.reshape(sig_shape),
                )
                part_u["num_frames"] = n
                part_u["sum"] = s_
                part_u["varsum"] = v
        return new_state, new_part

    def _step_body(
        self, prep, state, part_state, raw_block,
        local_off, global_off, coords, valid_count,
        data_terms=None,
    ):
        """The traced per-block step body.

        ``local_off``  — block's first-frame offset into the (possibly
                         shard-local) nav state arrays.
        ``global_off`` — offset into the roi-compressed global nav
                         ordering (for aux gathers and UDF metadata).
        ``data_terms`` — static per-block value-range certificate from
                         the host feed (``_block_data_terms``); lets
                         the fused split-matmul kernel drop MXU passes
                         whose term is exactly zero.
        """
        if prep.get("fused") is not None:
            return self._fused_step(
                prep, state, part_state, raw_block, local_off,
                valid_count, data_terms=data_terms,
            )
        plan = prep["plan"]
        scheme = prep["scheme"]
        meta = prep["meta"]
        depth = scheme.depth
        aux_all = prep["aux"]
        sig_shape = tuple(meta.dataset_shape.sig)
        if raw_block.ndim != 1 + len(sig_shape):
            # a mid-run patch disabled fusion while the feed is
            # already flat: restore the (depth, *sig) view (pays one
            # relayout — correctness over speed on this rare path)
            raw_block = raw_block.reshape((depth,) + sig_shape)
        block = self._apply_corrections(raw_block, prep, valid_count)
        valid_mask = (
            jnp.arange(depth, dtype=jnp.int32) < valid_count
        )
        new_state = [dict(s) for s in state]
        new_part = [dict(s) for s in part_state]
        # aux gathers depend only on (global_off, depth), not the
        # sig slice: build them once, not once per sig tile
        aux_views_all = [
            {
                name: jax.lax.dynamic_slice_in_dim(
                    arr, global_off, depth, axis=0
                )
                for name, arr in aux_all[ui].items()
            }
            for ui in range(len(plan))
        ]
        for k, sig_slice in scheme.slices:
            if len(scheme) == 1:
                tile = block
            else:
                tile = block[(slice(None),) + sig_slice.get()]
            for ui, entry in enumerate(plan):
                if entry.host:
                    continue
                aux_views = aux_views_all[ui]
                self._run_udf_on_tile(
                    entry, tile, k, sig_slice, meta,
                    new_state[ui], new_part[ui],
                    local_off, global_off, coords, valid_mask,
                    valid_count, aux_views, depth,
                )
        return new_state, new_part

    def _make_step(self, prep) -> Callable:
        """Jitted single-device per-block step.  ``data_terms`` is
        static: each distinct value-range class compiles once (at most
        two executables — specialized and general)."""

        def step(state, part_state, raw_block, goff, coords,
                 valid_count, data_terms=None):
            return self._step_body(
                prep, state, part_state, raw_block,
                goff, goff, coords, valid_count,
                data_terms=data_terms,
            )

        return jax.jit(
            step, donate_argnums=(0, 1), static_argnums=(6,)
        )

    @staticmethod
    def _block_data_terms(prep, payload) -> Optional[int]:
        """Probe a host-side block for the split-matmul value-range
        certificate (``ops.moments`` ``data_terms``): blocks whose
        values are all INTEGERS in [-256, 256] are exactly bf16-
        representable (1 term), and integers in [-65536, 65536]
        split into two exactly-bf16 round-trip terms (the residual
        of such an integer is itself an integer <= 256).  The VMEM
        split kernel then runs that many MXU passes per tile instead
        of the dtype-derived count, bit-identical results:

        * u16/i16 counting-detector data with small counts: 2 -> 1
          pass (the original certificate);
        * f32 / 32-bit-int storage holding integer counts — post-
          corrected counting data, the reference's common case
          (docs/performance.md) — 3 -> 1 or 2 passes.  f32 blocks
          additionally verify element-wise integrality via an exact
          i32 round-trip (cheap early-out on the min/max first).

        Runs in the prefetch/assembly thread, overlapped with device
        compute; the probe is a SIMD scan at host memory bandwidth,
        far cheaper than the read+assembly copy the feed already
        performs.  Returns None (no specialization) unless the fused
        split path is active for this run.
        """
        if (
            prep.get("fused") is None
            or prep.get("corr_plan") is not None
            or prep.get("matmul_precision") is None
        ):
            return None
        dt = payload.dtype
        if payload.size == 0:
            return None
        kind = dt.kind
        if kind in "iu" and dt.itemsize == 2:
            if int(payload.max()) > 256:
                return None
            if kind == "i" and int(payload.min()) < -256:
                return None
            return 1
        if kind in "iu" and dt.itemsize == 4:
            mx = int(payload.max())
            mn = int(payload.min()) if kind == "i" else 0
            if mn < -65536 or mx > 65536:
                return None
            return 1 if (-256 <= mn and mx <= 256) else 2
        if kind == "f" and dt.itemsize == 4:
            mx = payload.max()
            mn = payload.min()
            # range check first (also rejects NaN/inf), then the
            # cheap endpoint-integrality early-out before the full
            # element-wise round-trip
            if not (mn >= -65536.0 and mx <= 65536.0):
                return None
            if mn != np.floor(mn) or mx != np.floor(mx):
                return None
            ivals = payload.astype(np.int32)
            if not np.array_equal(
                ivals.astype(np.float32), payload
            ):
                return None
            return 1 if (mn >= -256.0 and mx <= 256.0) else 2
        return None

    def _run_udf_on_tile(
        self, entry, tile, scheme_idx, sig_slice, meta,
        state_u, part_u, local_off, global_off, coords, valid_mask,
        valid_count, aux_views, depth,
    ):
        goff = local_off  # nav-state updates use the local offset
        udf = entry.udf
        decls = entry.decls
        whole_sig = (
            tuple(sig_slice.shape) == tuple(meta.dataset_shape.sig)
        )

        # gather current nav rows (block frames are contiguous)
        nav_old = {
            name: jax.lax.dynamic_slice(
                state_u[name],
                (goff,) + (0,) * len(decls[name].extra_shape),
                (depth,) + decls[name].extra_shape,
            )
            for name in entry.nav_names
        }

        # sig views (sub-rectangle when sig-tiled)
        def sig_view(name):
            full = part_u[name]
            if whole_sig:
                return full
            idx = sig_slice.get() + tuple(
                slice(None) for _ in decls[name].extra_shape
            )
            return full[idx]

        def sig_writeback(name, val):
            if whole_sig:
                part_u[name] = val
            else:
                idx = sig_slice.get() + tuple(
                    slice(None) for _ in decls[name].extra_shape
                )
                part_u[name] = part_u[name].at[idx].set(val)

        meta.sig_slice = sig_slice
        meta.tiling_scheme_idx = scheme_idx
        meta.global_offset = global_off
        meta.array_backend = "jax"

        if entry.method in ("tile", "partition"):
            views = {}
            for name in entry.nav_names:
                views[name] = nav_old[name]
            for name in entry.part_names:
                if decls[name].kind == "sig":
                    views[name] = sig_view(name)
                else:
                    views[name] = part_u[name]
            for name in entry.result_only_names:
                # result_only buffers exist only in get_results
                # (reference rule: self.results.<x> is None during
                # processing)
                views[name] = None
            udf.results = UDFData(views)
            udf.params = UDFParams(udf._kwargs, aux_views)
            meta.coordinates = coords
            meta.tile_valid = valid_mask
            meta.valid_frames = valid_count
            if entry.method == "tile":
                udf.process_tile(tile)
            else:
                udf.process_partition(tile)
            res = udf.results
            for name in entry.nav_names:
                new = res._get(name)
                if name in res._touched:
                    bshape = valid_mask.shape + (1,) * (new.ndim - 1)
                    new = jnp.where(
                        valid_mask.reshape(bshape), new, nav_old[name]
                    )
                    state_u[name] = jax.lax.dynamic_update_slice(
                        state_u[name], new.astype(state_u[name].dtype),
                        (goff,) + (0,) * (new.ndim - 1),
                    )
            for name in entry.part_names:
                if name in res._touched:
                    if decls[name].kind == "sig":
                        sig_writeback(
                            name, res._get(name).astype(decls[name].dtype)
                        )
                    else:
                        part_u[name] = res._get(name).astype(
                            decls[name].dtype
                        )
        elif entry.frame_navonly:
            # vmap over frames — embarrassingly parallel
            def per_frame(frame, coord, olds, auxr):
                views = dict(olds)
                for name in entry.result_only_names:
                    views[name] = None
                udf.results = UDFData(views)
                udf.params = UDFParams(udf._kwargs, auxr)
                meta.coordinates = coord
                udf.process_frame(frame)
                return {
                    n: udf.results._get(n).astype(decls[n].dtype)
                    for n in entry.nav_names
                }

            out = jax.vmap(per_frame)(tile, coords, nav_old, aux_views)
            for name in entry.nav_names:
                new = out[name]
                bshape = valid_mask.shape + (1,) * (new.ndim - 1)
                new = jnp.where(
                    valid_mask.reshape(bshape), new, nav_old[name]
                )
                state_u[name] = jax.lax.dynamic_update_slice(
                    state_u[name], new,
                    (goff,) + (0,) * (new.ndim - 1),
                )
        else:
            # frame mode with sig/single accumulation: sequential scan
            carry_in = {}
            for name in entry.part_names:
                carry_in[name] = (
                    sig_view(name) if decls[name].kind == "sig"
                    else part_u[name]
                )

            def body(carry, xs):
                frame, coord, fvalid, olds, auxr = xs
                views = dict(olds)
                views.update(carry)
                udf.results = UDFData(views)
                udf.params = UDFParams(udf._kwargs, auxr)
                meta.coordinates = coord
                udf.process_frame(frame)
                res = udf.results
                new_carry = {
                    n: jnp.where(
                        fvalid,
                        res._get(n).astype(decls[n].dtype),
                        carry[n],
                    )
                    for n in entry.part_names
                }
                nav_out = {
                    n: jnp.where(
                        fvalid,
                        res._get(n).astype(decls[n].dtype),
                        olds[n],
                    )
                    for n in entry.nav_names
                }
                return new_carry, nav_out

            carry_out, nav_rows = jax.lax.scan(
                body, carry_in,
                (tile, coords, valid_mask, nav_old, aux_views),
            )
            for name in entry.part_names:
                if decls[name].kind == "sig":
                    sig_writeback(name, carry_out[name])
                else:
                    part_u[name] = carry_out[name]
            for name in entry.nav_names:
                state_u[name] = jax.lax.dynamic_update_slice(
                    state_u[name], nav_rows[name],
                    (goff,) + (0,) * (nav_rows[name].ndim - 1),
                )

    def _make_merge(self, prep) -> Callable:
        """Jitted fold of a partition's sig/single state into the global
        state via each UDF's (traced) merge()."""
        plan = prep["plan"]

        def merge_fn(state, part_state):
            new_state = [dict(s) for s in state]
            for ui, entry in enumerate(plan):
                if not entry.part_names or entry.host:
                    continue
                udf = entry.udf
                dest = UDFData({
                    n: new_state[ui][n] for n in entry.part_names
                })
                src = UDFData({
                    n: part_state[ui][n] for n in entry.part_names
                })
                udf.merge(dest, src)
                for n in entry.part_names:
                    if n in dest._touched:
                        new_state[ui][n] = dest._get(n).astype(
                            entry.decls[n].dtype
                        )
            return new_state

        return jax.jit(merge_fn, donate_argnums=(0,))

    # -- main loop -----------------------------------------------------------

    def _make_progress(self, progress, n_frames, n_parts, prep,
                       task_max=None, sig_size=1):
        """progress may be False, True (tqdm or the runner-level
        ``progress_reporter``), or a ProgressReporter instance (e.g.
        the web engine's).  ``task_max`` maps partition idents to
        their frame budgets so fine-grained comms updates and the
        synchronous completion fallback never double-count."""
        if not progress:
            return None
        from ..common.progress import (
            ProgressManager, ProgressReporter, TQDMProgressReporter,
        )
        if isinstance(progress, ProgressReporter):
            reporter = progress
        elif self._progress_reporter is not None:
            reporter = self._progress_reporter
        else:
            reporter = TQDMProgressReporter()
        return ProgressManager(
            n_frames, n_parts, reporter, progress_id=str(id(prep)),
            task_max=task_max, sig_size=sig_size,
        )

    @staticmethod
    def _prefetch(iterable, transform, depth: int = 2):
        """Double-buffered pipeline: a background thread reads + H2D-
        transfers the next blocks while the device computes (the
        TPU-native replacement for the reference's shm-queue worker
        feed, executor/utils/shmqueue.py).

        Abandoning the consumer (e.g. dropping a partial-results
        iterator mid-run) signals the worker to stop, so it doesn't
        stay blocked on a full queue pinning multi-GB block buffers.
        """
        import queue as queue_mod
        import threading

        q: queue_mod.Queue = queue_mod.Queue(maxsize=depth)
        stop = threading.Event()
        DONE = object()

        def _put(item):
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue_mod.Full:
                    continue
            return False

        def worker():
            try:
                for item in iterable:
                    if stop.is_set() or not _put(
                        ("item", transform(item))
                    ):
                        return
                _put(("done", DONE))
            except BaseException as e:  # propagate to consumer
                _put(("error", e))

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                kind, payload = q.get()
                if kind == "done":
                    break
                if kind == "error":
                    raise payload
                yield payload
            t.join()
        finally:
            stop.set()

    @staticmethod
    def _commit_aux_default(prep):
        """_build_aux keeps aux host-side when no device was named
        (the sharded loop replicates from the host copy), but the
        single-device loop must not let numpy aux bake into the
        traced step as XLA constants — device_put to the default
        device instead.  Re-run after a mid-run param patch (which
        rebuilds prep['aux'] host-side again)."""
        if prep["device"] is not None:
            return
        for entry in prep["aux"]:
            for k, arr in entry.items():
                if isinstance(arr, np.ndarray):
                    entry[k] = device_put_safe(arr)

    def _run_loop(self, prep, dataset, roi, progress, yield_partial):
        self._commit_aux_default(prep)
        state = self._init_state(prep)
        step = self._make_step(prep)
        merge = self._make_merge(prep)
        damage_host = np.zeros(prep["n_nav"], dtype=bool)

        # opt-in per-stage timing of the single-device feed pipeline
        # (block read+assembly+H2D vs device step) — the CI bound in
        # tests/test_sharded.py test_feed_budget_single_device guards
        # the host-feed path the same way the sharded stats guard the
        # mesh loop.  Forces a device sync per step, so only enable
        # when measuring.
        self.last_feed_stats = None
        if os.environ.get("LIBERTEM_TPU_FEED_STATS"):
            self.last_feed_stats = {
                "feed_s": 0.0, "step_s": 0.0, "n_blocks": 0,
            }

        host_entries = [
            (ui, e) for ui, e in enumerate(prep["plan"]) if e.host
        ]
        host_runner = None
        host_global = None
        if host_entries:
            from .host import HostUDFRunner
            host_runner = HostUDFRunner(
                [e for _, e in host_entries], prep
            )
            # aux arrays for host udfs come from the host copies;
            # refresh_aux re-derives them after a mid-run param patch
            host_runner._aux_uis = [ui for ui, _ in host_entries]
            host_runner.refresh_aux(prep)
            host_global = host_runner.init_global()
            prep["host_global"] = {
                ui: host_global[i]
                for i, (ui, _) in enumerate(host_entries)
            }
        device_entries_exist = any(
            not e.host for e in prep["plan"]
        )

        partitions = prep["partitions"]
        sig_size = int(np.prod(tuple(dataset.shape.sig)))
        pm = self._make_progress(
            progress, prep["n_nav"], len(partitions), prep,
            task_max={
                p.get_ident(): p.frames_in_roi(roi)
                for p in partitions
            },
            sig_size=sig_size,
        )

        # task comms (reference TaskCommHandler protocol,
        # common/executor.py:694): datasets with a real handler get a
        # worker queue + per-partition trackers streaming
        # partition_start/tile_complete messages, dispatched to the
        # progress manager by the handler's monitor thread
        from ..executor.base import (
            NoopCommHandler, SimpleWorkerContext, SimpleWorkerQueue,
        )
        comms = dataset.get_task_comm_handler()
        # fine-grained signalling runs when the dataset streams
        # (a real comm handler) OR progress is requested — the
        # reference's worker contexts are executor-level, so plain
        # datasets get tile-level progress messages too
        comms_active = (
            not isinstance(comms, NoopCommHandler) or pm is not None
        )
        worker_context = None
        comms_queue = None
        if pm is not None:
            pm.connect(comms)
        if comms_active:
            comms_queue = SimpleWorkerQueue()
            worker_context = SimpleWorkerContext(comms_queue)

        densify_cache: dict = {}
        from contextlib import ExitStack
        self._partitions_done = 0
        try:
            with ExitStack() as stack:
                if comms_active:
                    comms.start()
                    stack.callback(comms.done)
                    stack.enter_context(comms.monitor(comms_queue))
                try:
                    yield from self._run_loop_body(
                        prep, dataset, roi, yield_partial,
                        partitions, pm, host_runner, host_global,
                        device_entries_exist, densify_cache,
                        damage_host, state, step, merge,
                        worker_context=worker_context,
                        comms=comms if comms_active else None,
                        comms_queue=comms_queue,
                    )
                except JobCancelledError:
                    # a task signalled cancellation (reference
                    # contract: test_context test_udf_cancellation)
                    raise UDFRunCancelled(
                        f"UDF run cancelled after "
                        f"{self._partitions_done} partitions"
                    ) from None
        finally:
            # always runs — including when a partial-results iterator
            # is abandoned mid-run (GeneratorExit) — so task_data
            # resources release and the progress reporter closes
            for udf in self._udfs:
                udf.cleanup()
            if pm is not None:
                pm.close()

    def _run_loop_body(
        self, prep, dataset, roi, yield_partial, partitions, pm,
        host_runner, host_global, device_entries_exist,
        densify_cache, damage_host, state, step, merge,
        worker_context=None, comms=None, comms_queue=None,
    ):
        from ..common.progress import (
            PartitionProgressTracker, PartitionTrackerNoOp,
        )
        sig_size = int(np.prod(tuple(dataset.shape.sig)))
        scheme = prep["scheme"]
        device = prep["device"]
        any_partition = False
        for partition in partitions:
            if self._params_patched:
                # runtime parameter update (reference:
                # ResultsForDataSet.update_parameters_experimental,
                # udf/base.py:96): rebuild the traced step + fused
                # plan at the next partition boundary
                self._params_patched = False
                self._apply_param_patch(prep)
                self._commit_aux_default(prep)
                step = self._make_step(prep)
                merge = self._make_merge(prep)
                if host_runner is not None:
                    # the patch rebuilt prep['aux_host']; the host
                    # runner's frozen copy must follow, or host UDFs
                    # keep reading pre-patch aux data
                    host_runner.refresh_aux(prep)
            n_sel = partition.frames_in_roi(roi)
            if n_sel == 0:
                continue
            any_partition = True
            if comms is not None:
                # per-task hook (reference inline.py:108): live
                # sources push detector data here; a handler may
                # raise JobCancelledError to abort the run, which
                # the caller converts to UDFRunCancelled
                comms.handle_task(
                    _PartitionTask(partition), comms_queue
                )
            tracker = (
                PartitionProgressTracker(
                    partition.get_ident(), worker_context, sig_size
                )
                if worker_context is not None
                else PartitionTrackerNoOp()
            )
            tracker.signal_start()
            part_state = self._init_part_state(prep)
            host_part = (
                host_runner.init_partition() if host_runner else None
            )
            goff0 = partition.roi_offset(roi)
            self._refresh_task_data(prep, partition, roi, goff0, n_sel)
            # reference cadence: preprocess sees per-partition result
            # and aux VIEWS for host-engine UDFs (mutable-view
            # semantics, reference udf/base.py set_views); device
            # UDFs get the bare lifecycle call (their state lives in
            # the traced step)
            host_init = None
            if host_runner is not None:
                host_runner.bind_partition_views(
                    host_global, host_part, goff0, n_sel
                )
            for udf in self._udfs:
                udf.preprocess()
            if host_runner is not None:
                host_runner.unbind_views()
                # pre-merge dest state for custom merges (the
                # reference main-node buffer after preprocess)
                host_init = host_runner.snapshot_init(
                    host_global, goff0, n_sel
                )

            def to_device(block):
                dev = None
                if device_entries_exist:
                    if getattr(block, "sparse", None) is not None:
                        # sparse block: ship the CSR triple (H2D
                        # scales with nnz) and densify on-device via
                        # scatter-add; zero padding entries hit
                        # (0, 0) with value 0
                        vals, rows, cols = block.sparse
                        # flat_feed in the key: a mid-run patch can
                        # flip the feed layout, and the cached
                        # closure bakes it in
                        key = (vals.shape[0], block.block_shape,
                               vals.dtype, prep["flat_feed"])
                        if key not in densify_cache:
                            d, *sigdims = block.block_shape
                            n_pix = int(np.prod(sigdims))

                            _flat = prep["flat_feed"]

                            def densify(v, r, c, _d=d, _p=n_pix,
                                        _s=tuple(sigdims),
                                        _keep_flat=_flat):
                                flat = jnp.zeros((_d, _p), v.dtype)
                                flat = flat.at[r, c].add(v)
                                if _keep_flat:
                                    return flat
                                return flat.reshape((_d,) + _s)

                            densify_cache[key] = jax.jit(densify)
                        dev_block = densify_cache[key](
                            jax.device_put(vals, device),
                            jax.device_put(rows, device),
                            jax.device_put(cols, device),
                        )
                        dterms = None
                    else:
                        payload = block.data
                        if prep["flat_feed"]:
                            # host-side reshape: free (row-major view)
                            payload = payload.reshape(
                                payload.shape[0], -1
                            )
                        dterms = self._block_data_terms(prep, payload)
                        dev_block = device_put_safe(payload, device)
                    dev = (
                        dev_block,
                        jnp.int32(block.global_offset),
                        jax.device_put(block.coords, device),
                        jnp.int32(block.valid),
                        dterms,
                    )
                return dev, block

            fstats = self.last_feed_stats
            if fstats is not None:
                import time as _time
                blocks_iter = partition.gen_blocks(scheme, roi)

                def timed_blocks(_it=iter(blocks_iter)):
                    # runs inside the prefetch worker: charges block
                    # read/assembly time to feed_s
                    while True:
                        t0 = _time.perf_counter()
                        try:
                            b = next(_it)
                        except StopIteration:
                            return
                        fstats["feed_s"] += _time.perf_counter() - t0
                        yield b

                inner_to_device = to_device

                def to_device(block):  # noqa: F811
                    t0 = _time.perf_counter()
                    out = inner_to_device(block)
                    if out[0] is not None:
                        jax.block_until_ready(out[0][0])
                    fstats["feed_s"] += _time.perf_counter() - t0
                    fstats["n_blocks"] += 1
                    return out

                feed_iter = self._prefetch(timed_blocks(), to_device)
            else:
                feed_iter = self._prefetch(
                    partition.gen_blocks(scheme, roi), to_device
                )
            for dev, block in feed_iter:
                if dev is not None:
                    dev_block, goff, coords, valid, dterms = dev
                    if fstats is not None:
                        t0 = _time.perf_counter()
                        state, part_state = step(
                            state, part_state, dev_block, goff,
                            coords, valid, dterms,
                        )
                        jax.block_until_ready(part_state)
                        fstats["step_s"] += _time.perf_counter() - t0
                    else:
                        state, part_state = step(
                            state, part_state, dev_block, goff,
                            coords, valid, dterms,
                        )
                if host_runner is not None:
                    host_runner.process_block(
                        host_global, host_part, block.data,
                        block.global_offset, block.coords,
                        block.valid,
                    )
                tracker.signal_frames_complete(block.valid)
            # postprocess BEFORE the partition fold — the reference's
            # worker runs postprocess on the partition copy, then
            # ships it (udf/base.py:2311).  Host UDFs get partition
            # views; device UDFs that OVERRIDE postprocess get
            # concrete host copies of their buffers bound (nav rows
            # of this partition + per-partition sig/single
            # accumulators), written back into device state after.
            if host_runner is not None:
                host_runner.bind_partition_views(
                    host_global, host_part, goff0, n_sel
                )
            post_bound = self._bind_device_postprocess(
                prep, state, part_state, goff0, n_sel
            )
            for udf in self._udfs:
                udf.postprocess()
            state, part_state = self._writeback_device_postprocess(
                prep, state, part_state, goff0, n_sel, post_bound
            )
            if host_runner is not None:
                host_runner.unbind_views()
            state = merge(state, part_state)
            if host_runner is not None:
                # during merge, the valid nav mask is the positions
                # merged so far — NOT including this partition
                # (reference udf/base.py:561 + test_valid_mask)
                prep["meta"]._valid_nav_mask = damage_host.copy()
                try:
                    host_runner.merge_partition(
                        host_global, host_part, goff0, n_sel,
                        init_rows=host_init,
                    )
                finally:
                    prep["meta"]._valid_nav_mask = None
            fvc = getattr(dataset, "frames_valid_count", None)
            if fvc is None:
                damage_host[goff0:goff0 + n_sel] = True
            else:
                # early-finish sources (live ring finish()): only
                # frames that actually arrived are damage=True —
                # reads past the arrived count returned zeros
                vc = int(fvc())
                sel_ids = (
                    np.flatnonzero(np.asarray(roi).reshape(-1))[
                        goff0:goff0 + n_sel
                    ]
                    if roi is not None
                    else np.arange(goff0, goff0 + n_sel)
                )
                cut = int(np.searchsorted(sel_ids, vc))
                damage_host[goff0:goff0 + cut] = True
            self._partitions_done += 1
            if pm is not None:
                pm.partition_done(n_sel, ident=partition.get_ident())
            if yield_partial:
                yield self._wrap_results(prep, state, damage_host.copy())
        # final wrap happens BEFORE cleanup (the caller's finally):
        # UDF.get_results may consult task_data, which cleanup()
        # releases
        if not any_partition or not yield_partial:
            yield self._wrap_results(prep, state, damage_host)

    # -- sharded multi-device loop ----------------------------------------

    def _run_loop_sharded(
        self, prep, dataset, roi, progress, yield_partial, devices
    ):
        """SPMD over a 1-D device mesh: the roi-compressed nav axis is
        split into one contiguous shard per device; every super-step
        runs one block per device inside a single shard_mapped jitted
        program (no collectives in the hot loop — nav writes are
        shard-local, sig/single accumulate per device and are folded
        with the UDF's merge() at the end).
        """
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        scheme = prep["scheme"]
        depth = scheme.depth
        n_nav = prep["n_nav"]
        n_dev = len(devices)
        mesh = Mesh(np.array(devices), ("workers",))
        shard_spec = NamedSharding(mesh, P("workers"))
        repl_spec = NamedSharding(mesh, P())

        # Multi-host (DCN) support: under jax.distributed each process
        # only addresses its local devices — it assembles and
        # device_puts ONLY its own shards, and global arrays are built
        # with make_array_from_single_device_arrays.  Collectives in
        # the fold ride ICI within a host and DCN across hosts; every
        # process computes the same (replicated) final results.
        n_proc = jax.process_count()
        multihost = n_proc > 1
        my_proc = jax.process_index()
        local_idx = [
            i for i, d in enumerate(devices)
            if not multihost or d.process_index == my_proc
        ]
        local_set = set(local_idx)

        def put_sharded(arr):
            """(n_dev, ...) host array -> mesh-sharded jax array;
            only local rows are read under multihost."""
            if not multihost:
                return jax.device_put(arr, shard_spec)
            shards = [
                jax.device_put(arr[i:i + 1], devices[i])
                for i in local_idx
            ]
            return jax.make_array_from_single_device_arrays(
                arr.shape, shard_spec, shards
            )

        def put_replicated(arr):
            if not multihost:
                return jax.device_put(arr, repl_spec)
            shards = [
                jax.device_put(arr, devices[i]) for i in local_idx
            ]
            return jax.make_array_from_single_device_arrays(
                arr.shape, repl_spec, shards
            )

        meta0 = dataset.meta
        sig = tuple(meta0.shape.sig)
        nav_shape = tuple(meta0.shape.nav)
        partitions = prep["partitions"]

        # opt-in per-stage timing (benchmarks/bench_sharded_overhead
        # .py + the CI regression bound in tests/test_sharded.py):
        # accumulated wall seconds per pipeline stage, exposed as
        # runner.last_sharded_stats after the run.  Timing the step
        # forces a device sync, so only enable when measuring.
        import time as _time
        stats = None
        if os.environ.get("LIBERTEM_TPU_SHARDED_STATS"):
            stats = {
                "assembly_s": 0.0, "h2d_s": 0.0, "step_s": 0.0,
                "host_udf_s": 0.0, "fold_s": 0.0, "wrap_s": 0.0,
                "n_steps": 0, "n_devices": n_dev,
            }
        self.last_sharded_stats = stats

        # replicate aux arrays over the mesh from the host copies
        # (no device round trip; multi-host safe)
        for entry, host_entry in zip(prep["aux"], prep["aux_host"]):
            for k in entry:
                entry[k] = put_replicated(host_entry[k])

        # selected dataset-space frame ids, split into device shards
        if roi is not None:
            ids_all = np.flatnonzero(np.asarray(roi).reshape(-1))
        else:
            ids_all = np.arange(n_nav, dtype=np.int64)
        # in-order sources (live detector rings): BLOCK-CYCLIC shard
        # assignment — super-step s covers compressed positions
        # [s*G, (s+1)*G), G = n_dev*depth, device d taking the
        # contiguous sub-run [s*G + d*depth, +depth).  Each
        # super-step then consumes the next contiguous slice of the
        # acquisition, so the mesh processes frames AS THEY ARRIVE —
        # the contiguous-shard layout would park shard d>0 until the
        # acquisition reaches its region (reference live pushes to
        # whichever worker runs the partition, common/executor.py:694
        # TaskCommHandler; here the mesh replaces the workers).
        block_cyclic = not getattr(
            dataset, "supports_concurrent_reads", True
        )
        if block_cyclic:
            # one super-step's reads must fit the source's in-flight
            # window (e.g. half the live ring) or the producer and
            # the blocking reader deadlock
            cap = getattr(dataset, "max_inflight_frames", None)
            if cap is not None and n_dev * depth > int(cap):
                depth = max(1, int(cap) // n_dev)
        bounds = np.linspace(0, n_nav, n_dev + 1).astype(np.int64)
        shard_sizes = np.diff(bounds)
        shard_max = int(shard_sizes.max()) if n_nav else 0
        if block_cyclic:
            n_steps = max(1, -(-n_nav // (n_dev * depth)))
            # local nav buffers hold n_steps*depth rows; the
            # (shard_max + depth) allocation below always covers it:
            # n_steps*depth <= n_nav/n_dev + depth <= shard_max + depth
            prep["block_cyclic"] = (depth, n_steps)
        else:
            n_steps = max(1, -(-shard_max // depth))
            prep["block_cyclic"] = None
        frames_valid_count = getattr(
            dataset, "frames_valid_count", None
        )

        def read_ds_range(lo, hi):
            out = np.zeros((hi - lo,) + sig, dtype=meta0.native_dtype)
            for p in partitions:
                s = max(lo, p.start_frame)
                e = min(hi, p.start_frame + p.num_frames)
                if e > s:
                    out[s - lo:e - lo] = p.read_dataset_frames(s, e)
            return out

        def read_ds_selected(chunk):
            """Read the given dataset-space frame ids: per-frame fast
            path where partitions support it (sparse rois on the
            sharded executor otherwise read whole covering spans —
            the same optimization gen_blocks applies)."""
            out = np.zeros((len(chunk),) + sig, dtype=meta0.native_dtype)
            for p in partitions:
                lo_p = p.start_frame
                hi_p = p.start_frame + p.num_frames
                sel = (chunk >= lo_p) & (chunk < hi_p)
                if not sel.any():
                    continue
                ids_p = chunk[sel]
                out[sel] = p._read_selected_with_offset(ids_p)
            return out

        # per-device state: nav arrays are shard-local (+depth pad);
        # host entries keep an empty slot (their buffers live in the
        # host runner, not on the mesh)
        state = []
        for entry in prep["plan"]:
            bufs = {}
            if entry.host:
                state.append(bufs)
                continue
            for name in entry.nav_names:
                b = entry.decls[name]
                bufs[name] = put_sharded(np.zeros(
                    (n_dev, shard_max + depth) + b.extra_shape,
                    dtype=b.dtype,
                ))
            for name in entry.part_names:
                b = entry.decls[name]
                bufs[name] = put_sharded(
                    np.zeros((n_dev,) + b.shape, dtype=b.dtype)
                )
            state.append(bufs)

        def make_step():
            # data_terms (the per-super-step value-range certificate
            # from the assembly thread) is STATIC on the outer jit —
            # it selects the split kernel's MXU pass count, so it
            # closes over the shard_mapped body rather than flowing
            # through the mesh as data
            def outer(state, blk, loffs, goffs, valids, coords,
                      data_terms=None):
                def inner(state, blk, loff, goff, valid, coords):
                    sq = lambda t: jax.tree.map(lambda x: x[0], t)
                    # host entries have empty device-state slots —
                    # their buffers live in the host runner
                    nav_part = [
                        {n: s[n] for n in (
                            e.nav_names if not e.host else ()
                        )}
                        for s, e in zip(sq(state), prep["plan"])
                    ]
                    sig_part = [
                        {n: s[n] for n in (
                            e.part_names if not e.host else ()
                        )}
                        for s, e in zip(sq(state), prep["plan"])
                    ]
                    ns, nps = self._step_body(
                        prep, nav_part, sig_part, blk[0],
                        loff[0], goff[0], coords[0], valid[0],
                        data_terms=data_terms,
                    )
                    merged = [
                        {**a, **b} for a, b in zip(ns, nps)
                    ]
                    return jax.tree.map(lambda x: x[None], merged)

                return jax.shard_map(
                    inner, mesh=mesh,
                    in_specs=(
                        P("workers"), P("workers"), P("workers"),
                        P("workers"), P("workers"), P("workers"),
                    ),
                    out_specs=P("workers"),
                )(state, blk, loffs, goffs, valids, coords)

            return jax.jit(
                outer, donate_argnums=(0,), static_argnums=(6,)
            )

        step = make_step()
        fold = self._make_sharded_fold(prep, mesh)

        # Pre-warm the fold's trace+compile in the background: the
        # first fold otherwise costs ~0.4 s (trace+compile) inside
        # the first partial snapshot, ~100x its steady state (~3 ms,
        # benchmarks/bench_sharded_overhead.py) — a live GUI's first
        # partial result pays it on the critical path.  Warming here
        # overlaps the step's own first compile and the first
        # super-step's streaming (XLA compiles release the GIL).
        # A DUMMY zeros state keeps the real initial state
        # un-referenced (the step donates its state argument).
        # Skipped under multihost: an out-of-band SPMD program could
        # order its collectives differently per process.
        if not multihost and any(
            e.part_names and not e.host for e in prep["plan"]
        ):
            import threading as _threading

            def _warm_fold():
                try:
                    dummy = jax.tree.map(jnp.zeros_like, state)
                    jax.block_until_ready(fold(dummy))
                except Exception:
                    # warming is best-effort; a real fold failure
                    # surfaces on the foreground call
                    pass

            _threading.Thread(
                target=_warm_fold, daemon=True,
                name="sharded-fold-warm",
            ).start()

        damage_host = np.zeros(n_nav, dtype=bool)
        pm = self._make_progress(progress, n_nav, n_steps, prep)

        # numpy-backend (host) UDFs: processed from the host block
        # feed that the assembly loop builds anyway — each device
        # SHARD plays the partition role (its chunks stream into a
        # per-shard partition buffer, merged in shard order at the
        # end).  Multi-host is rejected up front in run().
        host_entries = [
            (ui, e) for ui, e in enumerate(prep["plan"]) if e.host
        ]
        host_runner = None
        host_global = None
        host_parts = None
        if host_entries:
            from .host import HostUDFRunner
            host_runner = HostUDFRunner(
                [e for _, e in host_entries], prep
            )
            host_runner._aux_uis = [ui for ui, _ in host_entries]
            host_runner.refresh_aux(prep)
            host_global = host_runner.init_global()
            prep["host_global"] = {
                ui: host_global[i]
                for i, (ui, _) in enumerate(host_entries)
            }
            host_parts = [
                host_runner.init_partition() for _ in range(n_dev)
            ]

        # preprocess/postprocess cadence: the mesh has no partitions,
        # so each device SHARD plays the partition role — one
        # preprocess call per shard up front (shards run in lockstep,
        # there is no 'just before shard d's first tile' point on a
        # single controller) and one postprocess per shard at the
        # end.  Parity target: the reference runs them per partition
        # on a FRESH per-task UDF copy (udf/base.py:1327
        # copy_for_partition, 2213 _init_udfs) — back-to-back calls
        # on one shared instance would multiply non-idempotent side
        # effects (e.g. a preprocess that opens a resource its
        # postprocess closes would leak n_dev-1 of them).  Shard 0
        # uses the REAL instances so preprocess-set state stays
        # visible to the traced step / host runner (the single-device
        # loop's behavior); shards 1.. get clones.
        shard_clones = [list(self._udfs)]
        for _shard in range(1, n_dev):
            clones = []
            for udf in self._udfs:
                clone = udf.copy()
                clone.meta = udf.meta
                clone._host_mode = udf._host_mode
                td = clone.get_task_data()
                clone.task_data = UDFData(td) if td else UDFData({})
                clones.append(clone)
            shard_clones.append(clones)
        for clones in shard_clones:
            for clone in clones:
                clone.preprocess()

        # Per-device reader pool: at real NVMe rates a serial read of
        # all n_dev chunks per super-step becomes the bottleneck long
        # before ICI does; chunks are disjoint file ranges, so they
        # read concurrently.  ROI compaction stays host-side
        # (cover[chunk - lo]): an on-device gather would need a
        # static-shape cover superset, which is unbounded for sparse
        # rois — the numpy take runs inside these reader threads.
        from concurrent.futures import ThreadPoolExecutor

        reader_pool = ThreadPoolExecutor(
            max_workers=min(n_dev, 8),
            thread_name_prefix="shard-reader",
        )

        def assemble_steps():
            """Host-side super-step assembly (runs ahead in the
            prefetch thread; per-device chunks read concurrently in
            the reader pool; damage spans applied only after the
            device step executed)."""
            n_pix = int(np.prod(sig))
            for s in range(n_steps):
                t0 = _time.perf_counter() if stats else 0.0
                # read per step: a mid-run patch may flip fusion and
                # with it the feed layout
                flat_feed = prep["flat_feed"]
                blk = np.zeros(
                    (n_dev, depth, n_pix) if flat_feed
                    else (n_dev, depth) + sig,
                    dtype=meta0.native_dtype,
                )
                loffs = np.zeros(n_dev, dtype=np.int32)
                goffs = np.zeros(n_dev, dtype=np.int32)
                valids = np.zeros(n_dev, dtype=np.int32)
                coords = np.zeros(
                    (n_dev, depth, len(nav_shape)), dtype=np.int32
                )
                spans = []

                def read_device_chunk(d):
                    off = s * depth
                    if block_cyclic:
                        base = s * (n_dev * depth) + d * depth
                        if base >= n_nav:
                            return None
                        chunk = ids_all[
                            base:min(base + depth, n_nav)
                        ]
                    else:
                        size_d = int(shard_sizes[d])
                        if off >= size_d:
                            return None
                        base = int(bounds[d]) + off
                        chunk = ids_all[
                            base:
                            min(base + depth, int(bounds[d + 1]))
                        ]
                    # offsets/coords/spans are global knowledge (every
                    # process computes them); only the DATA read is
                    # skipped for devices owned by other processes
                    loffs[d] = off
                    goffs[d] = base
                    valids[d] = len(chunk)
                    if len(nav_shape):
                        unr = np.unravel_index(chunk, nav_shape)
                        for dim, u in enumerate(unr):
                            coords[d, :len(chunk), dim] = u
                    if d in local_set:
                        lo, hi = int(chunk[0]), int(chunk[-1]) + 1
                        if len(chunk) * 2 < hi - lo:
                            # NOTE: same heuristic as gen_blocks'
                            # sparse-roi fast path (io/dataset/base.py)
                            # — keep the two in sync
                            # sparse roi: selective reads instead of
                            # the covering span
                            rows = read_ds_selected(chunk)
                        else:
                            cover = read_ds_range(lo, hi)
                            rows = cover[chunk - lo]
                        if flat_feed:
                            rows = rows.reshape(rows.shape[0], -1)
                        blk[d, :len(chunk)] = rows
                    return (base, base + len(chunk))

                if block_cyclic:
                    # in-order single-consumer source: reads MUST
                    # arrive ascending (the ring frees consumed
                    # frames), so read serially in device order —
                    # arrival order dominates anyway, concurrency
                    # buys nothing against a live producer
                    span_iter = map(read_device_chunk, range(n_dev))
                else:
                    span_iter = reader_pool.map(
                        read_device_chunk, range(n_dev)
                    )
                for span in span_iter:
                    if span is not None:
                        spans.append(span)
                if frames_valid_count is not None:
                    # early-finish damage: the source reports how
                    # many frames actually arrived (ring reads
                    # return zeros past finish()); clip each span's
                    # damage to the arrived prefix.  chunk ids are
                    # ascending, so the compressed-space cut is a
                    # searchsorted over this step's id slice.
                    vc = int(frames_valid_count())
                    clipped = []
                    for lo, hi in spans:
                        cut = int(np.searchsorted(
                            ids_all[lo:hi], vc
                        ))
                        if cut > 0:
                            clipped.append((lo, lo + cut))
                    spans = clipped
                # value-range probe over the whole super-step (all
                # shards share ONE compiled step, so the certificate
                # must hold for every shard's block).  Multi-host:
                # each process sees only its local shards' data, and
                # a static arg that differs across processes would
                # compile divergent SPMD programs — disable there.
                dterms = (
                    self._block_data_terms(prep, blk)
                    if not multihost else None
                )
                if stats:
                    stats["assembly_s"] += _time.perf_counter() - t0
                yield blk, loffs, goffs, valids, coords, spans, dterms

        def to_device(item):
            blk, loffs, goffs, valids, coords, spans, dterms = item
            t0 = _time.perf_counter() if stats else 0.0
            out = (
                put_sharded(blk),
                put_sharded(loffs),
                put_sharded(goffs),
                put_sharded(valids),
                put_sharded(coords),
                int(valids.sum()),
                spans,
                dterms,
                # host UDFs consume the HOST copy of the same feed
                # (processed on the main thread after the device
                # dispatch)
                (blk, goffs, valids, coords)
                if host_runner is not None else None,
            )
            if stats:
                jax.block_until_ready(out[0])
                stats["h2d_s"] += _time.perf_counter() - t0
            return out

        try:
            for (dev_blk, d_loffs, d_goffs, d_valids, d_coords,
                 n_valid, spans, dterms, host_item) in self._prefetch(
                assemble_steps(), to_device
            ):
                if self._params_patched:
                    # mid-run parameter update at the super-step
                    # boundary (parity with the single-device loop,
                    # reference udf/base.py:96): rebuild fused plan +
                    # re-trace the sharded step with the new params
                    self._params_patched = False
                    self._apply_param_patch(prep)
                    # re-replicate patched aux over the mesh from
                    # the host copies
                    for entry, host_entry in zip(
                        prep["aux"], prep["aux_host"]
                    ):
                        for k in entry:
                            entry[k] = put_replicated(
                                host_entry[k]
                            )
                    if host_runner is not None:
                        # the patch rebuilt prep['aux_host']; the host
                        # runner's frozen copy must follow (same as
                        # the single-device loop) or host UDFs keep
                        # reading pre-patch aux data
                        host_runner.refresh_aux(prep)
                    step = make_step()
                    # merge() may consult params too: the jitted
                    # cross-device fold must re-trace as well (parity
                    # with the single-device _make_merge rebuild)
                    fold = self._make_sharded_fold(prep, mesh)
                t0 = _time.perf_counter() if stats else 0.0
                state = step(
                    state, dev_blk, d_loffs, d_goffs, d_valids,
                    d_coords, dterms,
                )
                if stats:
                    jax.block_until_ready(state)
                    t1 = _time.perf_counter()
                    stats["step_s"] += t1 - t0
                    stats["n_steps"] += 1
                    t0 = t1
                if host_item is not None:
                    # host UDFs run on the main thread while the
                    # device crunches the dispatched step
                    h_blk, h_goffs, h_valids, h_coords = host_item
                    for d in range(n_dev):
                        v = int(h_valids[d])
                        if v == 0:
                            continue
                        # unconditional: the block was assembled
                        # flat or sig-shaped depending on the
                        # flat_feed at ASSEMBLY time (a mid-run
                        # patch can flip it while this block was in
                        # the prefetch pipeline) — a reshape to the
                        # sig view is correct and free either way
                        rows = h_blk[d].reshape((depth,) + sig)
                        host_runner.process_block(
                            host_global, host_parts[d], rows,
                            int(h_goffs[d]), h_coords[d], v,
                        )
                if stats and host_item is not None:
                    t1 = _time.perf_counter()
                    stats["host_udf_s"] += t1 - t0
                    t0 = t1
                for lo, hi in spans:
                    damage_host[lo:hi] = True
                if pm is not None:
                    pm.frames_done(n_valid)
                if yield_partial:
                    t0 = _time.perf_counter() if stats else 0.0
                    collapsed = self._collapse_sharded(
                        prep, state, bounds, shard_max, fold=fold
                    )
                    if stats:
                        t1 = _time.perf_counter()
                        stats["fold_s"] += t1 - t0
                        t0 = t1
                    wrapped = self._wrap_results(
                        prep, collapsed, damage_host.copy()
                    )
                    if stats:
                        stats["wrap_s"] += _time.perf_counter() - t0
                    yield wrapped
            if host_runner is not None:
                # fold each shard's partition buffers in shard order
                # (the host analogue of the device fold); the shard's
                # nav window plays the partition-slice role so custom
                # merges see their nav buffers (reference semantics)
                # valid_nav_mask exposes only positions merged SO FAR
                # (reference udf/base.py:2351): accumulate across the
                # fold instead of showing not-yet-merged shards as valid
                merged = np.zeros_like(damage_host)
                bc = prep.get("block_cyclic")
                for d in range(n_dev):
                    if bc is not None:
                        # block-cyclic: shard d owns one depth-run
                        # per super-step, not one contiguous window
                        bdepth, bsteps = bc
                        runs = []
                        for s in range(bsteps):
                            lo = s * n_dev * bdepth + d * bdepth
                            if lo >= n_nav:
                                break
                            runs.append(
                                (lo, min(bdepth, n_nav - lo))
                            )
                        window = None
                    else:
                        lo, hi = int(bounds[d]), int(bounds[d + 1])
                        window = (lo, hi - lo)
                        runs = None
                    prep["meta"]._valid_nav_mask = merged.copy()
                    try:
                        if runs is not None:
                            host_runner.merge_partition(
                                host_global, host_parts[d],
                                runs=runs,
                            )
                        else:
                            host_runner.merge_partition(
                                host_global, host_parts[d],
                                window[0], window[1],
                            )
                    finally:
                        prep["meta"]._valid_nav_mask = None
                    if runs is not None:
                        for lo, n in runs:
                            merged[lo:lo + n] = (
                                damage_host[lo:lo + n]
                            )
                    else:
                        lo, n = window
                        merged[lo:lo + n] = damage_host[lo:lo + n]
            # postprocess cadence: once per shard, on that shard's
            # instance (see preprocess); clones are cleaned up right
            # after (per-task lifecycle) — the REAL instances (shard
            # 0) keep their task_data until the run-level cleanup,
            # since get_results may still consult it
            real = set(map(id, self._udfs))
            for clones in shard_clones:
                for clone in clones:
                    clone.postprocess()
                    if id(clone) not in real:
                        clone.cleanup()
            # final wrap AFTER postprocess and BEFORE cleanup
            # (get_results may use task_data, which cleanup()
            # releases).  Yield it unconditionally: in yield_partial
            # mode the in-loop snapshots precede postprocess, so the
            # last yielded result must be produced here for
            # postprocess effects to be visible (parity with the
            # single-device loop's per-partition ordering).
            t0 = _time.perf_counter() if stats else 0.0
            collapsed = self._collapse_sharded(
                prep, state, bounds, shard_max, fold=fold
            )
            if stats:
                t1 = _time.perf_counter()
                stats["fold_s"] += t1 - t0
                t0 = t1
            wrapped = self._wrap_results(prep, collapsed, damage_host)
            if stats:
                stats["wrap_s"] += _time.perf_counter() - t0
            yield wrapped
        finally:
            # also runs when a partial-results iterator is abandoned
            # mid-run (GeneratorExit)
            reader_pool.shutdown(wait=False)
            for udf in self._udfs:
                udf.cleanup()
            if pm is not None:
                pm.close()

    def _make_sharded_fold(self, prep, mesh):
        """Jitted on-device cross-device reduction of the sig/single
        states: all_gather over the mesh axis (ICI on TPU pods) +
        a traced sequential fold with each UDF's merge() — the mesh
        equivalent of the reference's main-node merge loop
        (udf/base.py:2340)."""
        from jax.sharding import PartitionSpec as P

        plan = prep["plan"]
        n_dev = len(mesh.devices.reshape(-1))

        def inner(state):
            out = []
            for ui, entry in enumerate(plan):
                if not entry.part_names or entry.host:
                    # host entries fold on the host (their merge()
                    # is numpy code — not traceable here)
                    out.append({})
                    continue
                gathered = {
                    n: jax.lax.all_gather(
                        state[ui][n][0], "workers"
                    )
                    for n in entry.part_names
                }
                acc = {n: gathered[n][0] for n in entry.part_names}
                udf = entry.udf
                for d in range(1, n_dev):
                    dest = UDFData(acc)
                    src = UDFData({
                        n: gathered[n][d]
                        for n in entry.part_names
                    })
                    udf.merge(dest, src)
                    acc = {
                        n: dest._get(n).astype(entry.decls[n].dtype)
                        for n in entry.part_names
                    }
                out.append(acc)
            return out

        return jax.jit(jax.shard_map(
            inner, mesh=mesh, in_specs=(P("workers"),),
            out_specs=P(),
            # outputs are replicated by construction (every device
            # folds the same all_gathered values); skip the static
            # replication check
            check_vma=False,
        ))

    _reshard_cache: dict = {}

    @classmethod
    def _to_host(cls, arr) -> np.ndarray:
        """Device array -> host numpy; under multihost, non-
        addressable (sharded) arrays are resharded to replicated
        first (an XLA all_gather over ICI/DCN), then read from the
        local replica.  The resharding program is cached per mesh so
        repeated partial-result snapshots don't retrace."""
        if (
            hasattr(arr, "is_fully_addressable")
            and not arr.is_fully_addressable
        ):
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh = arr.sharding.mesh
            fn = cls._reshard_cache.get(mesh)
            if fn is None:
                repl = NamedSharding(mesh, P())
                fn = jax.jit(lambda x: x, out_shardings=repl)
                cls._reshard_cache[mesh] = fn
            arr = fn(arr)
            return asarray_safe(arr.addressable_shards[0].data)
        return asarray_safe(arr)

    def _collapse_sharded(self, prep, state, bounds, shard_max,
                          fold=None):
        """Per-device states -> one global state: nav shards
        concatenate positionally (host side — result-sized data);
        sig/single shards reduce on-device via _make_sharded_fold."""
        n_nav = prep["n_nav"]
        depth = prep["scheme"].depth
        folded = None
        if fold is not None and any(
            e.part_names and not e.host for e in prep["plan"]
        ):
            folded = fold(state)
        out = []
        for ui, entry in enumerate(prep["plan"]):
            bufs = {}
            if entry.host:
                # host entries' results live in prep['host_global']
                # (_wrap_results reads them from there); their device
                # state is untouched zeros
                out.append(bufs)
                continue
            for name in entry.nav_names:
                arr = self._to_host(state[ui][name])
                full = np.zeros(
                    (n_nav + depth,) + arr.shape[2:], arr.dtype
                )
                bc = prep.get("block_cyclic")
                if bc is not None:
                    # block-cyclic (live) layout: device d's local
                    # row (s, k) holds compressed position
                    # s*n_dev*depth + d*depth + k — de-interleave by
                    # a (dev, step, depth) -> (step, dev, depth)
                    # transpose
                    bdepth, n_steps = bc
                    n_dev = arr.shape[0]
                    inter = arr[:, :n_steps * bdepth].reshape(
                        (n_dev, n_steps, bdepth) + arr.shape[2:]
                    ).transpose(
                        (1, 0, 2) + tuple(range(3, arr.ndim + 1))
                    ).reshape(
                        (n_dev * n_steps * bdepth,) + arr.shape[2:]
                    )
                    full[:n_nav] = inter[:n_nav]
                else:
                    for d in range(arr.shape[0]):
                        full[bounds[d]:bounds[d + 1]] = arr[d][
                            :int(bounds[d + 1] - bounds[d])
                        ]
                bufs[name] = full
            if entry.part_names:
                # both call sites always pass fold, so folded is set
                # whenever any entry has part_names
                for n in entry.part_names:
                    bufs[n] = self._to_host(folded[ui][n])
            out.append(bufs)
        return out

    # -- result wrapping --------------------------------------------------

    def _wrap_results(self, prep, state, damage_host) -> UDFResults:
        """Snapshot raw result storage NOW (device buffers are
        donated to the next step; host buffers mutate in place) but
        defer ``get_results`` post-processing to first ``.buffers``
        access (lazy, reference contract
        test_lazy_get_results_not_called)."""
        n_nav = prep["n_nav"]
        meta = prep["meta"]
        host_global = prep.get("host_global") or {}
        raws = []
        for ui, entry in enumerate(prep["plan"]):
            raw = {}
            if entry.host:
                src_bufs = host_global.get(ui, {})
                for name in (
                    entry.nav_names + entry.part_names
                ):
                    arr = src_bufs.get(name)
                    if arr is None:
                        arr = np.zeros(
                            entry.decls[name].shape
                            if entry.decls[name].kind != "nav"
                            else (n_nav,)
                            + entry.decls[name].extra_shape,
                            entry.decls[name].dtype,
                        )
                    else:
                        # snapshot: later partitions keep mutating
                        # the live host buffers
                        arr = np.array(arr, copy=True)
                    raw[name] = arr
            else:
                for name in entry.nav_names:
                    raw[name] = asarray_safe(
                        state[ui][name]
                    )[:n_nav]
                for name in entry.part_names:
                    raw[name] = asarray_safe(state[ui][name])
            raws.append(raw)
        damage_snap = np.array(damage_host, dtype=bool, copy=True)

        def wrap_all():
            # expose the damage state to UDF.get_results via
            # meta.get_valid_nav_mask (reference udf/base.py:561) —
            # ONLY for the duration of the wrap: process functions
            # must see None (the reference's availability contract,
            # test_valid_mask)
            meta._valid_nav_mask = damage_snap
            try:
                return [
                    self._wrap_one(
                        prep, entry, entry.udf, raw, damage_snap,
                        meta,
                    )
                    for entry, raw in zip(prep["plan"], raws)
                ]
            finally:
                meta._valid_nav_mask = None

        damage_buf = BufferWrapper("nav", (), bool)
        damage_buf.set_shape_ds(meta.dataset_shape, prep["roi"])
        damage_buf.set_result(damage_snap, valid_nav_mask=damage_snap)
        return UDFResults(buffers_thunk=wrap_all, damage=damage_buf)

    def _wrap_one(self, prep, entry, udf, raw, damage_host, meta):
        """Raw storage arrays -> {name: BufferWrapper} for one UDF
        via ``udf._do_get_results()`` (overridable, reference
        udf/base.py:1226), enforcing the reference's declaration
        rules along the way."""
        udf.meta = meta
        full = dict(raw)
        for name in entry.result_only_names:
            full.setdefault(name, None)
        udf.results = UDFData(full)
        udf._wrap_ctx = (prep, entry, damage_host)
        # result wrapping happens on the controller with HOST arrays
        # (the reference main node): self.xp is numpy inside
        # get_results regardless of where processing ran
        udf._host_mode = True
        try:
            return udf._do_get_results()
        finally:
            udf._host_mode = False
            udf._wrap_ctx = None

    @staticmethod
    def _default_do_get_results(udf):
        """Default ``UDF._do_get_results`` body — runs
        ``get_results`` post-processing and wraps every public buffer
        into a result :class:`BufferWrapper` (reference
        udf/base.py:1226)."""
        prep, entry, damage_host = udf._wrap_ctx
        meta = udf.meta
        raw = udf.results.as_dict()
        derived = udf.get_results() or {}
        for name in derived:
            if name not in entry.decls:
                raise KeyError(
                    f"get_results returned {name!r} which is not "
                    f"declared in get_result_buffers"
                )
            if entry.decls[name].use == "private":
                raise UDFException(
                    f"get_results must not include the "
                    f"use='private' buffer {name!r}"
                )
        for name in entry.result_only_names:
            if name not in derived:
                raise UDFException(
                    f"don't know how to set use='result_only' "
                    f"buffer {name!r}; please implement "
                    f"`get_results`"
                )
        buffers = {}
        for name, decl in entry.decls.items():
            if decl.use == "private":
                continue
            out = BufferWrapper(
                decl.kind, decl.extra_shape, decl.dtype
            )
            out.set_shape_ds(meta.dataset_shape, prep["roi"])
            custom_mask = None
            if name in derived:
                from ..common.buffers import ArrayWithMask
                value = derived[name]
                if isinstance(value, ArrayWithMask):
                    custom_mask = value.mask
                    value = value.arr
                data = asarray_safe(value)
                if (
                    decl.kind == "nav"
                    and prep["roi"] is not None
                    and data.shape == tuple(meta.dataset_shape.nav)
                    + decl.extra_shape
                ):
                    # get_results may hand back a FULL-nav-shaped
                    # array (self-embedded roi result, reference
                    # test_get_results_nav_with_roi_full_shape):
                    # keep it verbatim as .data, store the
                    # roi-compressed rows as .raw_data
                    flat = data.reshape(
                        (meta.dataset_shape.nav.size,)
                        + decl.extra_shape
                    )
                    roi_flat = np.asarray(
                        prep["roi"], dtype=bool
                    ).reshape(-1)
                    out.set_result(
                        flat[roi_flat],
                        valid_nav_mask=damage_host,
                        custom_mask=custom_mask,
                        full_data=data,
                    )
                    buffers[name] = out
                    continue
            elif decl.use == "result_only":
                continue  # not produced
            else:
                data = raw[name]
                if data is not None and np.asarray(
                    data
                ).dtype != np.dtype(decl.dtype):
                    # the device computes 64-bit declarations in
                    # 32-bit (TPU f64 is emulated; jax x64 is off) —
                    # the RESULT honors the declared dtype, like the
                    # reference's f64 buffers
                    # (test_multi_mask_autodtype_wide)
                    data = np.asarray(data).astype(decl.dtype)
            out.set_result(
                data, valid_nav_mask=damage_host,
                custom_mask=custom_mask,
            )
            buffers[name] = out
        return buffers


class UDFPartRunner:
    """Compat worker-protocol runner: execute UDFs over ONE partition
    on the host CPU, mirroring the reference's per-tile dispatch loop
    (reference udf/base.py:2094 UDFPartRunner).  The TPU engine never
    routes through this — it exists for user code and tests that
    drive the reference's worker protocol directly
    (``UDFParams.from_udfs`` + ``run_for_partition``).

    Corrections are applied only for whole-sig tiling schemes; a
    sig-split scheme with active corrections raises (the main engine
    fuses corrections into the device step instead — use
    ``Context.run_udf``).
    """

    def __init__(self, udfs: Sequence[UDF], debug: bool = False):
        self._udfs = list(udfs)
        self._debug = debug

    def run_for_partition(self, partition, params, env,
                          backend_choice=None):
        import pickle

        roi = params.get("roi")
        corrections = params.get("corrections")
        scheme = params.get("tiling_scheme")
        ds_shape = partition.meta.shape
        sig = ds_shape.sig
        if scheme is None:
            scheme = TilingScheme.make_for_shape(
                Shape(
                    (max(1, min(32, partition.num_frames)),)
                    + tuple(sig),
                    sig_dims=sig.dims,
                ),
                ds_shape,
            )
        if self._debug:
            # disjoint-cache-key / pickle-safety check (reference
            # debug=True semantics)
            for udf in self._udfs:
                pickle.loads(pickle.dumps(udf._kwargs))
        have_corr = (
            corrections is not None and corrections.have_corrections()
        )
        if have_corr and len(scheme) > 1:
            raise NotImplementedError(
                "UDFPartRunner applies corrections only for whole-sig "
                "tiling schemes; use Context.run_udf for the fused "
                "corrections path"
            )
        input_dtype = _get_input_dtype(
            self._udfs, partition.meta.native_dtype
        )
        if have_corr and np.dtype(input_dtype).kind not in "fc":
            input_dtype = np.dtype(np.float32)
        pslice = partition.slice
        if roi is not None:
            pslice = pslice.adjust_for_roi(
                np.asarray(roi).reshape(-1)
            )
        methods = []
        for udf in self._udfs:
            method = udf.get_method()
            if method not in tuple(UDFMethod):
                raise UDFException(
                    f"{type(udf).__name__}.get_method() returned "
                    f"unrecognized method {method!r}"
                )
            method = UDFMethod(method).value
            if not hasattr(udf, f"process_{method}"):
                raise UDFException(
                    f"{type(udf).__name__}.get_method() chose "
                    f"{method!r} but process_{method} is not "
                    f"implemented"
                )
            methods.append(method)
            meta = UDFMeta(
                dataset_shape=ds_shape,
                dataset_dtype=partition.meta.native_dtype,
                input_dtype=input_dtype,
                roi=roi,
                tiling_scheme=scheme,
                device_class="cpu",
                corrections=corrections,
                threads_per_worker=getattr(
                    env, "threads_per_worker", 1
                ) or 1,
                partition_slice=pslice,
                array_backend="numpy",
            )
            udf.set_backend("numpy")
            udf.set_meta(meta)
            udf.init_result_buffers()
            udf.allocate_for_part(partition, roi)
            udf.init_task_data()
            udf._host_mode = True
            if hasattr(udf, "preprocess"):
                udf.preprocess()
        goff0 = partition.roi_offset(roi)
        try:
            for udf, method in zip(self._udfs, methods):
                if method == "partition":
                    # whole selected partition in one call
                    ids = partition.local_frame_ids(roi)
                    data = partition._read_selected_with_offset(
                        ids
                    ).astype(input_dtype, copy=False)
                    if have_corr:
                        data = corrections.apply_numpy(data).astype(
                            input_dtype, copy=False
                        )
                    udf.meta._slice = pslice
                    udf.meta.sig_slice = scheme[0]
                    udf.process_partition(data)
                    continue
                for tile in partition.get_tiles(
                    scheme, roi=roi, dest_dtype=input_dtype
                ):
                    data = tile.data
                    if have_corr:
                        data = corrections.apply_numpy(data).astype(
                            input_dtype, copy=False
                        )
                    sig_slice = scheme[tile.scheme_idx]
                    whole_sig = tuple(sig_slice.shape) == tuple(sig)
                    udf.set_slice(tile.tile_slice)
                    udf.set_tile_idx(tile.scheme_idx)
                    udf.meta.sig_slice = sig_slice
                    r0 = tile.tile_slice.origin[0] - goff0
                    n = tile.tile_slice.shape[0]
                    full = udf.results
                    views = {}
                    sig_wb = []
                    for name, decl in udf._part_decls.items():
                        arr = full._get(name)
                        if decl.use == "result_only":
                            views[name] = None
                        elif decl.kind == "nav":
                            views[name] = arr[r0:r0 + n]
                        elif decl.kind == "sig" and not whole_sig:
                            idx = sig_slice.get() + tuple(
                                slice(None)
                                for _ in decl.extra_shape
                            )
                            cont = np.ascontiguousarray(arr[idx])
                            views[name] = cont
                            sig_wb.append((arr, idx, cont))
                        else:
                            views[name] = arr
                    udf.results = UDFData(views)
                    try:
                        if method == "tile":
                            udf.process_tile(data)
                        else:  # frame
                            if not whole_sig:
                                raise UDFException(
                                    "process_frame needs whole "
                                    "frames but the tiling scheme "
                                    "splits the signal dimensions"
                                )
                            for i in range(n):
                                frame_views = {
                                    k: (
                                        v[i:i + 1]
                                        if udf._part_decls[k].kind
                                        == "nav" and v is not None
                                        else v
                                    )
                                    for k, v in views.items()
                                }
                                udf.results = UDFData(frame_views)
                                udf.meta._slice = Slice(
                                    origin=(
                                        tile.tile_slice.origin[0]
                                        + i,
                                    )
                                    + tile.tile_slice.origin[1:],
                                    shape=Shape(
                                        (1,)
                                        + tuple(
                                            tile.tile_slice.shape
                                        )[1:],
                                        sig_dims=sig.dims,
                                    ),
                                )
                                udf.process_frame(data[i])
                    finally:
                        for arr, idx, cont in sig_wb:
                            arr[idx] = cont
                        udf.results = full
        finally:
            for udf in self._udfs:
                if hasattr(udf, "postprocess"):
                    try:
                        udf.postprocess()
                    finally:
                        pass
                udf._host_mode = False
                if udf.meta is not None:
                    udf.meta._slice = None
        return tuple(udf.results for udf in self._udfs)
