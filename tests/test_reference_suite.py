"""Run the REFERENCE's own test files against this implementation
through the drop-in ``libertem`` namespace — the strongest parity
gate available: the oracle is the reference's committed expectations,
not anything written here.

Files are copied into a tmp dir so the reference's dask-importing
conftest never loads; minimal shims stand in for its test utilities
(_mk_random mirrors the reference's DISCRETE value distribution — the
tight f32 allclose expectations depend on exactly-representable sums)
and the not-installed ``sparseconverter`` package (numpy backend
only).

GATE AUDIT (round 5): 86 files below + 14 in
tests/test_reference_server_suite.py = 100 of the reference's 138
test files run verbatim.  The 38 files outside, by category —
re-audited this round, every one accounted for:

* needs dask/distributed (not installed) or a live cluster —
  executor/test_{concurrent,dask,dask_inplace_wrapper,delayed,
  device_classes,functional,pipelined}.py (the executor zoo is
  deliberately collapsed, executor/compat.py), io/test_dask_array.py,
  io/datasets/test_dask_ds.py, test_ipython.py (@dist),
  template/*.py (13 files — all @slow even in the reference's CI,
  need nbconvert kernels + a tcp dask cluster; the same 15 notebook
  templates EXECUTE in a real kernel in tests/test_notebook_exec.py)
* ALL cells need real detector test data — io/datasets/
  test_{blo,dm,empad,mrc,ser}.py carry a module-level ``pytestmark
  skipif``, so a run without the testdata checkout is 100% skips
  (vacuous — deliberately NOT counted); test_dm_single.py needs
  ncempy (absent) even for its synthetic cells.  The per-test
  @needsdata files (mib/seq/frms6/k2is/tvips/backend) ARE in the
  gate below — their data-free cells run for real.  The formats
  themselves are implemented and covered by synthetic-file tests
  (tests/test_formats*.py, tests/test_matrix.py) and reference-
  golden decode parity (tests/test_parity_formats.py)
* reference-internal machinery this engine deliberately redesigned
  (gen_blocks read planner / XLA backend dispatch;
  docs/migration.md) — udf/test_by_tile.py,
  udf/test_execution_plan.py, io/test_tiling_negotiation.py,
  io/test_many_files.py (drives RawFileSet/FileTree file-table
  machinery with 2^15 synthetic files), io/datasets/
  test_mib_decoders_quad.py (quad decode itself covered by
  tests/test_mib.py::test_mib_r6_quad)
* not applicable on this target — common/test_numba.py (numba
  caching internals; no numba here), test_win_tweaks.py (Windows),
  io/test_read_ranges.py (EMPTY file in the reference — zero tests)
* inverted expectation — udf/test_holography.py asserts that
  importing libertem.udf.holography RAISES ('implementation is
  removed'); this repo SHIPS a working holography UDF
  (tests/test_holography.py), so the reference's test is
  intentionally failed
"""
import os
import shutil
import subprocess
import sys

import pytest

REF_TESTS = "/root/reference/tests"

# (reference file, -k selection or None).  udf/test_sum.py and
# udf/test_sumsig.py hold ONLY the pairwise-tolerance test and are
# therefore left out entirely; test_auto's same-category case is
# filtered with -k.
CASES = [
    ("common/test_shape.py", None),
    ("common/test_slice.py", None),
    ("test_masks.py", None),
    ("udf/test_auto.py", None),
    ("udf/test_logsum.py", None),
    ("udf/test_com.py", None),
    ("udf/test_aux_data.py", None),
    ("udf/test_crystallinity.py", None),
    ("udf/test_FEM.py", None),
    ("udf/test_pick.py", None),
    ("udf/test_sum.py", None),
    ("udf/test_sumsig.py", None),
    # fuzz is @slow in the reference too (100 x 512x512 runs)
    ("udf/test_stddev.py", "not fuzz"),
    ("analysis/test_analysis_com.py", None),
    ("analysis/test_analysis_sum.py", None),
    ("analysis/test_analysis_raw.py", None),
    ("analysis/test_analysis_disk.py", None),
    ("analysis/test_analysis_sd.py", None),
    # udf/test_by_tile.py is left out entirely: all four of its
    # tests assert reference-internal tiling mechanics (exact
    # tileshape pass-through, MemPartition internals, meta.slice) —
    # deliberate deviations, docs/migration.md
    ("udf/test_by_partition.py", None),
    # test_symmetries included: f64-built modulator masks + the c128
    # host accumulation for f64 datasets cancel symmetric disks
    # exactly (analysis/radialfourier.py radial_fourier_masks)
    ("analysis/test_analysis_radialfourier.py", None),
    ("analysis/test_analysis_clust.py", None),
    ("analysis/test_analysis_shapes.py", None),
    ("analysis/test_analysis_rawfft.py", None),
    ("analysis/test_analysis_sumsig.py", None),
    ("analysis/test_analysis_sumfft.py", None),
    ("analysis/test_analysis_base.py", None),
    ("udf/test_multi_udf.py", None),
    ("udf/test_meta.py", None),
    # the three excluded tests assert reference-internal TILE DEPTH
    # pass-through at specific origins (same deviation as
    # udf/test_by_tile.py, docs/migration.md); partition/frame/roi
    # coordinate semantics are covered by the kept tests
    ("udf/test_coords.py",
     "not test_tiles_no_offset and not test_tiles_positive_offset "
     "and not test_tiles_negative_offset"),
    ("common/test_math.py", None),
    ("corrections/test_coordinates.py", None),
    ("corrections/test_corrset.py", None),
    ("corrections/test_detector.py", None),
    ("common/test_mask_container.py", None),
    ("common/test_scheduler.py", None),
    # test_buffer_slices drives a sabotaged reference-internal
    # MemPartition.get_tiles through the reference UDF runner's slice
    # validation (FileSet/decoder/force_need_decode internals) — this
    # engine consumes gen_blocks, not get_tiles; the corruption it
    # checks for cannot occur here (same class as udf/test_by_tile.py,
    # docs/migration.md)
    ("common/test_bufferwrapper.py", "not test_buffer_slices"),
    ("io/test_roi.py", None),
    ("common/test_snooze.py", None),
    # the four @slow tests need executor fixtures this repo does not
    # model (dask_executor, concurrent_ctx, pipelined make_with) or
    # per-task UDF clone cadence on the inline loop (GoSlowSumUDF
    # counts tiles across partitions here, once per partition there)
    ("common/test_progress.py", "not slow"),
    ("udf/test_udf_runner.py", None),
    ("udf/test_valid_mask.py", None),
    ("udf/test_buffer_declarations.py", None),
    # test_validation_skips subclasses the reference's RawPartition
    # with a get_tiles override and a fileset/slice-tuple constructor
    # protocol this engine's partitions do not share (gen_blocks
    # engine, docs/migration.md — same class as udf/test_by_tile.py)
    ("udf/test_simple_udf.py", "not test_validation_skips"),
    ("test_context.py", None),
    # the two excluded tests assert that masks are NOT computed on
    # the "client" process (reference MaskContainer._computed_masks
    # laziness across a dask cluster's process boundary) — this
    # engine is a single-controller design: the controller IS the
    # worker, and it must evaluate the factories to build the device
    # operands.  No process boundary exists to keep them lazy across.
    ("analysis/test_analysis_masks.py",
     "not test_avoid_calculating_masks_on_client"),
    # test_on_cuda skips (no CUDA in this env, same as the
    # reference's CUDA-less CI)
    ("io/test_sparse.py", None),
    ("io/test_write_handle.py", None),
    ("io/test_writing.py", None),
    ("io/test_decode_swap.py", None),
    ("io/test_detect.py", None),
    ("utils/test_async_utils.py", None),
    # cupy/cuda cells skip (no CUDA in this env)
    ("utils/test_devices.py", None),
    ("executor/test_executor_base.py", None),
    # the dask cell needs a live dask cluster's worker-memory
    # accounting (ctx.executor.client) — no dask cluster exists in
    # the single-controller design; the inline cell runs verbatim
    ("udf/test_memleak.py", "not dask"),
    ("viz/test_viz_base.py", None),
    ("viz/test_mpl.py", None),
    # all three bqp tests importorskip("bqplot") — absent here, same
    # as the reference's widget-less CI
    ("viz/test_bqp.py", None),
    ("viz/test_gms.py", None),
    ("io/datasets/test_mem.py", None),
    ("io/datasets/test_mib_decoders.py", None),
    # test_mib_decoders_quad.py is left out entirely: it drives the
    # reference's internal MMapBackendImpl/MIBFileSet/
    # mib_2x2_get_read_ranges read-range machinery directly — this
    # engine's read planner is gen_blocks (no FileSet/read_ranges
    # exist; same deviation class as udf/test_by_tile.py,
    # docs/migration.md).  Quad RAW decode correctness itself is
    # covered by tests/test_mib.py::test_mib_r6_quad against an
    # independent layout oracle.
    ("io/datasets/test_k2is_uint12.py", None),
    ("test_smoke.py", None),
    ("test_utils.py", None),
    ("test_fs.py", None),
    ("test_fileowner.py", None),
    ("io/test_io_utils.py", None),
    ("io/test_tiling_scheme.py", None),
    ("io/test_convert_transposed.py", None),
    ("executor/test_inline.py", None),
    ("io/datasets/test_helpers.py", None),
    ("io/datasets/test_missing.py", None),
    ("io/datasets/test_npy.py", None),
    # the two @dist tests need a live multi-node cluster fixture
    # (raw_on_workers/dist_ctx) — absent in the reference's own
    # single-node CI as well
    ("io/datasets/test_raw.py",
     "not test_raw_on_workers and not test_sum_on_dist"),
    ("io/datasets/test_hdf5.py", None),
    ("io/test_base.py", None),
    ("io/test_io_fs.py", None),
    ("executor/test_delayed_unpack.py", None),
    ("udf/test_get_resources.py", None),
    ("udf/test_resources_for_backends.py", None),
    # test_reshape_sync_offset is @slow in the reference too (360
    # parametrized cells x 2 UDF runs); its single-format semantics
    # are covered by the kept sync-offset tests here and in
    # test_raw/test_npy/test_mem.  test_exception_at_detect needs the
    # dask_executor fixture (no dask cluster in this design).
    ("io/datasets/test_raw_csr.py",
     "not test_reshape_sync_offset and not test_exception_at_detect"),
    # TESTDATA-gated format files whose data-free cells run for
    # real (the reference's own @needsdata marks skip the rest —
    # same as its CI without the testdata checkout): glob/sibling
    # discovery, XML bad-pixel-map machinery (seq), row-mapping +
    # tile decode oracles (frms6), bad-params validation
    ("io/datasets/test_mib.py", None),
    ("io/datasets/test_seq.py", None),
    ("io/datasets/test_frms6.py", None),
    ("io/datasets/test_k2is.py", None),
    ("io/datasets/test_tvips.py", None),
    # test_backend_selection asserts the reference's DEFAULT backend
    # choice (mmap) — this framework deliberately defaults to
    # buffered preads (docs/performance.md "pread beats mmap on
    # virtualized hosts"); the other three cells run verbatim,
    # including the FakeBackend must-raise contract
    ("io/datasets/test_backend.py", "not test_backend_selection"),
]

_UTILS_SHIM = '''"""Minimal stand-in for the reference tests' utils module —
_mk_random mirrors the reference's DISCRETE value distribution
(tests/utils.py:50: {0,1} resp. complex choices + two salted hot
pixels), which several tolerance expectations depend on."""
from contextlib import contextmanager

import numpy as np


def assert_msg(msg, msg_type, status="ok"):
    # mirror of reference tests/utils.py:89
    assert msg["status"] == status
    assert msg["messageType"] == msg_type, (
        "expected: {}, is: {}".format(msg_type, msg["messageType"])
    )


def _mk_random(size, dtype="float32", array_backend=None,
               sparse_density=None):
    size = tuple(size)
    dtype = np.dtype(dtype)
    if dtype.kind == "c":
        choice = [0, 1, -1, 0 + 1j, 0 - 1j, 2.3 + 17j, -23 + 42j]
    else:
        choice = [0, 1]
    data = np.random.choice(choice, size=size).astype(dtype)
    for scale in (sum(size), 10 * sum(size)):
        coords = tuple(np.random.choice(range(c)) for c in size)
        data[coords] = np.random.choice(choice) * scale
    if array_backend in ("sparse.COO", "sparse.GCXS", "sparse.DOK"):
        import sparse as _sparse
        cls = getattr(_sparse, array_backend.split(".", 1)[1])
        return cls.from_numpy(data)
    return data


@contextmanager
def set_device_class(device_class):
    # mirror of reference tests/utils.py:392 — cupy/cuda cells skip
    # on a host without CUDA
    if device_class in ("cupy", "cuda"):
        import pytest
        pytest.skip(
            f"No CUDA device, skipping test with device class "
            f"{device_class}."
        )
    yield


def get_testdata_path():
    import os
    # mirror of reference tests/utils.py:352 — no test data ships in
    # this environment; data-gated tests skip on the missing path
    return os.environ.get(
        'TESTDATA_BASE_PATH', '/nonexistent/testdata'
    )


def roi_as_sparse(roi):
    # mirror of reference tests/utils.py:385 (the gate's sparse shim
    # stands in for the sparse package)
    import sparse
    if roi is None:
        return roi
    return sparse.COO.from_numpy(roi)


def dataset_correction_verification(ds, roi, lt_ctx, exclude=None):
    """Mirror of reference tests/utils.py:259: corrected PickUDF
    result must equal the standalone correct() oracle."""
    import sparse
    from libertem.corrections import CorrectionSet
    from libertem.corrections.detector import correct
    from libertem.udf.raw import PickUDF

    sig = tuple(ds.shape.sig)
    shape = (-1, *sig)
    data = lt_ctx.run_udf(
        udf=PickUDF(), dataset=ds, roi=roi,
        corrections=CorrectionSet(),
    )
    gain = np.random.random(sig) + 1
    dark = np.random.random(sig) - 0.5
    if exclude is None:
        exclude = [
            (np.random.randint(0, s), np.random.randint(0, s))
            for s in sig
        ]
    exclude_coo = sparse.COO(
        coords=np.array(exclude), data=True, shape=sig
    )
    corrset = CorrectionSet(
        dark=dark, gain=gain, excluded_pixels=exclude_coo
    )
    pick_res = lt_ctx.run_udf(
        udf=PickUDF(), dataset=ds, corrections=corrset, roi=roi
    )
    corrected = correct(
        buffer=data['intensity'].raw_data.reshape(shape),
        dark_image=dark,
        gain_map=gain,
        excluded_pixels=exclude,
        inplace=False,
    )
    assert np.allclose(
        pick_res['intensity'].raw_data.reshape(shape), corrected
    )


class MockFile:
    # mirror of reference tests/utils.py:110
    def __init__(self, start_idx, end_idx):
        self.start_idx = start_idx
        self.end_idx = end_idx

    def __repr__(self):
        return "<MockFile: [%d, %d)>" % (self.start_idx, self.end_idx)


class _SeenList(list):
    pass


def _make_validation_udf():
    from libertem.udf.base import UDF

    class ValidationUDF(UDF):
        """Compares every tile fed to process_tile against a
        flat-nav reference array and verifies complete sig coverage
        of every frame at result time (mirror of the reference
        tests/utils.py:167 contract, written against this engine's
        UDF API)."""

        def __init__(self, reference,
                     preferred_dtype=UDF.USE_NATIVE_DTYPE,
                     validation_function=None):
            if validation_function is None:
                validation_function = np.allclose
            super().__init__(
                reference=reference,
                preferred_dtype=preferred_dtype,
                validation_function=validation_function,
            )

        def get_backends(self):
            return ("numpy",)

        def get_preferred_input_dtype(self):
            return self.params.preferred_dtype

        def get_result_buffers(self):
            return {"seen": self.buffer(kind="nav", dtype=object)}

        def preprocess(self):
            self.results.seen[:] = [
                _SeenList() for _ in range(self.results.seen.size)
            ]

        def process_tile(self, tile):
            sig_o = self.meta.slice.origin[1:]
            sig_s = self.meta.slice.shape[1:]
            frame_slices = tuple(
                slice(o, o + s) for o, s in zip(sig_o, sig_s)
            )
            for i in range(self.results.seen.size):
                self.results.seen[i].append(frame_slices)
            assert self.params.validation_function(
                self.meta.slice.get(self.params.reference), tile
            )

        def merge(self, dest, src):
            for i in range(dest.seen.size):
                dest.seen[i].extend(src.seen[i])

        def _do_get_results(self):
            results = super()._do_get_results()
            roi = self.meta.roi
            if roi is not None:
                roi = roi.reshape((-1,))
            sig_shape = tuple(self.meta.dataset_shape.sig)
            frame_mask = np.zeros(sig_shape, dtype=bool)
            flat_idx = -1
            for flat_idx, slices in enumerate(
                results["seen"].data.ravel()
            ):
                frame_mask[:] = False
                if slices is None:
                    assert roi is not None and not roi[flat_idx]
                    continue
                if roi is not None:
                    assert roi[flat_idx]
                for sl in slices:
                    frame_mask[sl] = True
                assert frame_mask.all()
            assert (
                flat_idx + 1
            ) == self.meta.dataset_shape.nav.size
            return results

    return ValidationUDF


def _make_pixelsum_udf():
    from libertem.udf import UDF

    class PixelsumUDF(UDF):
        # mirror of reference tests/utils.py:96
        def get_result_buffers(self):
            return {
                'pixelsum': self.buffer(kind="nav", dtype="float32"),
            }

        def process_frame(self, frame):
            assert frame.shape == (16, 16)
            assert self.results.pixelsum.shape == (1,)
            self.results.pixelsum[:] = np.sum(frame)

    return PixelsumUDF


_fake_backend_cls = None


def _make_fake_backend():
    # mirror of reference tests/utils.py:369 — an io_backend that
    # cannot read; a run requesting it must raise RuntimeError
    # (registered once: IOBackend registry keys are global)
    global _fake_backend_cls
    if _fake_backend_cls is None:
        from libertem.io.dataset.base import IOBackend

        class FakeBackend(IOBackend, id_="fake"):
            def get_impl(self):
                raise RuntimeError("nothing to see here")

        _fake_backend_cls = FakeBackend
    return _fake_backend_cls


def __getattr__(name):
    # lazy: building the UDF classes imports libertem, which several
    # consumers of this shim must be able to import first
    if name == "ValidationUDF":
        return _make_validation_udf()
    if name == "PixelsumUDF":
        return _make_pixelsum_udf()
    if name == "FakeBackend":
        return _make_fake_backend()
    raise AttributeError(name)


def _naive_mask_apply(masks, data):
    """Brute-force mask application oracle (same contract as the
    reference tests/utils.py:25): densify each mask, accumulate in
    the result_type of all operands."""
    from libertem.common.sparse import to_dense

    if hasattr(masks, "todense") or hasattr(masks, "toarray"):
        masks = to_dense(masks)  # sparse (n, h, w) stack
    data = np.asarray(data)
    assert len(data.shape) == 4
    dtype = np.result_type(*(m.dtype for m in masks), data.dtype)
    res = np.zeros((len(masks),) + tuple(data.shape[:2]), dtype=dtype)
    for n in range(len(masks)):
        mask = to_dense(masks[n])
        assert mask.shape == data.shape[2:]
        for i in range(data.shape[0]):
            for j in range(data.shape[1]):
                res[n, i, j] = data[i, j].ravel().dot(mask.ravel())
    return res
'''

_SPARSECONVERTER_SHIM = '''\
"""Minimal stand-in for sparseconverter (not installed): only the
numpy backend exists, so parametrized tests run their numpy cells."""
import numpy as np

NUMPY = "numpy"
CUPY = "cupy"
SPARSE_COO = "sparse.COO"
SPARSE_GCXS = "sparse.GCXS"
BACKENDS = (NUMPY,)
ND_BACKENDS = (NUMPY,)
DENSE_BACKENDS = (NUMPY,)
SPARSE_BACKENDS = ()
CPU_BACKENDS = (NUMPY,)
CUPY_SCIPY_CSC = "cupyx.scipy.sparse.csc_matrix"
CUPY_SCIPY_CSR = "cupyx.scipy.sparse.csr_matrix"
CUPY_SCIPY_COO = "cupyx.scipy.sparse.coo_matrix"
SCIPY_CSC = "scipy.sparse.csc_matrix"
SCIPY_CSR = "scipy.sparse.csr_matrix"
SCIPY_COO = "scipy.sparse.coo_matrix"
SPARSE_DOK = "sparse.DOK"
CUDA = "cuda"
CUDA_BACKENDS = ()
CUPY_BACKENDS = ()
D2_BACKENDS = (NUMPY,)
ArrayBackend = str


def for_backend(arr, backend=NUMPY):
    if str(backend).startswith("scipy.sparse."):
        import scipy.sparse as sp
        ctor = getattr(sp, str(backend).rsplit(".", 1)[1])
        if sp.issparse(arr):
            return ctor(arr)
        dense = np.asarray(arr)
        return ctor(dense.reshape(dense.shape[0], -1))
    if backend != NUMPY:
        raise RuntimeError(f"backend {backend} not available")
    if hasattr(arr, "toarray"):  # scipy.sparse
        return np.asarray(arr.toarray())
    if hasattr(arr, "todense"):  # pydata sparse (shim)
        return np.asarray(arr.todense())
    return np.asarray(arr)


def get_backend(arr):
    try:
        import scipy.sparse as _sp
        if _sp.issparse(arr):
            return f"scipy.sparse.{type(arr).__name__}"
    except ImportError:
        pass
    try:
        import sparse as _sparse
        if isinstance(arr, _sparse.GCXS):
            return SPARSE_GCXS
        if isinstance(arr, _sparse.DOK):
            return SPARSE_DOK
        if isinstance(arr, _sparse.COO):
            return SPARSE_COO
    except ImportError:
        pass
    return NUMPY


def get_device_class(backend):
    if backend in (CUPY, CUDA) or str(backend).startswith("cupyx"):
        return "cuda"
    return "cpu"
'''

_NUMBA_SHIM = '''\
"""Minimal numba stand-in (not installed): njit is identity, so the
reference's jitted helpers run as plain Python."""


def njit(*args, **kwargs):
    if args and callable(args[0]):
        return args[0]

    def deco(f):
        return f

    return deco


prange = range
'''

_SPARSE_SHIM = '''\
"""Minimal sparse.pydata stand-in (not installed): a COO carrying
coords/data/fill_value/shape with just enough arithmetic for the
reference's count_nonzero and mask-correction tests — refuses LARGE
densification so huge shapes exercise the no-densify code path."""
import numpy as np


class SparseArray:
    pass


class COO(SparseArray):
    @classmethod
    def from_numpy(cls, arr):
        return cls(np.asarray(arr))

    def __init__(self, coords, data=None, shape=None, fill_value=0):
        if data is None and shape is None:
            # from a dense array
            dense = np.asarray(coords)
            self.coords = np.argwhere(dense).T
            self.data = dense[dense != 0]
            self.shape = dense.shape
            self.fill_value = fill_value
            return
        self.coords = np.asarray(coords)
        n = self.coords.shape[1] if self.coords.ndim == 2 else 0
        self.data = np.broadcast_to(
            np.asarray(data), (n,)
        ).copy() if np.ndim(data) == 0 else np.asarray(data)
        self.shape = tuple(int(s) for s in shape)
        self.fill_value = fill_value

    @property
    def size(self):
        size = 1
        for s in self.shape:
            size *= s
        return size

    @property
    def ndim(self):
        return len(self.shape)

    @property
    def nnz(self):
        return int(self.data.size)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def T(self):
        return COO(self.coords[::-1], self.data,
                   shape=self.shape[::-1],
                   fill_value=self.fill_value)

    def __array__(self, *args, **kwargs):
        # guard against accidental huge densifications; 2**25 still
        # admits the reference's full-shape bool rois
        # (test_npy.py test_roi_2: (256, 128, 128) ~ 4.2M)
        if self.size >= 2 ** 25:
            raise TypeError("shim COO refuses huge densification")
        out = np.full(self.shape, self.fill_value,
                      dtype=self.data.dtype)
        out[tuple(self.coords)] = self.data
        return out

    def todense(self):
        return self.__array__()

    def astype(self, dtype):
        dtype = np.dtype(dtype)
        return COO(
            self.coords, self.data.astype(dtype), shape=self.shape,
            fill_value=dtype.type(self.fill_value),
        )

    def __getitem__(self, idx):
        # slicing densifies and re-wraps (fine for the small masks
        # the reference tests slice)
        return COO(self.todense()[idx])

    def reshape(self, shape):
        if isinstance(shape, int):
            shape = (shape,)
        shape = list(shape)
        known = 1
        for s in shape:
            if s != -1:
                known *= s
        shape = tuple(self.size // known if s == -1 else s
                      for s in shape)
        flat = np.ravel_multi_index(tuple(self.coords), self.shape)
        return COO(np.stack(np.unravel_index(flat, shape)),
                   self.data, shape=shape,
                   fill_value=self.fill_value)

    def sum(self, axis=None, dtype=None, out=None):
        if axis is None and self.size >= 2 ** 22:
            # huge arrays: sparse math, no densification
            background = (self.size - self.data.size) * int(
                bool(self.fill_value)
            )
            return int(self.data.sum()) + background
        return self.todense().sum(axis=axis, dtype=dtype, out=out)


def dot(a, b):
    return np.dot(np.asarray(a), np.asarray(b))


def zeros(shape, dtype=float):
    shape = (shape,) if isinstance(shape, int) else tuple(shape)
    return COO(np.zeros((len(shape), 0), dtype=np.intp),
               np.zeros((0,), dtype=dtype), shape=shape)


class DOK(COO):
    pass


class GCXS(COO):
    pass
'''

_CONFTEST_SHIM = '''import pytest


@pytest.fixture
def lt_ctx():
    # reference conftest.py:834: inline_threads=2 (tests pin
    # meta.threads_per_worker == 2); debug=True omitted — its
    # pickle round-trips are covered by this repo's own
    # debug-pickle tests without slowing every gate file
    from libertem.api import Context
    from libertem.executor.inline import InlineJobExecutor
    return Context(executor=InlineJobExecutor(inline_threads=2))


@pytest.fixture
def delayed_ctx():
    from libertem.api import Context
    from libertem.executor.delayed import DelayedJobExecutor
    return Context(executor=DelayedJobExecutor())


import numpy as np


@pytest.fixture
def npy_8x8x8x8_ds(npy_8x8x8x8_path, lt_ctx):
    return lt_ctx.load("npy", path=npy_8x8x8x8_path)


@pytest.fixture(scope='session')
def npy_datadir(tmp_path_factory):
    return tmp_path_factory.mktemp('npy_data')


@pytest.fixture(scope='session')
def npy_8x8x8x8_path(npy_datadir):
    from utils import _mk_random
    path = str(npy_datadir / "8x8x8x8.npy")
    np.save(path, _mk_random(size=(8, 8, 8, 8), dtype="float32"))
    return path


@pytest.fixture
def default_npy_filepath(npy_datadir):
    return str(npy_datadir / "test_default.npy")


@pytest.fixture
def default_npy(default_npy_filepath, default_raw_data, lt_ctx):
    from libertem.io.dataset.base import MMapBackend
    np.save(default_npy_filepath, default_raw_data)
    ds = lt_ctx.load(
        "npy", path=default_npy_filepath, sig_dims=2,
        io_backend=MMapBackend(),
    )
    ds.set_num_cores(2)
    return ds


@pytest.fixture
def npy_random_array(npy_datadir):
    path = str(
        npy_datadir / f"array{np.random.randint(0, 100000)}.npy"
    )
    ndim = np.random.randint(1, 6)
    shape = tuple(np.random.randint(1, 10) for _ in range(ndim))
    dtype = np.random.choice(
        [np.float32, np.uint8, np.int64, np.complex128]
    )
    array = np.empty(shape, dtype=dtype)
    np.save(path, array)
    return path, array


@pytest.fixture
def npy_fortran_array(npy_datadir):
    path = str(
        npy_datadir / f"farray{np.random.randint(0, 100000)}.npy"
    )
    array = np.ones((55, 55), order='F')
    np.save(path, array)
    return path, array


@pytest.fixture
def naughty_filename():
    # mirror of reference conftest.py:707 — a filename at the limit
    # of what the platform's filesystem allows, to stress globs and
    # path regexes (Linux/Unix variant; this env is Linux-only)
    return "!\\"\\\\§$&[%)(]=?`´':;,.# ~ * | < ** > \U0001f92a"


@pytest.fixture
def bad_params_logger():
    lines = []
    yield lines
    print("\\n".join(lines))


@pytest.fixture
def standard_bad_ds_params():
    # mirror of reference conftest.py:1120
    return [
        dict(nav_shape=(-1, 2)),
        dict(nav_shape=4),
        dict(sig_shape=(3, 17)),
        dict(sig_shape=(103, -83)),
        dict(sync_offset=180000000),
        dict(io_backend="doesn't exist"),
    ]


@pytest.fixture
def ds_params_tester(lt_ctx, bad_params_logger):
    # mirror of reference conftest.py:1132 (log-only: records
    # whether bad params raise)
    from libertem.io.dataset import get_dataset_cls

    def _test_bad_params(ds_key, *args, **params):
        ds_class = get_dataset_cls(ds_key)
        stub = f"{ds_class.__name__}(..., {params})"
        try:
            lt_ctx.load(ds_key, *args, **params)
        except Exception as e:
            bad_params_logger.append(
                f'{stub} RAISED {type(e).__name__}("{e}")'
            )
            return False
        bad_params_logger.append(f'{stub} DID NOT raise')
        return True
    return _test_bad_params


@pytest.fixture
def ds_complex(lt_ctx):
    from libertem.io.dataset.memory import MemoryDataSet
    data = np.random.choice(
        a=[0, 1, 0 + 1j, 0 - 1j, 1 + 1j, 1 - 1j],
        size=(16, 16, 16, 16),
    ).astype("complex64")
    return MemoryDataSet(data=data, tileshape=(1, 16, 16),
                         num_partitions=2, sig_dims=2)


@pytest.fixture
def ds_random(lt_ctx):
    from libertem.io.dataset.memory import MemoryDataSet
    data = np.random.randn(16, 16, 16, 16).astype("float32")
    return MemoryDataSet(data=data, tileshape=(1, 16, 16),
                         num_partitions=2, sig_dims=2)


def _write_raw_csr(datadir, suffix, orig, dtypes):
    # mirror of reference conftest.py:544 raw_csr_generated
    ipt, idx, dat = dtypes
    names = {
        "indptr": f"indptr{suffix}.raw",
        "indices": f"coords{suffix}.raw",
        "data": f"values{suffix}.raw",
    }
    sidecar = str(datadir / f"sparse{suffix}.toml")
    with open(sidecar, "w") as f:
        f.write(f"""
[params]
filetype = "raw_csr"
nav_shape = [13, 17]
sig_shape = [24, 19]

[raw_csr]
indptr_file = "{names['indptr']}"
indptr_dtype = "{ipt}"

indices_file = "{names['indices']}"
indices_dtype = "{idx}"

data_file = "{names['data']}"
data_dtype = "{dat}"
""")
    orig.indptr.astype(ipt).tofile(str(datadir / names["indptr"]))
    orig.indices.astype(idx).tofile(str(datadir / names["indices"]))
    orig.data.astype(dat).tofile(str(datadir / names["data"]))
    return sidecar


@pytest.fixture(scope='session')
def mock_sparse_data():
    from utils import _mk_random
    from scipy.sparse import csr_matrix
    data = _mk_random((13, 17, 24, 19), dtype="float32")
    data_flat = data.reshape((13 * 17, 24 * 19))
    return csr_matrix(data_flat), data_flat


@pytest.fixture(scope='session')
def raw_csr_generated(mock_sparse_data, tmp_path_factory):
    from libertem.api import Context
    from libertem.executor.inline import InlineJobExecutor
    orig, _ = mock_sparse_data
    datadir = tmp_path_factory.mktemp('raw_csr')
    sidecar = _write_raw_csr(
        datadir, "", orig,
        (str(orig.indptr.dtype), str(orig.indices.dtype),
         str(orig.data.dtype)),
    )
    ctx = Context(executor=InlineJobExecutor())
    return ctx.load("raw_csr", path=sidecar)


@pytest.fixture(scope='session')
def raw_csr_generated_bigendian(mock_sparse_data, tmp_path_factory):
    from libertem.api import Context
    from libertem.executor.inline import InlineJobExecutor
    orig, _ = mock_sparse_data
    datadir = tmp_path_factory.mktemp('raw_csr_be')
    sidecar = _write_raw_csr(
        datadir, "_bigendian", orig, (">i4", ">i4", ">i4"),
    )
    ctx = Context(executor=InlineJobExecutor())
    return ctx.load("raw_csr", path=sidecar)


@pytest.fixture(scope='session')
def raw_csr_generated_uint64(mock_sparse_data, tmp_path_factory):
    from libertem.api import Context
    from libertem.executor.inline import InlineJobExecutor
    orig, _ = mock_sparse_data
    datadir = tmp_path_factory.mktemp('raw_csr_u64')
    sidecar = _write_raw_csr(
        datadir, "_uint64", orig, ("<u8", "<u8", "<u8"),
    )
    ctx = Context(executor=InlineJobExecutor())
    return ctx.load("raw_csr", path=sidecar)


@pytest.fixture(scope='session')
def uint16_raw(tmp_path_factory):
    from utils import _mk_random
    from libertem.io.dataset.raw import RawFileDataSet
    from libertem.executor.inline import InlineJobExecutor
    path = str(tmp_path_factory.mktemp('data') / 'raw-u16')
    _mk_random(size=(16, 16, 128, 128), dtype='uint16').tofile(path)
    return RawFileDataSet(
        path=path, nav_shape=(16, 16), dtype="uint16",
        sig_shape=(128, 128),
    ).initialize(InlineJobExecutor())


@pytest.fixture(scope='session')
def big_endian_raw(tmp_path_factory):
    from utils import _mk_random
    from libertem.io.dataset.raw import RawFileDataSet
    from libertem.executor.inline import InlineJobExecutor
    path = str(tmp_path_factory.mktemp('data') / 'raw-be')
    _mk_random(size=(16, 16, 128, 128), dtype='>u2').tofile(path)
    ds = RawFileDataSet(
        path=path, nav_shape=(16, 16), dtype=">u2",
        sig_shape=(128, 128),
    )
    ds.set_num_cores(2)
    return ds.initialize(InlineJobExecutor())


@pytest.fixture(scope='session')
def buffered_raw(default_raw_file):
    from libertem.api import Context
    from libertem.executor.inline import InlineJobExecutor
    from libertem.io.dataset.base import BufferedBackend
    ctx = Context(executor=InlineJobExecutor())
    return ctx.load(
        "raw", path=str(default_raw_file), dtype="float32",
        nav_shape=(16, 16), sig_shape=(128, 128),
        io_backend=BufferedBackend(),
    )


@pytest.fixture(scope='session')
def direct_raw(default_raw_file):
    from libertem.api import Context
    from libertem.executor.inline import InlineJobExecutor
    from libertem.io.dataset.base import DirectBackend
    ctx = Context(executor=InlineJobExecutor())
    return ctx.load(
        "raw", path=str(default_raw_file), dtype="float32",
        nav_shape=(16, 16), sig_shape=(128, 128),
        io_backend=DirectBackend(),
    )


@pytest.fixture
def points():
    # mirror of reference conftest.py:1107
    return np.array([
        (0, 0), (0, 1), (1, 0), (1, 1), (0, -1), (-1, 0), (-1, -1),
    ])


@pytest.fixture(scope='session')
def prime_raw_data():
    # mirror of reference conftest.py:279 — prime-sized axes so no
    # reshape can accidentally agree
    from utils import _mk_random
    return _mk_random(size=(13, 17, 19, 23), dtype='float32')


class _H5File:
    def __init__(self, filename):
        self.filename = filename


def _h5_session_file(tmp_path_factory, name, data):
    # mirror of reference conftest.py:67 get_or_create_hdf5
    import h5py
    path = str(tmp_path_factory.mktemp('h5data') / name)
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=data)
    with h5py.File(path, "r") as f:
        yield f


@pytest.fixture(scope='session')
def hdf5(tmp_path_factory):
    yield from _h5_session_file(
        tmp_path_factory, "hdf5-test.h5", np.ones((5, 5, 16, 16))
    )


@pytest.fixture(scope='session')
def hdf5_2d(tmp_path_factory):
    yield from _h5_session_file(
        tmp_path_factory, "hdf5-test-2d.h5", np.ones((16, 16))
    )


@pytest.fixture(scope='session')
def hdf5_3d(tmp_path_factory):
    yield from _h5_session_file(
        tmp_path_factory, "hdf5-test-3d.h5", np.ones((17, 16, 16))
    )


@pytest.fixture(scope='session')
def hdf5_5d(tmp_path_factory):
    yield from _h5_session_file(
        tmp_path_factory, "hdf5-test-5d.h5",
        np.ones((3, 5, 9, 16, 16)),
    )


@pytest.fixture(scope='session')
def random_hdf5(tmp_path_factory):
    yield from _h5_session_file(
        tmp_path_factory, "hdf5-test-random.h5",
        np.random.randn(5, 5, 16, 16),
    )


def _h5_ds(h5file):
    from libertem.io.dataset.hdf5 import H5DataSet
    from libertem.executor.inline import InlineJobExecutor
    return H5DataSet(
        path=h5file.filename, ds_path="data",
    ).initialize(InlineJobExecutor())


@pytest.fixture
def hdf5_ds_2(random_hdf5):
    return _h5_ds(random_hdf5)


@pytest.fixture
def hdf5_ds_2d(hdf5_2d):
    return _h5_ds(hdf5_2d)


@pytest.fixture
def hdf5_ds_3d(hdf5_3d):
    return _h5_ds(hdf5_3d)


@pytest.fixture
def hdf5_ds_5d(hdf5_5d):
    return _h5_ds(hdf5_5d)


@pytest.fixture
def empty_hdf5(tmp_path):
    import h5py
    path = str(tmp_path / "hdf5-empty.h5")
    with h5py.File(path, "w"):
        pass
    with h5py.File(path, "r") as f:
        yield f


@pytest.fixture
def hdf5_ds_1(tmp_path):
    import h5py
    from libertem.io.dataset.hdf5 import H5DataSet
    from libertem.executor.inline import InlineJobExecutor
    path = str(tmp_path / "hdf5-test.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=np.ones((5, 5, 16, 16)))
    ds = H5DataSet(path=path, ds_path="data")
    return ds.initialize(InlineJobExecutor())


@pytest.fixture
def _same_4d_data():
    return np.random.randn(2, 10, 26, 26).astype("float32")


@pytest.fixture
def hdf5_same_data_4d(tmp_path, _same_4d_data):
    import h5py
    path = str(tmp_path / "same-4d.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=_same_4d_data)
    return _H5File(path)


@pytest.fixture
def raw_same_dataset_4d(tmp_path, _same_4d_data, lt_ctx):
    path = str(tmp_path / "same-4d.raw")
    _same_4d_data.tofile(path)
    return lt_ctx.load(
        "raw", path=path, dtype="float32",
        nav_shape=(2, 10), sig_shape=(26, 26),
    )


@pytest.fixture
def inline_executor():
    from libertem.executor.inline import InlineJobExecutor
    return InlineJobExecutor()


@pytest.fixture
def inline_executor_fast():
    # reference conftest.py:850
    from libertem.executor.inline import InlineJobExecutor
    return InlineJobExecutor(debug=False, inline_threads=2)


@pytest.fixture
def concurrent_executor():
    from libertem.executor.concurrent import ConcurrentJobExecutor
    return ConcurrentJobExecutor()


@pytest.fixture
def local_cluster_ctx():
    from libertem.api import Context
    ctx = Context.make_with("dask")
    yield ctx
    ctx.close()


@pytest.fixture
def pipelined_ctx():
    from libertem.api import Context
    ctx = Context.make_with("pipelined")
    yield ctx
    ctx.close()


@pytest.fixture
def delayed_executor():
    from libertem.executor.delayed import DelayedJobExecutor
    return DelayedJobExecutor()


@pytest.fixture
def async_executor():
    from libertem.executor.async_adapter import AsyncAdapter
    from libertem.executor.inline import InlineJobExecutor
    return AsyncAdapter(InlineJobExecutor())


@pytest.fixture(scope="session")
def default_raw_data():
    from utils import _mk_random
    return _mk_random(size=(16, 16, 128, 128), dtype="float32")


@pytest.fixture(scope="session")
def default_raw_file(tmp_path_factory, default_raw_data):
    path = tmp_path_factory.mktemp("data") / "raw-test-default"
    default_raw_data.tofile(str(path))
    return str(path)


@pytest.fixture
def default_raw(default_raw_file, lt_ctx):
    return lt_ctx.load(
        "raw", path=default_raw_file, dtype="float32",
        nav_shape=(16, 16), sig_shape=(128, 128),
    )


@pytest.fixture(scope="session")
def default_raw_asymm(default_raw_file):
    # asymmetric nav over the same file (reference conftest.py:306)
    from libertem.api import Context
    from libertem.executor.inline import InlineJobExecutor
    ctx = Context(executor=InlineJobExecutor())
    ds = ctx.load(
        "raw", path=default_raw_file, dtype="float32",
        nav_shape=(14, 17), sig_shape=(128, 128),
    )
    ds.set_num_cores(2)
    return ds


@pytest.fixture
def lt_ctx_fast(lt_ctx):
    return lt_ctx


@pytest.fixture(scope="session")
def raw_data_8x8x8x8_path(tmp_path_factory):
    from utils import _mk_random
    path = tmp_path_factory.mktemp("data") / "8x8x8x8"
    _mk_random(size=(8, 8, 8, 8), dtype="float32").tofile(str(path))
    return str(path)


@pytest.fixture(scope="session")
def large_raw_file(tmp_path_factory):
    # sparse file: apparent size ~29 GB, zero blocks on disk
    path = tmp_path_factory.mktemp("data") / "raw-test-large-sparse"
    shape = (100, 100, 1216, 1216)
    dtype = np.dtype("uint16")
    size = int(np.prod(np.array(shape, dtype=np.int64))) * dtype.itemsize
    with open(path, "wb") as f:
        f.truncate(size)
    return str(path), shape, dtype


@pytest.fixture
def large_raw(large_raw_file, lt_ctx):
    filename, shape, dtype = large_raw_file
    return lt_ctx.load(
        "raw", path=filename, dtype=dtype,
        nav_shape=shape[:2], sig_shape=shape[2:],
    )


import asyncio
import inspect


def pytest_pyfunc_call(pyfuncitem):
    # run bare `async def` tests (the reference uses pytest-asyncio,
    # which is not installed here)
    fn = pyfuncitem.function
    if inspect.iscoroutinefunction(fn):
        kwargs = {
            k: pyfuncitem.funcargs[k]
            for k in pyfuncitem._fixtureinfo.argnames
        }
        asyncio.run(fn(**kwargs))
        return True
'''


@pytest.mark.skipif(
    not os.path.isdir(REF_TESTS),
    reason="reference checkout not available",
)
@pytest.mark.parametrize(
    "relpath,k_expr", CASES,
    ids=[c[0] for c in CASES],
)
def test_reference_file_passes(relpath, k_expr, tmp_path):
    src = os.path.join(REF_TESTS, relpath)
    dst = tmp_path / os.path.basename(relpath)
    shutil.copy(src, dst)
    (tmp_path / "utils.py").write_text(_UTILS_SHIM)
    (tmp_path / "sparseconverter.py").write_text(
        _SPARSECONVERTER_SHIM
    )
    (tmp_path / "conftest.py").write_text(_CONFTEST_SHIM)
    (tmp_path / "numba.py").write_text(_NUMBA_SHIM)
    (tmp_path / "sparse.py").write_text(_SPARSE_SHIM)
    repo_root = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root
    env["JAX_PLATFORMS"] = "cpu"
    args = [sys.executable, "-m", "pytest", str(dst), "-q",
            "-p", "no:cacheprovider"]
    if k_expr:
        args += ["-k", k_expr]
    proc = subprocess.run(
        args, cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, (
        f"{relpath} failed against this implementation:\n"
        f"{proc.stdout[-3000:]}\n{proc.stderr[-2000:]}"
    )
