import time

import numpy as np
import pytest

from libertem_tpu.common.shape import Shape
from libertem_tpu.common.slice import Slice


def test_shape_basics():
    s = Shape((16, 16, 128, 128), sig_dims=2)
    assert tuple(s.nav) == (16, 16)
    assert tuple(s.sig) == (128, 128)
    assert s.size == 16 * 16 * 128 * 128
    assert s.dims == 4 and s.nav_dims == 2 and s.sig_dims == 2
    assert tuple(s.flatten_nav()) == (256, 128, 128)
    assert tuple(s.flatten_sig()) == (16, 16, 128 * 128)
    assert s == Shape((16, 16, 128, 128), sig_dims=2)
    assert s != Shape((16, 16, 128, 128), sig_dims=1)
    assert hash(s) == hash(Shape((16, 16, 128, 128), sig_dims=2))
    with pytest.raises(ValueError):
        Shape((4, 4), sig_dims=3)


def test_slice_intersection():
    s1 = Slice((0, 0), Shape((10, 10), sig_dims=1))
    s2 = Slice((5, 5), Shape((10, 10), sig_dims=1))
    inter = s1.intersection_with(s2)
    assert inter.origin == (5, 5)
    assert tuple(inter.shape) == (5, 5)
    s3 = Slice((20, 20), Shape((5, 5), sig_dims=1))
    assert s1.intersection_with(s3).is_null()


def test_slice_shift_get():
    s = Slice((4, 2), Shape((3, 5), sig_dims=1))
    base = Slice((2, 0), Shape((10, 10), sig_dims=1))
    shifted = s.shift_by(base)
    assert shifted.origin == (2, 2)
    arr = np.arange(100).reshape(10, 10)
    sub = s.get(arr)
    assert sub.shape == (3, 5)
    assert sub[0, 0] == arr[4, 2]


def test_slice_subslices():
    s = Slice((0, 0), Shape((4, 6), sig_dims=1))
    subs = list(s.subslices((2, 4)))
    assert len(subs) == 2 * 2
    total = sum(sub.shape.size for sub in subs)
    assert total == 24
    # tail subslices are clipped
    shapes = sorted(tuple(sub.shape) for sub in subs)
    assert (2, 2) in shapes and (2, 4) in shapes


def test_slice_flatten_nav():
    ds_shape = Shape((4, 6, 8, 8), sig_dims=2)
    s = Slice((2, 0, 0, 0), Shape((1, 6, 8, 8), sig_dims=2))
    flat = s.flatten_nav(ds_shape)
    assert flat.origin == (12, 0, 0)
    assert tuple(flat.shape) == (6, 8, 8)


def test_slice_adjust_for_roi():
    roi = np.zeros(24, dtype=bool)
    roi[[3, 5, 10, 15, 20]] = True
    s = Slice((8, 0, 0), Shape((8, 4, 4), sig_dims=2))
    adj = s.adjust_for_roi(roi)
    # selected before frame 8: 3, 5 -> origin 2
    assert adj.origin[0] == 2
    # selected in [8, 16): 10, 15 -> size 2
    assert adj.shape[0] == 2


def test_negotiator_depth():
    from libertem_tpu.io.tiling import Negotiator
    from libertem_tpu.udf import SumUDF
    udf = SumUDF()
    udf.meta = None
    shape = Shape((100, 100, 64, 64), sig_dims=2)
    scheme = Negotiator().get_scheme(
        [udf], shape, np.float32, max_partition_frames=1000
    )
    assert scheme.depth % 8 == 0
    assert scheme.depth >= 8
    assert len(scheme) == 1  # whole-frame sig


def test_negotiator_sig_split():
    from libertem_tpu.io.tiling import Negotiator
    from libertem_tpu.udf.base import UDF

    class TinyTileUDF(UDF):
        def get_result_buffers(self):
            return {}

        def process_tile(self, tile):
            pass

        def get_tiling_preferences(self):
            return {"depth": 16, "total_size": 2048}

    shape = Shape((10, 64, 64), sig_dims=2)
    scheme = Negotiator().get_scheme(
        [TinyTileUDF()], shape, np.float32,
        max_partition_frames=10,
    )
    assert len(scheme) > 1  # sig got split
    # sig slices tile the full signal exactly
    covered = np.zeros((64, 64), dtype=int)
    for _, sl in scheme.slices:
        covered[sl.get()] += 1
    assert (covered == 1).all()


def test_negotiator_reuse_not_sticky():
    """A max_io_size from one dataset must not lower the block budget
    for a later dataset negotiated by the same instance."""
    from libertem_tpu.io.tiling import Negotiator
    from libertem_tpu.udf import SumUDF
    neg = Negotiator()
    shape = Shape((100, 100, 64, 64), sig_dims=2)
    baseline = neg.get_scheme(
        [SumUDF()], shape, np.float32, max_partition_frames=5000,
    ).depth
    limited = neg.get_scheme(
        [SumUDF()], shape, np.float32, max_partition_frames=5000,
        max_io_size=1024 * 1024,
    ).depth
    assert limited < baseline
    again = neg.get_scheme(
        [SumUDF()], shape, np.float32, max_partition_frames=5000,
    ).depth
    assert again == baseline
    assert Negotiator.TARGET_BLOCK_BYTES == 64 * 1024 * 1024


def test_buffer_wrapper_decl():
    from libertem_tpu.common.buffers import BufferWrapper
    b = BufferWrapper("nav", extra_shape=(3,), dtype="float32")
    b.set_shape_ds(Shape((4, 5, 8, 8), sig_dims=2), None)
    assert b.shape == (20, 3)
    roi = np.zeros(20, dtype=bool)
    roi[:7] = True
    b2 = BufferWrapper("nav", dtype="float32")
    b2.set_shape_ds(Shape((4, 5, 8, 8), sig_dims=2), roi)
    assert b2.shape == (7,)
    b2.set_result(np.arange(7, dtype=np.float32))
    data = b2.data
    assert data.shape == (4, 5)
    assert np.isnan(data.reshape(-1)[7:]).all()
    masked = b2.masked_data
    assert masked.count() == 7


def test_partition_method_oom_guard():
    from libertem_tpu.io.tiling import Negotiator
    from libertem_tpu.udf.base import UDF

    class PartUDF(UDF):
        def get_result_buffers(self):
            return {}

        def process_partition(self, partition):
            pass

    # 1M frames x 256x256 f32 in one partition = way over budget
    shape = Shape((1024, 1024, 256, 256), sig_dims=2)
    with pytest.raises(ValueError, match="PARTITION-method"):
        Negotiator().get_scheme(
            [PartUDF()], shape, np.float32,
            max_partition_frames=1024 * 1024,
        )


def test_partition_method_big_frames_keeps_whole_partition():
    """A PARTITION-method UDF with frames above MAX_SIG_BYTES (but a
    partition under the device budget) must still get the WHOLE
    partition as one block — the whole-frames depth shrink would
    otherwise dispatch process_partition once per sub-block."""
    from libertem_tpu.io.tiling import Negotiator
    from libertem_tpu.udf.base import UDF

    class PartUDF(UDF):
        def get_result_buffers(self):
            return {}

        def process_partition(self, partition):
            pass

    # 288 MB f32 frames (> MAX_SIG_BYTES=256MB), 4-frame partitions
    # (1.15 GB, under the 2 GB guard)
    shape = Shape((16, 9000, 8000), sig_dims=2)
    scheme = Negotiator().get_scheme(
        [PartUDF()], shape, np.float32, max_partition_frames=4,
    )
    assert scheme.intent == "partition"
    assert scheme.depth == 4
    assert len(scheme) == 1  # whole sig, no splitting


def test_async_generator_eager_order_and_close():
    """The sync->async bridge delivers every item exactly once, in
    order, even with a tiny queue and a slow consumer; abandoning the
    consumer closes the source generator (releasing readers)."""
    import asyncio
    from libertem_tpu.common.async_utils import async_generator_eager

    closed = {"flag": False}

    def make_gen(n):
        try:
            for i in range(n):
                yield i
        finally:
            closed["flag"] = True

    async def consume_all():
        got = []
        async for item in async_generator_eager(
            make_gen(50), queue_size=2
        ):
            await asyncio.sleep(0.001)
            got.append(item)
        return got

    got = asyncio.run(consume_all())
    assert got == list(range(50))
    assert closed["flag"]

    closed["flag"] = False

    async def consume_some():
        got = []
        async for item in async_generator_eager(
            make_gen(10_000), queue_size=2
        ):
            got.append(item)
            if len(got) == 3:
                break
        return got

    got = asyncio.run(consume_some())
    assert got == [0, 1, 2]
    # producer notices abandonment within its put timeout
    deadline = time.monotonic() + 5
    while not closed["flag"] and time.monotonic() < deadline:
        time.sleep(0.01)
    assert closed["flag"]


def test_async_generator_eager_error_propagates():
    import asyncio
    from libertem_tpu.common.async_utils import async_generator_eager

    def boom():
        yield 1
        raise RuntimeError("boom from producer")

    async def consume():
        got = []
        async for item in async_generator_eager(boom()):
            got.append(item)
        return got

    with pytest.raises(RuntimeError, match="boom from producer"):
        asyncio.run(consume())


def test_slice_get_sig_only_trailing_axes():
    """sig_only slicing must address the TRAILING axes of the array
    (reference slice.py:152), not the leading nav axes."""
    s = Slice((0, 2, 3), Shape((10, 4, 4), sig_dims=2))
    arr = np.arange(10 * 8 * 8).reshape(10, 8, 8)
    out = s.get(arr, sig_only=True)
    assert out.shape == (10, 4, 4)
    assert np.array_equal(out, arr[:, 2:6, 3:7])


def test_shape_eq_non_iterable():
    s = Shape((2, 2), sig_dims=1)
    assert not (s == None)  # noqa: E711
    assert s != None  # noqa: E711
    assert not (s == 5)
    assert s == (2, 2)
    assert s != (2, 3)


def test_progress_close_incomplete_on_error():
    from libertem_tpu.common.progress import (
        ProgressManager, ProgressReporter,
    )

    class Rec(ProgressReporter):
        def __init__(self):
            self.ended = None

        def start(self, state):
            pass

        def update(self, state):
            pass

        def end(self, state):
            self.ended = (
                state.num_frames_complete, state.num_frames_total
            )

    rec = Rec()
    pm = ProgressManager(100, 4, reporter=rec)
    pm.frames_done(10)
    try:
        try:
            raise RuntimeError("boom")
        finally:
            pm.close()
    except RuntimeError:
        pass
    assert rec.ended == (10, 100)  # NOT forced to 100%

    rec2 = Rec()
    pm2 = ProgressManager(100, 4, reporter=rec2)
    pm2.frames_done(10)
    pm2.close()
    assert rec2.ended == (100, 100)  # clean completion snaps


def test_bufferwrapper_roi_keeps_derived_dtype():
    from libertem_tpu.common.buffers import BufferWrapper

    roi = np.zeros(12, dtype=bool)
    roi[:3] = True
    b = BufferWrapper("nav", dtype="float32")
    b.set_shape_ds(Shape((3, 4, 8, 8), sig_dims=2), roi)
    b.set_result(
        np.array([1 + 2j, 3 + 4j, 5 + 6j], dtype=np.complex64)
    )
    data = b.data
    assert data.dtype == np.complex64  # not truncated to float32
    assert data.reshape(-1)[0] == 1 + 2j
