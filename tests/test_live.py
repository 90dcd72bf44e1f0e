"""Live-stream dataset: frames pushed concurrently with the run."""
import threading
import time

import numpy as np
import pytest

from libertem_tpu.io.dataset.live import LiveDataSet
from libertem_tpu.udf import SumSigUDF, SumUDF

from conftest import _mk_random


def test_live_stream(lt_ctx):
    nav, sig = (6, 8), (16, 16)
    data = _mk_random(nav + sig, dtype="float32")
    flat = data.reshape((-1,) + sig)
    ds = LiveDataSet(
        nav_shape=nav, sig_shape=sig, dtype="float32",
        ring_capacity=16, num_partitions=3,
    ).initialize()

    def producer():
        for off in range(0, len(flat), 5):
            ds.push_frames(flat[off:off + 5])
            time.sleep(0.002)
        ds.finish()

    t = threading.Thread(target=producer)
    t.start()
    res = lt_ctx.run_udf(ds, [SumUDF(), SumSigUDF()])
    t.join()
    assert np.allclose(
        res[0]["intensity"].data, data.sum(axis=(0, 1)), rtol=1e-4
    )
    assert np.allclose(
        res[1]["intensity"].data, data.sum(axis=(2, 3)), rtol=1e-4
    )


def test_live_stream_early_finish(lt_ctx):
    nav, sig = (4, 4), (8, 8)
    data = _mk_random(nav + sig, dtype="float32")
    flat = data.reshape((-1,) + sig)
    ds = LiveDataSet(
        nav_shape=nav, sig_shape=sig, dtype="float32",
        num_partitions=2,
    ).initialize()
    # only half the frames arrive
    ds.push_frames(flat[:8])
    ds.finish()
    res = lt_ctx.run_udf(ds, SumSigUDF())
    out = res["intensity"].data.reshape(-1)
    assert np.allclose(out[:8], flat[:8].sum(axis=(1, 2)),
                       rtol=1e-4)
    assert np.allclose(out[8:], 0.0)


def test_live_roi_gap_larger_than_ring(lt_ctx):
    """A ROI gap wider than the ring capacity must not deadlock:
    skipped frames are freed when the reader jumps past them."""
    nav, sig = (512,), (4, 4)
    data = _mk_random(nav + sig, dtype="float32")
    flat = data.reshape((-1,) + sig)
    ds = LiveDataSet(
        nav_shape=nav, sig_shape=sig, dtype="float32",
        ring_capacity=32, num_partitions=4,
    ).initialize()
    roi = np.zeros(512, dtype=bool)
    roi[0] = roi[500] = True  # gap of 500 >> capacity 32

    def producer():
        for off in range(0, len(flat), 16):
            ds.push_frames(flat[off:off + 16])
        ds.finish()

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    res = lt_ctx.run_udf(ds, SumUDF(), roi=roi)
    t.join(timeout=30)
    assert not t.is_alive(), "producer deadlocked"
    expected = flat[[0, 500]].astype(np.float64).sum(axis=0)
    assert np.allclose(res["intensity"].data, expected, rtol=1e-5)


def test_live_default_capacity_small_frames(lt_ctx):
    """Small frames with default ring_capacity: the negotiated block
    depth must respect the ring (get_max_io_size caps it), so the
    first read doesn't exceed the ring capacity."""
    nav, sig = (64, 64), (8, 8)
    data = _mk_random(nav + sig, dtype="float32")
    flat = data.reshape((-1,) + sig)
    ds = LiveDataSet(
        nav_shape=nav, sig_shape=sig, dtype="float32",
        ring_capacity=256, num_partitions=2,
    ).initialize()

    def producer():
        for off in range(0, len(flat), 128):
            ds.push_frames(flat[off:off + 128])
        ds.finish()

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    res = lt_ctx.run_udf(ds, SumUDF())
    t.join(timeout=30)
    assert not t.is_alive()
    assert np.allclose(
        res["intensity"].data,
        flat.astype(np.float64).sum(axis=0), rtol=1e-4,
    )


def test_live_rejects_sharded_executor(lt_ctx):
    """The ring is strictly in-order single-consumer: the sharded
    loop's concurrent per-device readers would free frames other
    shards haven't read yet (silent corruption) — refuse loudly."""
    import jax

    from libertem_tpu.udf.base import UDFException, UDFRunner

    ds = LiveDataSet(
        nav_shape=(4, 4), sig_shape=(8, 8), dtype="float32",
        ring_capacity=16, num_partitions=2,
    ).initialize()
    with pytest.raises(UDFException, match="in-order"):
        for _ in UDFRunner([SumUDF()]).run_for_dataset_iter(
            ds, devices=jax.devices()
        ):
            pass


def test_frame_ring_rejects_regressing_read():
    from libertem_tpu.io.dataset.live import FrameRing

    ring = FrameRing(32, (4, 4), "float32", capacity=8)
    ring.push_frames(np.zeros((8, 4, 4), np.float32))
    ring.read(0, 4)
    ring.read(6, 8)  # ascending with a gap: fine, frees [0, 6)
    with pytest.raises(RuntimeError, match="ascending"):
        ring.read(2, 4)
