"""Correlation peak finding on simulated diffraction patterns
(BASELINE config #4)."""
import numpy as np
import pytest

from libertem_tpu.io.dataset.memory import MemoryDataSet
from libertem_tpu.udf.blobfinder import (
    BackgroundSubtraction,
    Disk,
    FullFrameCorrelationUDF,
    RadialGradient,
    SparseCorrelationUDF,
    run_blobfinder,
)
from libertem_tpu.utils.generate import cbed_frame


@pytest.fixture
def cbed_data():
    """Small scan of simulated CBED patterns whose zero-beam position
    wobbles with scan position."""
    fy = fx = 64
    nav = (3, 3)
    frames = np.zeros(nav + (fy, fx), dtype=np.float32)
    true_pos = np.zeros(nav + (2,), dtype=np.float32)
    for i in range(nav[0]):
        for j in range(nav[1]):
            zy = 32 + i - 1
            zx = 32 + j - 1
            frame, _, _ = cbed_frame(
                fy=fy, fx=fx, zero=(zy, zx), a=(16, 0),
                radius=3, all_equal=True,
            )
            frames[i, j] = frame[0]
            true_pos[i, j] = (zy, zx)
    return frames, true_pos


def test_full_frame_correlation(lt_ctx, cbed_data):
    frames, true_pos = cbed_data
    ds = MemoryDataSet(
        data=frames, sig_dims=2, num_partitions=2
    ).initialize()
    udf = FullFrameCorrelationUDF(
        match_pattern=RadialGradient(radius=3)
    )
    res = lt_ctx.run_udf(ds, udf)
    centers = res["centers"].data
    # strongest correlation is a lattice peak; with all_equal
    # intensities any lattice position qualifies — check that found
    # centers coincide with SOME peak of each frame (on the lattice
    # around the known zero position, spacing 16)
    for i in range(3):
        for j in range(3):
            cy, cx = centers[i, j]
            dy = (cy - true_pos[i, j, 0]) % 16
            dx = (cx - true_pos[i, j, 1]) % 16
            assert min(dy, 16 - dy) <= 1.5, (i, j, cy, cx)
            assert min(dx, 16 - dx) <= 1.5, (i, j, cy, cx)
    assert (res["peak_values"].data > 0).all()


def test_sparse_correlation(lt_ctx, cbed_data):
    frames, true_pos = cbed_data
    ds = MemoryDataSet(
        data=frames, sig_dims=2, num_partitions=2
    ).initialize()
    peaks = np.array([[32, 32], [32, 48], [48, 32]])
    udf = SparseCorrelationUDF(
        match_pattern=RadialGradient(radius=3),
        peaks=peaks, steps=4,
    )
    res = lt_ctx.run_udf(ds, udf)
    centers = res["centers"].data  # (3, 3, n_peaks, 2)
    refineds = res["refineds"].data
    # peak 0 tracks the wobbling zero beam exactly
    for i in range(3):
        for j in range(3):
            assert np.allclose(
                centers[i, j, 0], true_pos[i, j], atol=1.0
            ), (i, j, centers[i, j, 0], true_pos[i, j])
            assert np.allclose(
                refineds[i, j, 0], true_pos[i, j], atol=1.0
            )
    assert res["peak_values"].data.shape == (3, 3, 3)


def test_patterns_and_wrapper(lt_ctx, cbed_data):
    frames, _ = cbed_data
    ds = MemoryDataSet(
        data=frames, sig_dims=2, num_partitions=1
    ).initialize()
    for pattern in (
        Disk(radius=3),
        RadialGradient(radius=3),
        BackgroundSubtraction(radius=3, radius_outer=6),
    ):
        res = run_blobfinder(lt_ctx, ds, pattern)
        assert res["centers"].data.shape == (3, 3, 2)


def test_fit_lattice():
    from libertem_tpu.udf.blobfinder import fit_lattice
    rng = np.random.default_rng(3)
    zero = np.array([32.0, 32.0])
    a = np.array([8.0, 0.0])
    b = np.array([0.0, 8.0])
    hk = np.array([
        [0, 0], [1, 0], [0, 1], [-1, 0], [0, -1], [1, 1],
    ])
    peaks = zero + hk @ np.stack([a, b])
    # frames with 1% a-stretch and small rotation
    nav = (2, 3)
    refineds = np.zeros(nav + (len(peaks), 2))
    for i in np.ndindex(nav):
        stretch = 1.0 + 0.01 * (i[0] + 1)
        a_i = a * stretch
        refineds[i] = zero + hk @ np.stack([a_i, b])
    fit = fit_lattice(refineds, peaks, zero, a, b)
    assert np.allclose(fit["da_rel"][0], 0.01, atol=1e-6)
    assert np.allclose(fit["da_rel"][1], 0.02, atol=1e-6)
    assert np.allclose(fit["db_rel"], 0.0, atol=1e-9)
    assert np.allclose(fit["zero"][..., 0], 32.0, atol=1e-9)


def test_sparse_correlation_border_peak(lt_ctx):
    """A peak within `steps` of the frame border must still get the
    right center: the FFT correlation is circular, so windows wrap
    (clipping duplicated border cells and shifted the argmax->offset
    mapping)."""
    fy = fx = 32
    frames = np.zeros((1, 1, fy, fx), dtype=np.float32)
    # bright disks near the corner (1, 1) and near the right edge
    yy, xx = np.mgrid[0:fy, 0:fx]
    for py, px in [(1, 1), (16, 29)]:
        frames[0, 0][(yy - py) ** 2 + (xx - px) ** 2 <= 4] = 10.0
    ds = MemoryDataSet(
        data=frames, sig_dims=2, num_partitions=1
    ).initialize()
    # expected positions a couple of pixels off the true ones
    udf = SparseCorrelationUDF(
        match_pattern=Disk(radius=2, search=5),
        peaks=np.array([[2, 2], [17, 28]]), steps=4,
    )
    res = lt_ctx.run_udf(ds, udf)
    centers = np.asarray(res["centers"].data).reshape(2, 2)
    assert np.allclose(centers[0], (1, 1), atol=1)
    assert np.allclose(centers[1], (16, 29), atol=1)
