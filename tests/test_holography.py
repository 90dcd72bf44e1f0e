"""Holography reconstruction: recover a known phase object from
synthetic off-axis holograms."""
import numpy as np
import pytest

from libertem_tpu.io.dataset.memory import MemoryDataSet
from libertem_tpu.udf.holography import (
    HoloReconstructUDF,
    estimate_sideband_position,
    estimate_sideband_size,
)
from libertem_tpu.utils.generate import hologram_frame


def test_holo_reconstruction(lt_ctx):
    sy = sx = 64
    y, x = np.mgrid[0:sy, 0:sx]
    # smooth phase object + flat reference
    phase = 1.5 * np.exp(
        -((y - 32) ** 2 + (x - 32) ** 2) / 200.0
    )
    amp = np.ones((sy, sx))
    holo = hologram_frame(amp, phase, sampling=4.0)
    ref = hologram_frame(amp, np.zeros_like(phase), sampling=4.0)
    frames = np.stack([holo, ref]).astype(np.float32).reshape(
        2, 1, sy, sx
    )
    ds = MemoryDataSet(
        data=frames, sig_dims=2, num_partitions=1
    ).initialize()

    sb_pos = estimate_sideband_position(ref)
    sb_size = estimate_sideband_size(sb_pos, (sy, sx))
    udf = HoloReconstructUDF(
        out_shape=(32, 32), sb_position=sb_pos, sb_size=sb_size,
    )
    res = lt_ctx.run_udf(ds, udf)
    wave = res["wave"].data.reshape(2, 32, 32)
    # phase difference object-minus-reference recovers the object
    # phase (up to a constant; the upper sideband carries e^{-i phi},
    # so the sign flips)
    dphi = -np.angle(wave[0] / wave[1])
    # compare against the downsampled true phase, ignoring borders
    true = phase[::2, ::2]
    inner = np.s_[8:24, 8:24]
    delta = dphi[inner] - true[inner]
    delta -= delta.mean()
    assert np.abs(delta).max() < 0.35
    assert np.abs(delta).mean() < 0.1


def test_out_shape_upsample_rejected(lt_ctx):
    """out_shape > sig must raise: the Fourier crop can only shrink
    (sig < out <= 2*sig would silently duplicate frequency rows)."""
    from libertem_tpu.udf.holography import HoloReconstructUDF

    data = np.ones((1, 1, 8, 8), dtype=np.float32)
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=1
    ).initialize()
    udf = HoloReconstructUDF(
        out_shape=(12, 8), sb_position=(2, 2), sb_size=2.0,
    )
    with pytest.raises(ValueError, match="out_shape"):
        lt_ctx.run_udf(ds, udf)
