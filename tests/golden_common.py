"""Shared input-data generators for reference-golden parity tests.

Both the recorder (tests/ref_oracle/record_goldens.py, which runs the
*reference* implementation from /root/reference/src under import
shims) and the parity test (tests/test_parity_reference.py, which runs
this repo's framework) build their inputs through these functions, so
the recorded .npz goldens and the tested outputs see bit-identical
data.
"""
import numpy as np

NAV = (16, 16)
SIG = (64, 64)


def golden_data(seed=42, nav=NAV, sig=SIG, dtype="float32"):
    """Asymmetric random frames with a bright central blob so CoM and
    virtual detectors have structure."""
    rng = np.random.default_rng(seed)
    n = int(np.prod(nav))
    h, w = sig
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = rng.random((n, h, w), dtype=np.float32)
    # per-frame shifted Gaussian blob
    cy = (h - 1) / 2 + 3.0 * rng.standard_normal(n).astype(np.float32)
    cx = (w - 1) / 2 + 3.0 * rng.standard_normal(n).astype(np.float32)
    blob = np.exp(
        -((yy[None] - cy[:, None, None]) ** 2
          + (xx[None] - cx[:, None, None]) ** 2) / 40.0
    )
    frames += 10.0 * blob
    return frames.reshape(nav + sig).astype(dtype)


def golden_data_u16(seed=43, nav=NAV, sig=SIG):
    rng = np.random.default_rng(seed)
    return rng.integers(
        0, 4096, size=nav + sig
    ).astype(np.uint16)


def golden_roi(seed=44, nav=NAV):
    rng = np.random.default_rng(seed)
    return rng.random(int(np.prod(nav))) > 0.4


def golden_corrections_arrays(seed=45, sig=SIG):
    rng = np.random.default_rng(seed)
    dark = rng.normal(loc=2.0, scale=0.5, size=sig).astype(np.float32)
    gain = (1.0 + 0.2 * rng.random(sig)).astype(np.float32)
    excluded = np.zeros(sig, dtype=bool)
    flat = rng.choice(int(np.prod(sig)), size=7, replace=False)
    excluded.flat[flat] = True
    return dark, gain, excluded


# mask geometry shared by both sides (sig = 64x64)
MASK_PARAMS = dict(cy=31.5, cx=31.5, r_bf=10.0, ri_adf=14.0,
                   ro_adf=24.0, ri_haadf=26.0, ro_haadf=31.0)
COM_PARAMS = dict(cy=31.5, cx=31.5, r=28.0, scan_rotation=21.5,
                  flip_y=True)
RADIAL_PARAMS = dict(cy=31.5, cx=31.5, ri=4.0, ro=30.0, n_bins=4,
                     max_order=3)
CRYSTAL_PARAMS = dict(rad_in=4, rad_out=14, real_center=(31.5, 31.5),
                      real_rad=8)
FEM_PARAMS = dict(center=(31.5, 31.5), rad_in=8.0, rad_out=22.0)
