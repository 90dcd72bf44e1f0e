"""Import-parity alias
(reference: libertem/analysis/apply_fft_mask.py)."""
from .fft import ApplyFFTMask, ApplyFFTMaskUDF

__all__ = ["ApplyFFTMask", "ApplyFFTMaskUDF"]
