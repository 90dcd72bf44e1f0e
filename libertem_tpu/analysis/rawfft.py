"""Import-parity alias (reference: libertem/analysis/rawfft.py)."""
from .fft import PickFFTFrameAnalysis

__all__ = ["PickFFTFrameAnalysis"]
