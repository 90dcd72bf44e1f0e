"""Import-parity alias (reference: libertem/analysis/sumfft.py)."""
from .fft import SumfftAnalysis

__all__ = ["SumfftAnalysis"]
