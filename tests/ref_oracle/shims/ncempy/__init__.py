"""Stub ncempy for the reference-oracle environment.

The reference imports ncempy at module level in k2is.py (gtg
metadata) and seq.py (sidecar MRC dark/gain); the oracle recordings
never provide those sidecar files, so the entry points only need to
exist, not work."""
