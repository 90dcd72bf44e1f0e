"""LIBERTEM_TPU_PRELOAD env hook
(reference: libertem/preload.py — imports e.g. hdf5plugin before
h5py so compressed HDF5 datasets open).
"""
from __future__ import annotations

import importlib
import logging
import os

log = logging.getLogger(__name__)


def do_preloads(env_var: str = "LIBERTEM_TPU_PRELOAD"):
    spec = os.environ.get(env_var, "")
    for name in filter(None, (s.strip() for s in spec.split(";"))):
        try:
            importlib.import_module(name)
        except ImportError as e:
            log.warning("preload of %s failed: %s", name, e)


def preload_modules(names):
    """Import the given modules, warning (not crashing) on failure —
    shared by the CLI --preload flag and the env hook."""
    for name in names:
        try:
            importlib.import_module(name)
        except ImportError as e:
            log.warning("preload of %s failed: %s", name, e)
