"""Filesystem browsing helpers for the web API
(reference: libertem/io/fs.py — FSError:?, _get_alt_path:30): when a
requested directory cannot be listed, walk UP the path until an
accessible directory is found so the GUI can recover to a usable
location instead of a dead end.
"""
from __future__ import annotations

import os
from pathlib import Path


class FSError(Exception):
    """Filesystem access failure with a machine-readable ``code`` and
    a recovery ``alternative`` path.  All constructor values ride
    ``args`` so the exception pickles across process boundaries
    (reference tests/test_fs.py test_pickle_fserror)."""

    def __init__(self, msg, code, alternative=None):
        super().__init__(msg, code, alternative)
        self.code = code
        self.alternative = alternative


def _accessible(path: Path) -> bool:
    try:
        ok = os.path.isdir(path) and os.access(
            path, os.R_OK | os.X_OK
        )
        if ok:
            Path(path).resolve()
            os.listdir(path)
        return ok
    except (PermissionError, OSError):
        return False


def _get_alt_path(path) -> Path:
    """Nearest accessible ancestor of ``path`` (home directory when
    the walk runs out of parents — e.g. a nonexistent drive root)."""
    cur = Path(path).expanduser()
    try:
        cur = cur.resolve()
    except PermissionError:
        pass
    while not _accessible(cur):
        try:
            cur = cur.parents[0].resolve()
        except IndexError:
            return Path.home()
        except PermissionError:
            continue
    return cur
