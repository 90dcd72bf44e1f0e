"""Run the REFERENCE's own test files against this implementation
through the drop-in ``libertem`` namespace — the strongest parity
gate available: the oracle is the reference's committed expectations,
not anything written here.

Only self-contained reference files run (no conftest fixtures, no
dask/sparse/sparseconverter imports, which aren't installed); they
are copied into a tmp dir so the reference's dask-importing conftest
never loads.
"""
import os
import shutil
import subprocess
import sys

import pytest

REF_TESTS = "/root/reference/tests"

# reference test files that import only numpy/pytest + libertem.*
SELF_CONTAINED = [
    "common/test_shape.py",
    "common/test_slice.py",
    "test_masks.py",
]


@pytest.mark.skipif(
    not os.path.isdir(REF_TESTS),
    reason="reference checkout not available",
)
@pytest.mark.parametrize("relpath", SELF_CONTAINED)
def test_reference_file_passes(relpath, tmp_path):
    src = os.path.join(REF_TESTS, relpath)
    dst = tmp_path / os.path.basename(relpath)
    shutil.copy(src, dst)
    repo_root = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", str(dst), "-q",
         "-p", "no:cacheprovider"],
        cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, (
        f"{relpath} failed against this implementation:\n"
        f"{proc.stdout[-3000:]}\n{proc.stderr[-2000:]}"
    )
