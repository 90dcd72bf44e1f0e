"""Dev helper: run one reference test file through the gate shims
(same environment as tests/test_reference_suite.py) for iterating on
new gate candidates.  Usage:

    python tests/run_ref_file.py udf/test_simple_udf.py [-k expr] [...]
"""
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import test_reference_suite as gate  # noqa: E402


def main():
    relpath = sys.argv[1]
    extra = sys.argv[2:]
    tmp = tempfile.mkdtemp(prefix="refgate-")
    src = os.path.join(gate.REF_TESTS, relpath)
    dst = os.path.join(tmp, os.path.basename(relpath))
    shutil.copy(src, dst)
    for name, text in [
        ("utils.py", gate._UTILS_SHIM),
        ("sparseconverter.py", gate._SPARSECONVERTER_SHIM),
        ("conftest.py", gate._CONFTEST_SHIM),
        ("numba.py", gate._NUMBA_SHIM),
        ("sparse.py", gate._SPARSE_SHIM),
    ]:
        with open(os.path.join(tmp, name), "w") as f:
            f.write(text)
    repo_root = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root
    env["JAX_PLATFORMS"] = "cpu"
    args = [sys.executable, "-m", "pytest", dst, "-q",
            "-p", "no:cacheprovider"] + extra
    proc = subprocess.run(args, cwd=tmp, env=env)
    print(f"[tmpdir kept: {tmp}]")
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
