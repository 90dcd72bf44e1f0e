"""Simulated multi-host (DCN) run: two OS processes, 4 virtual CPU
devices each, one 8-device global mesh via jax.distributed — each
process feeds only its local shards; the fold's collectives cross the
process boundary (gloo/TCP stands in for ICI+DCN).

Counterpart of the reference's dist-marker docker-compose tests
(docs/source/dist_tests.rst); design notes in docs/multihost.md.
"""
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_mesh(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(
        repo, "tests", "multihost_worker.py"
    )
    port = _free_port()
    env = dict(os.environ)
    # drop the sitecustomize that force-registers the TPU plugin;
    # workers set their own JAX_PLATFORMS/XLA_FLAGS
    env["PYTHONPATH"] = repo
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i), "2"],
            env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, cwd=repo,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_WORKER_{i}_OK" in out, out[-3000:]
