"""Execute generated notebooks end-to-end (reference:
tests/template/test_regressions.py runs every GUI-generated template
under nbval).  One notebook carrying ALL 15 analysis templates runs
against a tiny synthetic raw dataset in a real jupyter kernel — a
template that renders but crashes at runtime fails here, not in a
user's hands.
"""
import os

import numpy as np
import pytest

nbformat = pytest.importorskip("nbformat")
pytest.importorskip("nbclient")

ALL_IDS = (
    "SUM_FRAMES", "SD_FRAMES", "SUM_SIG", "PICK_FRAME",
    "APPLY_DISK_MASK", "APPLY_RING_MASK", "APPLY_POINT_SELECTOR",
    "MASKS", "CENTER_OF_MASS", "RADIAL_FOURIER", "FEM", "CLUST",
    "APPLY_FFT_MASK", "PICK_FFT_FRAME", "FFTSUM_FRAMES",
)

PARAMS = {
    "cx": 4, "cy": 4, "r": 3, "ri": 1, "ro": 4, "x": 1, "y": 1,
    "n_bins": 2, "max_order": 2, "flip_y": False,
    "scan_rotation": 0.0, "rad_in": 1, "rad_out": 4, "n_clust": 3,
    "n_peaks": 5,
}


@pytest.mark.slow_ok
def test_generated_notebook_executes(tmp_path, monkeypatch):
    from libertem_tpu.web.notebook_generator import notebook_for

    # tiny synthetic dataset the generated open-cell will load
    data = np.random.default_rng(42).normal(
        size=(4, 4, 8, 8)
    ).astype(np.float32)
    raw_path = tmp_path / "nb-exec.raw"
    data.tofile(str(raw_path))

    nb_dict = notebook_for(
        "RAW",
        {
            "path": str(raw_path), "dtype": "float32",
            "nav_shape": [4, 4], "sig_shape": [8, 8],
        },
        [
            {"analysisType": i, "parameters": dict(PARAMS)}
            for i in ALL_IDS
        ],
    )
    nb = nbformat.from_dict(nb_dict)
    nbformat.validate(nb)
    # the generator emits list-of-lines sources (valid v4 JSON);
    # nbclient's in-memory API wants joined strings
    for cell in nb.cells:
        if isinstance(cell.source, list):
            cell.source = "".join(cell.source)

    # the kernel is a fresh process: force the CPU backend (the dev
    # machine's sitecustomize would otherwise pick the TPU tunnel),
    # headless matplotlib, and this repo on the import path
    repo_root = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("MPLBACKEND", "Agg")
    pythonpath = os.environ.get("PYTHONPATH", "")
    monkeypatch.setenv(
        "PYTHONPATH",
        repo_root + (os.pathsep + pythonpath if pythonpath else ""),
    )

    from nbclient import NotebookClient

    client = NotebookClient(
        nb, timeout=600, kernel_name="python3",
        resources={"metadata": {"path": str(tmp_path)}},
    )
    client.execute()  # raises CellExecutionError on any broken cell

    # every code cell ran (execution_count assigned in order)
    code_cells = [c for c in nb.cells if c.cell_type == "code"]
    assert code_cells
    for cell in code_cells:
        assert cell.execution_count is not None, cell.source
    # at least one analysis produced a rendered matplotlib figure
    assert any(
        out.get("output_type") in ("display_data", "execute_result")
        for cell in code_cells for out in cell.get("outputs", ())
    )
