"""Drop-in import compatibility: reference scripts' import
spellings resolve to this implementation without an import swap
(libertem/__init__.py meta-path finder)."""
import numpy as np
import pytest

from conftest import _mk_random


def test_reference_import_spellings(lt_ctx):
    import libertem.api as lt
    from libertem.udf.base import UDF  # noqa: F401
    from libertem.udf.sum import SumUDF
    from libertem.udf.stddev import StdDevUDF  # noqa: F401
    from libertem.udf.masks import ApplyMasksUDF  # noqa: F401
    from libertem.udf.raw import PickUDF  # noqa: F401
    from libertem.udf.com import CoMUDF  # noqa: F401
    from libertem.common import Shape, Slice  # noqa: F401
    from libertem.common.buffers import BufferWrapper  # noqa: F401
    from libertem.common.container import MaskContainer  # noqa: F401
    from libertem.common.executor import JobExecutor  # noqa: F401
    from libertem.corrections import CorrectionSet  # noqa: F401
    from libertem import masks  # noqa: F401
    from libertem.io.dataset import load  # noqa: F401
    from libertem.io.dataset.memory import MemoryDataSet
    from libertem.executor.inline import InlineJobExecutor
    from libertem.viz import Dummy2DPlot  # noqa: F401
    from libertem.analysis import COMAnalysis  # noqa: F401
    import libertem

    assert libertem.__version__
    assert libertem.Context is lt.Context

    # the wrapper delegates, never re-executes: class identity must
    # hold across both spellings (isinstance checks inside the
    # engine depend on it)
    import libertem_tpu.udf.sum as real_sum
    assert SumUDF is real_sum.SumUDF
    import libertem_tpu.io.dataset.memory as real_mem
    assert MemoryDataSet is real_mem.MemoryDataSet

    ctx = lt.Context(executor=InlineJobExecutor())
    data = _mk_random((4, 4, 8, 8), dtype="float32")
    ds = MemoryDataSet(
        data=data, sig_dims=2, num_partitions=2
    ).initialize()
    res = ctx.run_udf(ds, SumUDF())
    assert np.allclose(
        res["intensity"].data, data.sum(axis=(0, 1)), rtol=1e-4
    )


def test_unknown_submodule_still_errors():
    with pytest.raises(ImportError):
        import libertem.does_not_exist  # noqa: F401


def test_coordinates_module():
    """The coordinate-matrix helpers (reference
    corrections/coordinates.py) round-trip through the decomposer."""
    from libertem.corrections import coordinates as c

    m = 1.7 * c.rotate_deg(42) @ c.flip_y()
    s, angle, flipped = c.scale_rotate_flip_y(m)
    assert abs(s - 1.7) < 1e-9
    assert abs(np.rad2deg(angle) - 42) < 1e-9
    assert flipped
    s2, a2, f2 = c.scale_rotate_flip_y(c.identity())
    assert s2 == 1.0 and a2 == 0.0 and not f2
    with pytest.raises(ValueError, match="scale"):
        c.scale_rotate_flip_y(np.diag([1.0, 2.0]))
    with pytest.raises(ValueError, match="shear"):
        # equal column norms but non-unit determinant
        c.scale_rotate_flip_y(np.array([[1.0, 0.6], [0.0, 0.8]]))
    # flip_x composes as expected
    v = np.array([3.0, 4.0])
    assert np.allclose(c.flip_x() @ v, [3.0, -4.0])
    # the CoM convention: rotate_deg @ flip_y matches
    # apply_com_correction
    from libertem.udf.com import apply_com_correction
    y, x = np.array([1.0]), np.array([2.0])
    t = c.rotate_deg(30) @ c.flip_y()
    yx = t @ np.stack([y, x])
    cy, cx = apply_com_correction(y, x, 30.0, True)
    assert np.allclose(yx[0], cy) and np.allclose(yx[1], cx)
