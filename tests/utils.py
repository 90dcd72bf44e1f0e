import numpy as np


def naive_mask_apply(masks, data):
    """Brute-force reference for ApplyMasksUDF
    (counterpart of tests/utils.py:25 in the reference).

    masks: list of (*sig) arrays; data: (*nav, *sig).
    Returns (*nav, num_masks), float64 accumulation.
    """
    sig_ndim = masks[0].ndim
    nav_shape = data.shape[:data.ndim - sig_ndim]
    flat = data.reshape((-1,) + data.shape[data.ndim - sig_ndim:])
    out = np.zeros((flat.shape[0], len(masks)))
    for i, m in enumerate(masks):
        md = np.asarray(m.todense()) if hasattr(m, "todense") else m
        out[:, i] = (
            flat.reshape(flat.shape[0], -1).astype(np.float64)
            @ md.reshape(-1).astype(np.float64)
        )
    return out.reshape(nav_shape + (len(masks),))


from libertem_tpu.udf.base import UDF as _UDF


class ValidationUDF(_UDF):
    """Compares the tile stream against the raw source array
    (counterpart of the reference's ValidationUDF,
    tests/utils.py:167).  Runs on the host path so it can assert with
    real numpy inside process_tile."""

    def __init__(self, ref_flat, rtol=1e-6):
        # ref_flat: (n_frames_after_roi, *sig) expected input-dtype
        # values in roi-compressed order
        super().__init__(ref_flat=ref_flat, rtol=rtol)

    def get_backends(self):
        return (self.BACKEND_NUMPY,)

    def get_result_buffers(self):
        return {
            "seen": self.buffer(kind="nav", dtype="float32"),
        }

    def process_tile(self, tile):
        goff = int(self.meta.global_offset)
        n = tile.shape[0]
        expected = self.params.ref_flat[goff:goff + n]
        assert expected.shape == tile.shape, (
            expected.shape, tile.shape
        )
        assert np.allclose(
            tile, expected.astype(tile.dtype),
            rtol=self.params.rtol, atol=1e-4,
        ), f"tile mismatch at offset {goff}"
        self.results.seen[:] = 1.0
