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
