"""Holography UDF stub — the implementation moved to a sibling
package in the reference too (libertem/udf/holography.py:11 raises
pointing to LiberTEM-holo)."""


class HoloReconstructUDF:
    def __init__(self, *args, **kwargs):
        raise ImportError(
            "holography support lives in a separate package "
            "(the reference moved it to LiberTEM-holo); "
            "use libertem_tpu.utils.generate.hologram_frame for "
            "synthetic holograms"
        )
