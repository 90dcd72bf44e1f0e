"""Cluster analysis: segment the scan by diffraction similarity
(reference: libertem/analysis/clust.py:93, id CLUST —
StdDevUDF → peak_local_max → ApplyMasksUDF point features →
AgglomerativeClustering).

peak_local_max is reimplemented with scipy.ndimage (the reference uses
skimage, which is not a dependency here).
"""
from __future__ import annotations

import numpy as np

from ..common.analysis import AnalysisResult, AnalysisResultSet
from ..masks import sparse_template_multi_stack
from ..udf.masks import ApplyMasksUDF
from ..udf.stddev import StdDevUDF
from ..viz.base import visualize_simple
from .base import BaseAnalysis


def peak_local_max(
    image: np.ndarray, min_distance: int = 1, num_peaks: int = 100,
) -> np.ndarray:
    """(n, 2) coordinates of local maxima, strongest first."""
    from scipy import ndimage
    image = np.asarray(image, dtype=np.float64)
    size = 2 * min_distance + 1
    maxed = ndimage.maximum_filter(image, size=size, mode="constant")
    mask = (image == maxed) & (image > image.mean())
    coords = np.argwhere(mask)
    if len(coords) == 0:
        return coords.reshape(0, 2)
    values = image[tuple(coords.T)]
    order = np.argsort(values)[::-1]
    return coords[order[:num_peaks]]


class ClusterAnalysis(BaseAnalysis, id_="CLUST"):
    def get_parameters(self, parameters: dict) -> dict:
        # `or` defaults: the GUI sends explicit nulls for untouched
        # fields, which .get(k, default) would keep as None
        return {
            **parameters,
            "n_clust": parameters.get("n_clust") or 8,
            "n_peaks": parameters.get("n_peaks") or 42,
            "min_dist": parameters.get("min_dist") or 1,
            # template half-width (this framework's extension; the
            # reference uses single-pixel features, i.e. rad=0)
            "rad": (
                2 if parameters.get("rad") is None
                else parameters["rad"]
            ),
            # annulus restricting the peak search on the std map
            # (reference clust.py:149-160: cy/cx/ri/ro)
            "cy": parameters.get("cy"),
            "cx": parameters.get("cx"),
            "ri": parameters.get("ri"),
            "ro": parameters.get("ro"),
        }

    def get_udf(self):
        return StdDevUDF()

    def run_clustering(
        self, ctx, job_is_cancelled=None,
    ) -> AnalysisResultSet:
        """Full pipeline; needs a Context to run the feature pass
        (reference runs this via an analysis controller,
        clust.py:93–205 + web/engine.py:176).  ``job_is_cancelled``
        is re-checked between the expensive passes so a GUI cancel
        takes effect mid-pipeline."""
        def cancelled():
            return (
                job_is_cancelled is not None and job_is_cancelled()
            )

        p = self.parameters
        roi = self.get_roi()
        sd = ctx.run_udf(self.dataset, StdDevUDF(), roi=roi)
        if cancelled():
            return AnalysisResultSet([])
        std_map = np.asarray(sd["std"].data)
        # restrict the peak search to the cy/cx/ri/ro annulus when
        # given (reference clust.py:155-160)
        search_map = std_map
        if all(
            p.get(k) is not None for k in ("cy", "cx", "ri", "ro")
        ):
            from ..masks import ring
            sh, sw = std_map.shape
            ring_mask = ring(
                p["cx"], p["cy"], sw, sh, p["ro"], p["ri"]
            )
            search_map = std_map * np.asarray(ring_mask)
        peaks = peak_local_max(
            search_map, min_distance=p["min_dist"],
            num_peaks=p["n_peaks"],
        )
        if len(peaks) == 0:
            raise ValueError("no peaks found for clustering features")
        h, w = std_map.shape
        rad = int(p["rad"])
        template = np.ones((2 * rad + 1, 2 * rad + 1), np.float32)

        def factory():
            return sparse_template_multi_stack(
                mask_index=np.arange(len(peaks)),
                offsetY=peaks[:, 0] - rad, offsetX=peaks[:, 1] - rad,
                template=template, imageSizeY=h, imageSizeX=w,
            )

        feats = ctx.run_udf(self.dataset, ApplyMasksUDF(
            mask_factories=factory, mask_count=len(peaks),
        ), roi=roi)
        if cancelled():
            return AnalysisResultSet([])
        features = np.asarray(feats["intensity"].data)
        nav_shape = features.shape[:-1]
        flat = features.reshape(-1, features.shape[-1])
        # under an roi, cluster ONLY the selected positions — the
        # NaN fill must not become a zero-feature cluster member
        sel = np.isfinite(flat).all(axis=-1)
        from sklearn.cluster import AgglomerativeClustering
        conn = None
        try:
            from sklearn.feature_extraction.image import (
                grid_to_graph,
            )
            if len(nav_shape) == 2 and sel.all():
                # the grid connectivity only matches the full grid
                conn = grid_to_graph(*nav_shape)
        except Exception:
            pass
        labels = AgglomerativeClustering(
            n_clusters=int(p["n_clust"]), connectivity=conn,
        ).fit_predict(flat[sel])
        label_map = np.full(flat.shape[0], np.nan, np.float32)
        label_map[sel] = labels
        label_map = label_map.reshape(nav_shape)
        return AnalysisResultSet([
            AnalysisResult(
                raw_data=label_map,
                visualized=lambda: visualize_simple(label_map),
                key="intensity", title="cluster labels",
                desc="agglomerative clustering of diffraction "
                     "features",
            ),
        ])

    async def controller(self, cancel_id=None, executor=None,
                         job_is_cancelled=None, send_results=None,
                         ctx=None):
        """Analysis-owned web job controller with the REFERENCE's
        async signature (clust.py:182 + web/engine.py:176): drives
        the multi-pass clustering pipeline (StdDev -> peak features
        -> AgglomerativeClustering) off the event loop and streams
        the final result set via ``send_results``.  Accepts either a
        ready Context (``ctx=``, the web engine's spelling) or an
        ``executor`` like the reference."""
        import asyncio

        if ctx is None:
            from ..api import Context
            sync_exec = (
                executor.ensure_sync() if executor is not None
                else None
            )
            ctx = Context(executor=sync_exec)
        loop = asyncio.get_running_loop()
        result_set = await loop.run_in_executor(
            None, lambda: self.run_clustering(
                ctx, job_is_cancelled=job_is_cancelled,
            )
        )
        if send_results is not None:
            await send_results(result_set, True)
        return result_set

    def get_udf_results(self, udf_results, roi, damage):
        std = udf_results["std"].data
        return AnalysisResultSet([
            AnalysisResult(
                raw_data=std,
                visualized=lambda: visualize_simple(std),
                key="intensity", title="std",
                desc="standard deviation map (clustering runs via "
                     "run_clustering)",
            ),
        ], raw_results=udf_results)
