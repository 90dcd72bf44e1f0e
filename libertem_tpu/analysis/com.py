"""Center-of-mass analysis
(reference: libertem/analysis/com.py:188, id CENTER_OF_MASS;
parameter-guess RPC :139).
"""
from __future__ import annotations

import numpy as np

from ..common.analysis import AnalysisResult, AnalysisResultSet
# re-exports matching the reference's analysis/com.py:16 surface
from ..udf.com import (  # noqa: F401
    CoMUDF, GuessResult, apply_correction, center_shifts,
    com_masks_factory, com_masks_generic, coordinate_check, curl_2d,
    divergence, guess_corrections, magnitude,
)
from ..viz.base import rgb_from_2dvector, visualize_simple
from .base import BaseAnalysis


class COMAnalysis(BaseAnalysis, id_="CENTER_OF_MASS"):
    def get_parameters(self, parameters: dict) -> dict:
        h, w = tuple(self.dataset.shape.sig)
        # the GUI sends explicit nulls for untouched fields:
        # .get(k, default) would keep None, which later crashes the
        # guess RPC's float(old['cy'])
        cx = parameters.get("cx")
        cy = parameters.get("cy")
        return {
            "cx": w / 2 if cx is None else cx,
            "cy": h / 2 if cy is None else cy,
            "r": parameters.get("r"),
            "ri": parameters.get("ri"),
            "flip_y": parameters.get("flip_y") or False,
            "scan_rotation": parameters.get("scan_rotation") or 0.0,
            **{k: v for k, v in parameters.items()
               if k not in ("cx", "cy", "r", "ri", "flip_y",
                            "scan_rotation")},
        }

    def get_udf(self):
        p = self.parameters
        return CoMUDF.with_params(
            cy=p["cy"], cx=p["cx"], r=p["r"], ri=p["ri"],
            scan_rotation=p["scan_rotation"], flip_y=p["flip_y"],
        )

    def need_rerun(self, old_params: dict, new_params: dict) -> bool:
        """flip_y / scan_rotation only change the post-processing of
        the raw mask result, so the UDF pass can be skipped (reference
        com.py:346)."""
        ignore = {"flip_y", "scan_rotation"}
        strip = lambda p: {
            k: v for k, v in p.items() if k not in ignore
        }
        return strip(old_params) != strip(new_params)

    def get_udf_results(self, udf_results, roi, damage):
        """Derived fields are recomputed HERE from the uncorrected
        raw shifts with THIS analysis's flip_y/scan_rotation (not
        taken from the UDF's own post-processing) — that's what makes
        the need_rerun short-circuit sound (reference
        get_generic_results com.py:200)."""
        from ..udf.com import apply_com_correction

        p = self.parameters
        dmg = self.nav_damage(damage)
        raw_shifts = np.asarray(udf_results["raw_shifts"].data)
        is_c = raw_shifts.dtype.kind == "c"
        raw_shifts = raw_shifts.astype(
            np.complex128 if is_c else np.float64
        )
        sy, sx = raw_shifts[..., 0], raw_shifts[..., 1]
        fy, fx = apply_com_correction(
            sy, sx, p["scan_rotation"], p["flip_y"]
        )
        if is_c:
            # complex dataset: the reference emits the split channels
            # only (com.py:213 COMResultSet complex branch)
            chans = []
            for key, title, arr in (
                ("x_real", "x [real]", np.real(fx)),
                ("y_real", "y [real]", np.real(fy)),
                ("x_imag", "x [imag]", np.imag(fx)),
                ("y_imag", "y [imag]", np.imag(fy)),
            ):
                arr32 = arr.astype(np.float32)
                chans.append(AnalysisResult(
                    raw_data=arr32,
                    visualized=(
                        lambda a=arr32: visualize_simple(
                            a, damage=dmg
                        )
                    ),
                    key=key, title=title,
                    desc=f"{title} component of the center",
                ))
            return AnalysisResultSet(
                chans, raw_results=udf_results
            )
        # derive in f64 FIRST, cast after — bit-identical with the
        # UDF's own get_results post-processing
        mag = np.sqrt(fy ** 2 + fx ** 2).astype(np.float32)
        if fy.ndim == 2 and min(fy.shape) >= 2:
            div = (
                np.gradient(fy, axis=0) + np.gradient(fx, axis=1)
            ).astype(np.float32)
            curl = (
                np.gradient(fy, axis=1) - np.gradient(fx, axis=0)
            ).astype(np.float32)
        else:
            div = np.full_like(mag, np.nan)
            curl = np.full_like(mag, np.nan)
        fy = fy.astype(np.float32)
        fx = fx.astype(np.float32)
        return AnalysisResultSet([
            AnalysisResult(
                # reference layout (com.py:243): an (x, y) TUPLE —
                # np.asarray gives (2, *nav); excluded from file
                # downloads like the reference
                raw_data=(fx, fy),
                visualized=lambda: rgb_from_2dvector(fy, fx),
                key="field", title="field",
                desc="center-of-mass shift vector field",
                include_in_download=False,
            ),
            AnalysisResult(
                raw_data=mag,
                visualized=lambda: visualize_simple(mag, damage=dmg),
                key="magnitude", title="magnitude",
                desc="magnitude of the CoM shift",
            ),
            AnalysisResult(
                raw_data=div,
                visualized=lambda: visualize_simple(div, damage=dmg),
                key="divergence", title="divergence",
                desc="divergence of the CoM field",
            ),
            AnalysisResult(
                raw_data=curl,
                visualized=lambda: visualize_simple(curl, damage=dmg),
                key="curl", title="curl",
                desc="curl of the CoM field",
            ),
            AnalysisResult(
                raw_data=fx,
                visualized=lambda: visualize_simple(fx, damage=dmg),
                key="x", title="x shift",
                desc="x component of the CoM shift",
            ),
            AnalysisResult(
                raw_data=fy,
                visualized=lambda: visualize_simple(fy, damage=dmg),
                key="y", title="y shift",
                desc="y component of the CoM shift",
            ),
        ], raw_results=udf_results)

    @classmethod
    def get_rpc_definitions(cls) -> dict:
        return {"guess_parameters": GuessParametersProc}


class GuessParametersProc:
    """CoM parameter-guess RPC
    (reference: com.py:139 ParameterGuessProc).

    DELIBERATE DEVIATION: when the guess introduces a flip, the
    reference still ADDS the rotations (com.py:183) — but with
    T(th, f) = R(th)·F(f), composing T_guess∘T_old requires
    conjugating the old rotation through the flip
    (F·R(th) = R(-th)·F), i.e. R(g - o)·F(!f_o).  The additive rule
    only converges after extra guess iterations; the conjugated one
    is exact in a single step (test:
    test_com_guess_flip_conjugates_rotation)."""

    async def __call__(self, rpc_context):
        """``rpc_context`` follows the reference RPCContext protocol
        (web/rpc.py:22): find the CoM analysis in the compound
        analysis, run it if it has no results yet, then guess from
        its y/x shift fields (reference com.py:139
        ParameterGuessProc)."""
        from ..udf.com import apply_com_correction

        comp_ana = rpc_context.get_compound_analysis()
        analyses = comp_ana["details"]["analyses"]
        analysis_details = [
            rpc_context.get_analysis_details(a) for a in analyses
        ]
        com_analyses = [
            a for a in analysis_details
            if a["details"]["analysisType"] == "CENTER_OF_MASS"
        ]
        if not com_analyses:
            return {
                "status": "error",
                "message": "no CoM analysis found",
            }
        com_analysis_id = com_analyses[0]["analysis"]
        if not rpc_context.have_analysis_results(com_analysis_id):
            # run with the current analysis parameters as set in
            # the GUI
            await rpc_context.run_analysis(com_analysis_id)
        result_info = rpc_context.get_analysis_results(
            com_analysis_id
        )
        res = result_info.results
        old = result_info.details["parameters"]
        y = res["y"].raw_data
        x = res["x"].raw_data
        guess = await rpc_context.run_sync(guess_corrections, y, x)
        # the y/x fields already have the analysis's current
        # rotation/flip applied, so the guess is *relative* to the
        # current parameters.  Convert to absolute GUI values so a
        # stale GUI state can't double-apply (reference com.py:166):
        # flip composes by XOR, rotation adds, and the guessed mean
        # center must be backtransformed into raw detector
        # coordinates (forward is flip-then-rotate, so the inverse is
        # rotate(-theta) then unflip).
        old_rot = float(old.get("scan_rotation", 0.0) or 0.0)
        old_flip = bool(old.get("flip_y", False))
        iy, ix = apply_com_correction(
            np.array([guess["cy"]]), np.array([guess["cx"]]),
            -old_rot, False,
        )
        if old_flip:
            iy = -iy
        # rotation composition: with T(th, f) = R(th)·F(f) the
        # combined transform T(th_g, f_g)·T(th_o, f_o) equals
        # R(th_g + th_o)·F(f_o)      when f_g is False, but
        # R(th_g - th_o)·F(not f_o)  when f_g is True
        # (a flip conjugates rotation: F·R(th) = R(-th)·F)
        if guess["flip_y"]:
            new_rot = guess["scan_rotation"] - old_rot
        else:
            new_rot = guess["scan_rotation"] + old_rot
        return {"status": "ok", "guess": {
            "cy": float(old["cy"]) + float(iy[0]),
            "cx": float(old["cx"]) + float(ix[0]),
            "scan_rotation": new_rot,
            "flip_y": old_flip != guess["flip_y"],
        }}
