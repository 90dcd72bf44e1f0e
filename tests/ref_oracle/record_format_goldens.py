"""Record reference-decoder goldens for every self-contained binary
format (VERDICT round-2 gap #2: format tests were self-referential).

Writes synthetic files with tests/format_encoders.py (numpy-only
encoders shared with the test suite), decodes them with the
*reference* implementation (/root/reference/src under the ./shims
environment), and records the decoded output into
tests/goldens/fmt_decode.npz.

Small outputs are stored verbatim; the K2IS full-sensor decode
(3x1860x2048) is stored as a sha256 plus a corner crop.  File bytes
are NOT stored — the parity test regenerates them from the same
encoders + seeds and a stored bytes-hash guards against encoder
drift.

Formats whose reference reader requires ncempy (MRC, SER, DM) cannot
be oracle-recorded here: reimplementing ncempy inside the shim would
just test our parser against another parser written by the same
hand.  Those stay covered by spec-derived round-trip tests.

Usage:  python tests/ref_oracle/record_format_goldens.py
"""

import os
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
TESTS = os.path.dirname(HERE)
sys.path.insert(0, os.path.join(HERE, "shims"))
sys.path.insert(0, "/root/reference/src")
sys.path.insert(0, TESTS)

import numpy as np  # noqa: E402

import format_encoders as fe  # noqa: E402
from format_encoders import dir_hash, ramp, sha  # noqa: E402

GOLDEN_DIR = os.path.join(TESTS, "goldens")


def main():
    from libertem.executor.inline import InlineJobExecutor
    from libertem.udf.raw import PickUDF
    from libertem.udf.sum import SumUDF
    from libertem.udf.sumsigudf import SumSigUDF

    executor = InlineJobExecutor()
    out = {}

    def pick_all(ds, n_nav, with_corrections=False):
        roi = np.ones(n_nav, dtype=bool)
        from libertem.udf.base import UDFRunner
        # corrections auto-fetch lives at the Context level
        # (reference api.py:1278), not in UDFRunner — replicate it
        corr = ds.get_correction_data() if with_corrections else None
        res = UDFRunner([PickUDF()]).run_for_dataset(
            ds, executor, roi=roi, corrections=corr
        )
        return np.asarray(res.buffers[0]["intensity"].data)

    def run_sums(ds):
        from libertem.udf.base import UDFRunner
        res = UDFRunner([SumUDF(), SumSigUDF()]).run_for_dataset(
            ds, executor
        )
        return (
            np.asarray(res.buffers[0]["intensity"].data),
            np.asarray(res.buffers[1]["intensity"].data),
        )

    # ---- K2IS: 12-bit packing + 8-sector assembly + sync ----------
    from libertem.io.dataset.k2is import K2ISDataSet

    k2_frames = ramp(2, 1860, 2048, 4096, seed=1).astype(np.uint16)
    with tempfile.TemporaryDirectory() as tmp:
        path0 = fe.write_k2is_sectors(tmp, k2_frames)
        out["k2is_files_sha"] = dir_hash(tmp)
        ds = K2ISDataSet(path=path0, nav_shape=(2,)).initialize(
            executor
        )
        dec = pick_all(ds, 2).astype(np.uint16)
    out["k2is_decoded_sha"] = sha(dec)
    out["k2is_decoded_corner"] = dec[:, :32, :48].copy()
    out["k2is_matches_input"] = np.array(
        np.array_equal(dec, k2_frames)
    )
    print("k2is: decoded == input:", out["k2is_matches_input"])

    # ---- FRMS6: folded-frame unfold (+ dark subtraction) ----------
    from libertem.io.dataset.frms6 import FRMS6DataSet

    fold_h, fold_w = 6, 16
    dark = ramp(2, fold_h, fold_w, 50, seed=2).astype(np.uint16)
    sig = (ramp(12, fold_h, fold_w, 900, seed=3) + 100).astype(
        np.uint16
    )
    with tempfile.TemporaryDirectory() as tmp:
        fe.write_frms6(os.path.join(tmp, "acq_000.frms6"), dark)
        fe.write_frms6(os.path.join(tmp, "acq_001.frms6"), sig)
        with open(os.path.join(tmp, "acq.hdr"), "w") as f:
            f.write(
                "[measurementInfo]\n"
                "darkframes = 2\n"
                "signalframes = 12\n"
                "gain = 1\n"
                "dwelltimemicroseconds = 10\n"
                "stemimagesize = 4x3\n"
                'readoutmode = "bin: 1, windowing: 1 x 1"\n'
            )
        out["frms6_files_sha"] = dir_hash(tmp)
        hdr_path = os.path.join(tmp, "acq.hdr")
        ds_raw = FRMS6DataSet(
            path=hdr_path, enable_offset_correction=False,
        ).initialize(executor)
        out["frms6_raw_decoded"] = pick_all(ds_raw, 12)
        ds_corr = FRMS6DataSet(
            path=hdr_path, enable_offset_correction=True,
        ).initialize(executor)
        out["frms6_corrected_decoded"] = pick_all(
            ds_corr, 12, with_corrections=True
        )
    print("frms6 decoded:", out["frms6_raw_decoded"].shape,
          out["frms6_raw_decoded"].dtype)

    # ---- SEQ ------------------------------------------------------
    from libertem.io.dataset.seq import SEQDataSet

    seq_frames = ramp(9, 12, 16, 4096, seed=4).astype(np.uint16)
    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "t.seq")
        fe.write_seq(p, seq_frames)
        out["seq_files_sha"] = dir_hash(tmp)
        ds = SEQDataSet(path=p, nav_shape=(3, 3)).initialize(executor)
        out["seq_decoded"] = pick_all(ds, 9)
    print("seq decoded:", out["seq_decoded"].shape)

    # ---- TVIPS ----------------------------------------------------
    from libertem.io.dataset.tvips import TVIPSDataSet

    tv_frames = ramp(8, 14, 16, 60000, seed=5).astype(np.uint16)
    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "ser_000.tvips")
        fe.write_tvips(p, tv_frames)
        out["tvips_files_sha"] = dir_hash(tmp)
        ds = TVIPSDataSet(path=p, nav_shape=(2, 4)).initialize(
            executor
        )
        out["tvips_decoded"] = pick_all(ds, 8)
    print("tvips decoded:", out["tvips_decoded"].shape)

    # ---- BLO ------------------------------------------------------
    from libertem.io.dataset.blo import BloDataSet

    blo_frames = ramp(12, 16, 16, 256, seed=6).astype(np.uint8)
    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "t.blo")
        fe.write_blo(p, blo_frames, nav=(3, 4))
        out["blo_files_sha"] = dir_hash(tmp)
        ds = BloDataSet(path=p).initialize(executor)
        out["blo_decoded"] = pick_all(ds, 12)
    print("blo decoded:", out["blo_decoded"].shape)

    # ---- EMPAD (junk-row trimming) --------------------------------
    from libertem.io.dataset.empad import EMPADDataSet

    ep_frames = (
        ramp(24, 128, 128, 100000, seed=7).astype(np.float32) / 7.0
    )
    with tempfile.TemporaryDirectory() as tmp:
        xml = fe.write_empad(tmp, ep_frames, nav=(4, 6))
        out["empad_files_sha"] = dir_hash(tmp)
        ds = EMPADDataSet(path=xml).initialize(executor)
        dec = pick_all(ds, 24)
        out["empad_decoded_sha"] = sha(dec.astype(np.float32))
        out["empad_decoded_corner"] = dec[:, :16, :16].astype(
            np.float32
        )
        out["empad_matches_input"] = np.array(
            np.array_equal(dec.astype(np.float32), ep_frames)
        )
    print("empad: decoded == input:", out["empad_matches_input"])

    # ---- RAW CSR --------------------------------------------------
    from libertem.io.dataset.raw_csr import RawCSRDataSet

    n, sig_shape = 12, (8, 9)
    n_pix = sig_shape[0] * sig_shape[1]
    mask = ramp(1, n, n_pix, 10, seed=8)[0] < 2  # ~20% density
    dense = (ramp(1, n, n_pix, 99, seed=9)[0] + 1) * mask
    dense = dense.astype(np.int32)
    with tempfile.TemporaryDirectory() as tmp:
        toml_path = fe.write_raw_csr(
            tmp, dense, nav=(3, 4), sig=sig_shape
        )
        out["raw_csr_files_sha"] = dir_hash(tmp)
        ds = RawCSRDataSet(path=toml_path).initialize(executor)
        s, ss = run_sums(ds)
        out["raw_csr_sum"] = s
        out["raw_csr_sumsig"] = ss
    print("raw_csr sums:", out["raw_csr_sum"].shape,
          out["raw_csr_sumsig"].shape)

    path = os.path.join(GOLDEN_DIR, "fmt_decode.npz")
    np.savez_compressed(path, **out)
    print("saved", path, os.path.getsize(path), "bytes")


if __name__ == "__main__":
    main()
