"""Record golden outputs from the *reference* implementation.

Runs /root/reference/src (LiberTEM) on CPU through import shims
(./shims: numba -> pure Python, sparseconverter/sparse -> minimal
numpy/scipy-backed stand-ins) over the BASELINE.json config family on
fixed-seed synthetic data (tests/golden_common.py), and writes .npz
goldens into tests/goldens/.

The committed goldens gate tests/test_parity_reference.py; this script
only needs re-running when a config is added (the reference tree is
read-only and frozen).

Usage:  python tests/ref_oracle/record_goldens.py
"""
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
TESTS = os.path.dirname(HERE)
sys.path.insert(0, os.path.join(HERE, "shims"))
sys.path.insert(0, "/root/reference/src")
sys.path.insert(0, TESTS)

import numpy as np  # noqa: E402

import golden_common as gc  # noqa: E402

GOLDEN_DIR = os.path.join(TESTS, "goldens")


def _runner(udfs, ds, executor, roi=None, corrections=None):
    from libertem.udf.base import UDFRunner

    return UDFRunner(udfs).run_for_dataset(
        ds, executor, roi=roi, corrections=corrections
    )


def main():
    from libertem.executor.inline import InlineJobExecutor
    from libertem.io.dataset.memory import MemoryDataSet
    from libertem import masks as ref_masks
    from libertem.udf.masks import ApplyMasksUDF
    from libertem.udf.sum import SumUDF
    from libertem.udf.sumsigudf import SumSigUDF
    from libertem.udf.logsum import LogsumUDF
    from libertem.udf.stddev import StdDevUDF
    from libertem.udf.com import CoMUDF
    from libertem.udf.raw import PickUDF
    from libertem.udf.FEM import FEMUDF
    from libertem.udf.crystallinity import CrystallinityUDF
    from libertem.analysis.radialfourier import radial_mask_factory
    from libertem.io.corrections import CorrectionSet
    import sparse

    executor = InlineJobExecutor()
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    data = gc.golden_data()
    h, w = gc.SIG
    ds = MemoryDataSet(data=data, num_partitions=4)
    ds = ds.initialize(executor)
    roi = gc.golden_roi()

    def save(name, **arrays):
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        np.savez_compressed(path, **arrays)
        print(f"saved {name}: " + ", ".join(
            f"{k}{v.shape}" for k, v in arrays.items()
        ))

    mp = gc.MASK_PARAMS

    # config #1: SumUDF + bright-field disk mask
    res = _runner([
        SumUDF(),
        ApplyMasksUDF(mask_factories=[
            lambda: ref_masks.circular(
                centerX=mp["cx"], centerY=mp["cy"],
                imageSizeX=w, imageSizeY=h, radius=mp["r_bf"],
            )
        ]),
    ], ds, executor)
    save(
        "sum_bf",
        sum_intensity=res.buffers[0]["intensity"].data,
        bf_intensity=res.buffers[1]["intensity"].data,
    )

    # config #2a: dense mask stack BF/ADF/HAADF + custom gradient
    dense_factories = [
        lambda: ref_masks.circular(mp["cx"], mp["cy"], w, h,
                                   mp["r_bf"]),
        lambda: ref_masks.ring(mp["cx"], mp["cy"], w, h,
                               mp["ro_adf"], mp["ri_adf"]),
        lambda: ref_masks.ring(mp["cx"], mp["cy"], w, h,
                               mp["ro_haadf"], mp["ri_haadf"]),
        lambda: ref_masks.gradient_x(w, h),
    ]
    res = _runner(
        [ApplyMasksUDF(mask_factories=dense_factories)], ds, executor
    )
    save("mask_stack_dense",
         intensity=res.buffers[0]["intensity"].data)

    # config #2b: same stack with an roi
    res = _runner(
        [ApplyMasksUDF(mask_factories=dense_factories)], ds, executor,
        roi=roi,
    )
    save("mask_stack_roi",
         intensity=res.buffers[0]["intensity"].data)

    # config #2c: sparse radial-bin stack, sparse.pydata path
    rp = gc.RADIAL_PARAMS

    def sparse_bins():
        return ref_masks.radial_bins(
            centerX=rp["cx"], centerY=rp["cy"], imageSizeX=w,
            imageSizeY=h, radius=rp["ro"], radius_inner=rp["ri"],
            n_bins=rp["n_bins"], use_sparse=True,
        )

    res = _runner([
        ApplyMasksUDF(
            mask_factories=sparse_bins, use_sparse="sparse.pydata",
            mask_count=rp["n_bins"],
        )
    ], ds, executor)
    save("mask_stack_sparse",
         intensity=res.buffers[0]["intensity"].data)

    # config #3a: CoM with rotation+flip correction
    cp = gc.COM_PARAMS
    res = _runner([CoMUDF.with_params(**cp)], ds, executor)
    b = res.buffers[0]
    save(
        "com",
        raw_com=b["raw_com"].data,
        field=b["field"].data,
        magnitude=b["magnitude"].data,
        divergence=b["divergence"].data,
        curl=b["curl"].data,
    )

    # config #3b: radial Fourier mask stack (sparse, complex)
    factory = radial_mask_factory(
        detector_y=h, detector_x=w, cx=rp["cx"], cy=rp["cy"],
        ri=rp["ri"], ro=rp["ro"], n_bins=rp["n_bins"],
        max_order=rp["max_order"], use_sparse=True,
    )
    res = _runner([
        ApplyMasksUDF(
            mask_factories=factory, use_sparse="sparse.pydata",
            mask_count=rp["n_bins"] * (rp["max_order"] + 1),
            mask_dtype=np.complex64,
        )
    ], ds, executor)
    save("radial_fourier",
         intensity=res.buffers[0]["intensity"].data)

    # statistics family
    res = _runner(
        [StdDevUDF(), SumSigUDF(), LogsumUDF()], ds, executor
    )
    save(
        "stats",
        var=res.buffers[0]["var"].data,
        std=res.buffers[0]["std"].data,
        mean=res.buffers[0]["mean"].data,
        sumsig=res.buffers[1]["intensity"].data,
        logsum=res.buffers[2]["logsum"].data,
    )

    # FEM + crystallinity (FFT ring integration)
    fp = gc.FEM_PARAMS
    kp = gc.CRYSTAL_PARAMS
    res = _runner([
        FEMUDF(center=fp["center"], rad_in=fp["rad_in"],
               rad_out=fp["rad_out"]),
        CrystallinityUDF(
            rad_in=kp["rad_in"], rad_out=kp["rad_out"],
            real_center=kp["real_center"], real_rad=kp["real_rad"],
        ),
    ], ds, executor)
    save(
        "fem_crystal",
        fem=res.buffers[0]["intensity"].data,
        crystal=res.buffers[1]["intensity"].data,
    )

    # PickUDF under a small roi
    pick_roi = np.zeros(int(np.prod(gc.NAV)), dtype=bool)
    pick_roi[[3, 77, 200]] = True
    res = _runner([PickUDF()], ds, executor,
                  roi=pick_roi.reshape(gc.NAV))
    save("pick", intensity=res.buffers[0]["intensity"].data)

    # corrections round trip on u16 data (dark/gain/excluded)
    data_u16 = gc.golden_data_u16()
    ds_u16 = MemoryDataSet(data=data_u16, num_partitions=4)
    ds_u16 = ds_u16.initialize(executor)
    dark, gain, excluded = gc.golden_corrections_arrays()
    corr = CorrectionSet(
        dark=dark, gain=gain,
        excluded_pixels=sparse.COO.from_numpy(excluded),
    )
    res = _runner([SumUDF(), StdDevUDF()], ds_u16, executor,
                  corrections=corr)
    save(
        "corrections",
        sum_intensity=res.buffers[0]["intensity"].data,
        var=res.buffers[1]["var"].data,
    )

    # per-frame mask shifts (aux data): the reference shifts the MASK
    # with truncating overlap slicing (masks.py:85) — subtle semantics
    # worth a golden
    from libertem.udf.base import UDF as RefUDF
    rng = np.random.default_rng(46)
    shift_vals = rng.integers(-5, 6, (int(np.prod(gc.NAV)), 2)).astype(
        np.int64
    )
    shifts_aux = RefUDF.aux_data(
        shift_vals, kind="nav", extra_shape=(2,), dtype=np.int64
    )
    res = _runner([
        ApplyMasksUDF(
            mask_factories=[
                lambda: ref_masks.circular(
                    mp["cx"], mp["cy"], w, h, mp["r_bf"]
                )
            ],
            shifts=shifts_aux, use_torch=False,
        )
    ], ds, executor)
    save("mask_shifts", intensity=res.buffers[0]["intensity"].data,
         shift_vals=shift_vals)

    # sync_offset on a raw file (positive and negative)
    import tempfile
    from libertem.io.dataset.raw import RawFileDataSet

    tmpdir = tempfile.mkdtemp()
    raw_path = os.path.join(tmpdir, "sync.raw")
    data.astype(np.float32).tofile(raw_path)
    outs = {}
    for name, off in (("pos", 3), ("neg", -3)):
        ds_s = RawFileDataSet(
            path=raw_path, dtype="float32",
            nav_shape=gc.NAV, sig_shape=gc.SIG, sync_offset=off,
        ).initialize(executor)
        r = _runner([SumUDF(), SumSigUDF()], ds_s, executor)
        outs[f"sum_{name}"] = r.buffers[0]["intensity"].data
        outs[f"sumsig_{name}"] = r.buffers[1]["intensity"].data
    save("sync_offset", **outs)

    # ---- format-decoder goldens ----------------------------------
    # Write synthetic detector files with OUR test encoders, decode
    # them with the REFERENCE's readers (numba kernels as pure
    # Python), and record the decoded frames: gates our decoders
    # against the reference's interpretation of the same bytes (the
    # class of bug the 24-bit MIB fix was).
    import tempfile

    # encoders duplicated from tests/test_mib.py (importing the test
    # module would pull libertem_tpu into the oracle environment)
    def _encode_r1(frames):
        n, n_pix = frames.shape
        out = np.zeros((n, n_pix // 8), dtype=np.uint8)
        for p in range(n_pix):
            stripe, byte, bit = p // 64, (p % 64) // 8, p % 8
            src = frames[:, p] & 1
            out[:, stripe * 8 + (7 - byte)] |= (
                src.astype(np.uint8) << bit
            )
        return out

    def _encode_r6(frames):
        n, n_pix = frames.shape
        return frames.reshape(n, -1, 8)[:, :, ::-1].reshape(
            n, n_pix
        ).astype(np.uint8)

    def _encode_r12(frames):
        n, n_pix = frames.shape
        reordered = frames.reshape(n, -1, 4)[:, :, ::-1].reshape(
            n, n_pix
        )
        return reordered.astype(">u2").view(np.uint8)

    from libertem.io.dataset.mib import MIBDataSet
    from libertem.udf.raw import PickUDF

    tmpdir = tempfile.mkdtemp()
    rng = np.random.default_rng(77)
    hb = 384
    mib_goldens = {}
    def _encode_r24(frames):
        msb = _encode_r12((frames >> 12) & 0xFFF)
        lsb = _encode_r12(frames & 0xFFF)
        return np.concatenate([msb, lsb], axis=1)

    # r1 is excluded: the reference's own mmap File sizing (u64
    # native dtype x full-pixel frame_size) trips its skip_end
    # assertion on these synthetic files; our r1 decoder is covered
    # by the independent round-trip test instead.
    cases = [
        ("r6", "R64", 6, 1,
         lambda fr: _encode_r6(fr.reshape(fr.shape[0], -1))),
        ("r12", "R64", 12, 1,
         lambda fr: _encode_r12(fr.reshape(fr.shape[0], -1))),
        ("r24", "R64", 24, 1,
         lambda fr: _encode_r24(fr.reshape(fr.shape[0], -1))),
        ("u16", "U16", 12, 1,
         lambda fr: fr.reshape(fr.shape[0], -1).astype(">u2")),
    ]
    # real Merlin chip geometry (256x256) — the reference's RAW
    # read-range machinery assumes it
    hsz, wsz = 256, 256
    for name, dtype_str, bd, chips, enc in cases:
        lim = {6: 64, 12: 4096, 24: 1 << 24}[bd]
        # 24-bit: the header declares the 12-bit sub-frame width,
        # i.e. 2x the real frame width (reference mib.py:836)
        real_w = wsz // 2 if bd == 24 else wsz
        # r24: SINGLE frame only — the reference's multi-frame r24
        # byte math is internally inconsistent (frame stride
        # sig_size*2 bytes vs 2 sub-frames read per frame), so only
        # frame 0 decodes correctly there; single-frame is the
        # consistent subset both implementations must agree on.
        n_f = 1 if bd == 24 else 4
        frames = rng.integers(0, lim, (n_f, hsz, real_w)).astype(
            np.uint32 if bd == 24
            else np.uint16 if bd >= 12 else np.uint8
        )
        # own subdir per case: the reference's multi-file discovery
        # globs sibling .mib files by trailing-digit pattern
        case_dir = os.path.join(tmpdir, name)
        os.makedirs(case_dir, exist_ok=True)
        path = os.path.join(case_dir, "acq1.mib")
        with open(path, "wb") as f:
            for i, fr in enumerate(frames):
                # trailing comma: the reference drops header parts
                # containing NUL padding, so the bit depth must be
                # comma-terminated to survive as parts[-1]
                head = (
                    f"MQ1,{i+1},{hb},{chips},{wsz},{hsz},"
                    f"{dtype_str},1x1,2x2,{bd},"
                ).encode("ascii")
                f.write(head.ljust(hb, b"\x00"))
                f.write(enc(fr[None]).tobytes())
        ds_m = MIBDataSet(
            path=path, nav_shape=(2, 2) if n_f == 4 else (1,)
        ).initialize(executor)
        if bd == 24:
            # the reference's native dtype for r24 is uint16, so
            # PickUDF wraps 24-bit values mod 2^16 there; the float
            # pipeline (SumUDF) decodes true 24-bit values — gate on
            # that instead
            r = _runner([SumUDF()], ds_m, executor)
            decoded = np.asarray(r.buffers[0]["intensity"].data)
        else:
            roi_m = np.ones((2, 2), dtype=bool)
            r = _runner([PickUDF()], ds_m, executor, roi=roi_m)
            decoded = np.asarray(r.buffers[0]["intensity"].data)
        mib_goldens[f"{name}_frames"] = frames
        mib_goldens[f"{name}_decoded"] = decoded
    save("mib_decode", **mib_goldens)

    print("all goldens recorded to", GOLDEN_DIR)


if __name__ == "__main__":
    main()
