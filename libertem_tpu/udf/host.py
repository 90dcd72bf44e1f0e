"""Host execution path for numpy-backend UDFs.

UDFs migrated from the reference often use numpy/scipy code that is
not jax-traceable (in-place slice mutation, data-dependent Python
control flow, scipy calls).  Declaring

    def get_backends(self):
        return (self.BACKEND_NUMPY,)

routes a UDF through this runner: blocks are processed on the host
CPU with the reference's *mutable-view* semantics
(``self.results.intensity[:] += ...`` works), while jax-backend UDFs
in the same ``run_udf`` call keep running on the device — one shared
read pass, two execution engines.

This mirrors the reference's CPU worker loop
(udf/base.py:2100 UDFPartRunner) but scoped to the block stream of
the TPU runner.  Host UDFs always receive whole frames (no sig
tiling) and run on BOTH loops: the single-device loop feeds them
each block's host copy, and the sharded loop feeds them the
host-side super-step assembly (each device shard playing the
partition role).  Only multi-host meshes are rejected — there each
process holds just a slice of the feed.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


class HostUDFRunner:
    def __init__(self, entries, prep):
        """entries: the _UDFPlanEntry objects of numpy-backend UDFs."""
        self.entries = entries
        self.prep = prep
        self.input_dtype = prep["input_dtype"]
        self.n_nav = prep["n_nav"]
        self.sig_shape = tuple(prep["meta"].dataset_shape.sig)
        from ..common.slice import Slice
        sig = prep["meta"].dataset_shape.sig
        self._whole_sig_slice = Slice.from_shape(
            tuple(sig), sig_dims=sig.dims
        )
        self._aux_uis = None

    def refresh_aux(self, prep):
        """(Re-)derive this runner's per-entry aux list from the live
        prep — called at construction and after a mid-run parameter
        patch rebuilt prep['aux_host']."""
        self.prep = dict(prep)
        if self._aux_uis is not None:
            self.prep["aux"] = [
                prep["aux_host"][ui] for ui in self._aux_uis
            ]

    # -- buffers ---------------------------------------------------------

    def init_global(self) -> list:
        out = []
        for entry in self.entries:
            bufs = {}
            for name in entry.nav_names:
                b = entry.decls[name]
                bufs[name] = np.zeros(
                    (self.n_nav,) + b.extra_shape, dtype=b.dtype
                )
            for name in entry.part_names:
                b = entry.decls[name]
                bufs[name] = np.zeros(b.shape, dtype=b.dtype)
            out.append(bufs)
        return out

    def init_partition(self) -> list:
        out = []
        for entry in self.entries:
            bufs = {}
            for name in entry.part_names:
                b = entry.decls[name]
                bufs[name] = np.zeros(b.shape, dtype=b.dtype)
            out.append(bufs)
        return out

    def bind_partition_views(self, global_bufs, part_bufs,
                             goff: int, n_sel: int):
        """Bind reference-style per-partition result + aux VIEWS on
        the host UDF instances for preprocess/postprocess (the
        reference's worker binds views around those calls,
        udf/base.py set_views_for_partition)."""
        from .base import UDFData, UDFParams

        for ei, entry in enumerate(self.entries):
            udf = entry.udf
            views = {}
            for name in entry.nav_names:
                views[name] = global_bufs[ei][name][
                    goff:goff + n_sel
                ]
            for name in entry.part_names:
                views[name] = part_bufs[ei][name]
            udf._host_mode = True
            udf.results = UDFData(views)
            aux_views = {
                k: np.asarray(arr[goff:goff + n_sel])
                for k, arr in self.prep["aux"][ei].items()
            } if self._aux_uis is not None else {}
            udf.params = UDFParams(udf._kwargs, aux_views)

    def unbind_views(self):
        from .base import UDFParams

        for entry in self.entries:
            entry.udf.results = None
            entry.udf.params = UDFParams(entry.udf._kwargs)

    # -- processing ------------------------------------------------------

    def process_block(
        self, global_bufs, part_bufs, block, goff: int,
        coords: np.ndarray, valid: int,
    ):
        from .base import UDFData, UDFParams
        from ..common.shape import Shape
        from ..common.slice import Slice

        meta = self.prep["meta"]
        sig = tuple(meta.dataset_shape.sig)
        corrections = meta.corrections
        if corrections is not None and corrections.have_corrections():
            x = corrections.apply_numpy(block[:valid]).astype(
                self.input_dtype, copy=False
            )
        else:
            # copy=False: the common case (feed already in
            # input_dtype) must not add a memcpy per block
            x = block[:valid].astype(self.input_dtype, copy=False)
        coords = coords[:valid]
        for ei, entry in enumerate(self.entries):
            udf = entry.udf
            udf._host_mode = True
            views = {}
            for name in entry.nav_names:
                views[name] = global_bufs[ei][name][
                    goff:goff + valid
                ]
            for name in entry.part_names:
                views[name] = part_bufs[ei][name]
            for name in entry.result_only_names:
                # only produced in get_results; None while processing
                views[name] = None
            aux_views = {}
            for k, arr in self.prep["aux"][ei].items():
                aux_views[k] = np.asarray(
                    arr[goff:goff + valid]
                )
            meta.tile_valid = np.ones(valid, dtype=bool)
            meta.valid_frames = valid
            meta.global_offset = goff
            backend = getattr(
                entry, "host_array_backend", "numpy"
            )
            meta.array_backend = backend
            # the host engine IS the reference's cpu worker
            prev_device_class = meta.device_class
            meta.device_class = "cpu"
            # host UDFs receive WHOLE frames unless the run's scheme
            # sig-splits (a dataset tileshape veto): then tile-method
            # UDFs iterate the scheme's sig slices like the
            # reference's per-tile dispatch (udf/base.py:2188)
            scheme = self.prep.get("scheme")
            sig_split = scheme is not None and len(scheme) > 1
            meta.sig_slice = self._whole_sig_slice
            udf.params = UDFParams(udf._kwargs, aux_views)
            try:
                if entry.method == "tile" and sig_split:
                    meta.coordinates = coords
                    self._process_sig_tiles(
                        entry, x, views, scheme, meta, goff, valid,
                        sig, global_bufs[ei], part_bufs[ei],
                    )
                elif entry.method in ("tile", "partition"):
                    udf.results = UDFData(views)
                    meta.coordinates = coords
                    # concrete flattened-nav Slice of this block
                    # (reference UDFMeta.slice, udf/base.py:419)
                    meta._slice = Slice(
                        origin=(goff,) + (0,) * len(sig),
                        shape=Shape((valid,) + sig,
                                    sig_dims=len(sig)),
                    )
                    if entry.method == "partition":
                        meta._partition_slice = meta._slice
                    xe = self._convert_backend(x, backend)
                    if entry.method == "tile":
                        meta.tiling_scheme_idx = 0
                        self._dispatch(udf.process_tile, xe)
                    else:
                        self._dispatch(udf.process_partition, xe)
                    self._writeback(
                        entry, udf.results, global_bufs[ei],
                        part_bufs[ei], goff, valid,
                    )
                else:  # frame mode
                    if sig_split:
                        from ..common.exceptions import UDFException
                        raise UDFException(
                            f"{type(udf).__name__} uses process_frame"
                            f", which needs whole frames, but the "
                            f"dataset forces sig-split tiles "
                            f"(tiling scheme has {len(scheme)} sig "
                            f"slices)"
                        )
                    for i in range(valid):
                        # 1-row VIEWS, not scalars: the reference's
                        # per-frame nav views keep the flat-nav axis
                        # so `self.results.x[:] = v` works for
                        # scalar buffers too
                        frame_views = {
                            n: views[n][i:i + 1]
                            for n in entry.nav_names
                        }
                        for n in entry.part_names:
                            frame_views[n] = views[n]
                        for n in entry.result_only_names:
                            frame_views[n] = None
                        frame_aux = {
                            k: v[i] for k, v in aux_views.items()
                        }
                        udf.params = UDFParams(
                            udf._kwargs, frame_aux
                        )
                        udf.results = UDFData(frame_views)
                        # (1, nav_dims) — the reference's frame-mode
                        # coordinates keep the leading frame axis
                        meta.coordinates = coords[i:i + 1]
                        meta._slice = Slice(
                            origin=(goff + i,) + (0,) * len(sig),
                            shape=Shape((1,) + sig,
                                        sig_dims=len(sig)),
                        )
                        self._dispatch(
                            udf.process_frame,
                            self._convert_backend(x[i], backend),
                        )
                        res = udf.results
                        # rebinding assignments (rather than in-place
                        # mutation of the views) need explicit
                        # write-back
                        for n in entry.nav_names:
                            if n in res._touched:
                                global_bufs[ei][n][goff + i] = (
                                    res._get(n)
                                )
                        for n in entry.part_names:
                            if n in res._touched:
                                part_bufs[ei][n][...] = res._get(n)
            finally:
                udf._host_mode = False
                meta.device_class = prev_device_class
                # meta is shared with traced entries of the same run:
                # never leak a stale concrete slice into their view
                meta._slice = None
                meta._partition_slice = None

    @staticmethod
    def _convert_backend(x: np.ndarray, backend: str):
        """Convert a dense host block to the UDF's declared array
        backend (reference TileConverter, udf/base.py:2189):
        pydata-sparse formats keep the (depth, *sig) shape, scipy
        formats are 2D and get the flattened-sig layout."""
        if backend in (None, "numpy"):
            return x
        b = str(backend)
        if b.startswith("sparse."):
            import sparse as pydata_sparse
            cls = getattr(pydata_sparse, b.split(".", 1)[1])
            return cls.from_numpy(x)
        if b.startswith("scipy.sparse"):
            import scipy.sparse as sp
            # scipy formats are 2D: tiles flatten sig; a 2D frame
            # passes through with its own shape
            flat = x.reshape(x.shape[0], -1) if x.ndim > 2 else x
            if "csc" in b:
                return sp.csc_matrix(flat)
            if "coo" in b:
                return sp.coo_matrix(flat)
            return sp.csr_matrix(flat)
        return x

    @staticmethod
    def _dispatch(fn, data):
        """Call a process function, translating AttributeErrors on
        removed DataTile attributes into the reference's guided
        message (udf/base.py:2196)."""
        try:
            return fn(data)
        except AttributeError as e:
            removed = {
                "tile_slice": "self.meta.slice",
                "scheme_idx": "self.meta.tiling_scheme_idx",
            }
            msg = e.args[0] if e.args else ""
            for r, repl in removed.items():
                if isinstance(msg, str) and r in msg:
                    raise AttributeError(
                        f"Attribute {r} for input tiles was removed. "
                        f"Please use {repl} instead."
                    ) from e
            raise

    def _process_sig_tiles(self, entry, x, views, scheme, meta,
                           goff, valid, sig, global_u, part_u):
        """Tile-method dispatch for a sig-split scheme: each sig
        slice becomes one contiguous tile (the reference's
        set_contiguous_views_for_tile semantics — sig-kind buffer
        views are contiguous copies of the sub-rectangle, written
        back after the call)."""
        from ..common.shape import Shape
        from ..common.slice import Slice
        from .base import UDFData

        udf = entry.udf
        backend = getattr(entry, "host_array_backend", "numpy")
        for k, sig_slice in scheme.slices:
            tile = self._convert_backend(
                np.ascontiguousarray(
                    x[(slice(None),) + sig_slice.get()]
                ),
                backend,
            )
            tile_views = dict(views)
            sig_wb = []
            for name in entry.part_names:
                if entry.decls[name].kind != "sig":
                    continue
                idx = sig_slice.get() + tuple(
                    slice(None)
                    for _ in entry.decls[name].extra_shape
                )
                cont = np.ascontiguousarray(views[name][idx])
                tile_views[name] = cont
                sig_wb.append((views[name], idx, cont))
            udf.results = UDFData(tile_views)
            meta.sig_slice = sig_slice
            meta.tiling_scheme_idx = k
            meta._slice = Slice(
                origin=(goff,) + tuple(sig_slice.origin),
                shape=Shape(
                    (valid,) + tuple(sig_slice.shape),
                    sig_dims=len(sig),
                ),
            )
            try:
                self._dispatch(udf.process_tile, tile)
            finally:
                res = udf.results
                for full, idx, cont in sig_wb:
                    full[idx] = cont
                # rebinding assignments on nav/single buffers
                for n in entry.nav_names:
                    if n in res._touched:
                        global_u[n][goff:goff + valid] = res._get(n)
                for n in entry.part_names:
                    if (
                        n in res._touched
                        and entry.decls[n].kind != "sig"
                    ):
                        part_u[n][...] = res._get(n)

    def _writeback(self, entry, res, global_u, part_u, goff, valid):
        for n in entry.nav_names:
            if n in res._touched:
                global_u[n][goff:goff + valid] = res._get(n)
        for n in entry.part_names:
            if n in res._touched:
                part_u[n][...] = res._get(n)

    def snapshot_init(self, global_bufs, goff, n_sel):
        """Copy each custom-merge entry's just-preprocessed nav rows:
        they become the merge's ``dest`` side (the reference's main-
        node buffer state before this partition merges,
        udf/base.py:2530 main-node preprocess + per-partition merge).
        Object rows are deep-copied — preprocess typically plants
        fresh mutable containers and src/dest must not alias."""
        import copy

        out = []
        for ei, entry in enumerate(self.entries):
            udf = entry.udf
            if not udf._has_custom_merge() or not entry.nav_names:
                out.append(None)
                continue
            snap = {}
            for n in entry.nav_names:
                rows = global_bufs[ei][n][goff:goff + n_sel]
                snap[n] = (
                    copy.deepcopy(rows)
                    if rows.dtype == object else rows.copy()
                )
            out.append(snap)
        return out

    def merge_partition(self, global_bufs, part_bufs,
                        goff0=None, n_sel=None, init_rows=None,
                        runs=None):
        """Fold one partition/shard's buffers into the global state.

        ``runs`` (block-cyclic live-on-mesh shards): a list of
        (goff, n) windows the shard owns instead of one contiguous
        [goff0, goff0+n_sel) window — custom merges see the
        CONCATENATION of the runs' nav rows as src, and dest is
        written back per run.  sig/single part buffers merge exactly
        once either way.
        """
        from .base import UDFData, UDFParams
        if runs is not None:
            assert goff0 is None and init_rows is None
        have_nav_window = goff0 is not None or runs is not None
        for ei, entry in enumerate(self.entries):
            udf = entry.udf
            custom = udf._has_custom_merge()
            if not entry.part_names and not (
                custom and entry.nav_names and have_nav_window
            ):
                continue
            udf._host_mode = True
            try:
                dest_d = {
                    n: global_bufs[ei][n]
                    for n in entry.part_names
                }
                src_d = {
                    n: part_bufs[ei][n]
                    for n in entry.part_names
                }
                nav_rows = {}
                if custom and runs is not None:
                    # block-cyclic shard: src nav rows are the
                    # concatenation of the shard's runs; dest starts
                    # zeroed and is written back per run
                    for n in entry.nav_names:
                        src_d[n] = np.concatenate([
                            global_bufs[ei][n][lo:lo + cnt]
                            for lo, cnt in runs
                        ])
                        dest_d[n] = np.zeros_like(src_d[n])
                        nav_rows[n] = None  # written back below
                elif custom and goff0 is not None:
                    # reference semantics: a CUSTOM merge receives the
                    # nav buffers too — dest is the main-node buffer
                    # window in its pre-merge state (allocation +
                    # preprocess initialization — see snapshot_init),
                    # src the partition's result — and the merge is
                    # responsible for writing every buffer
                    # (udf/base.py:1420).  The host loop processes
                    # straight into global rows, so hand those rows to
                    # src and the snapshot (zeros when none was taken)
                    # to dest, then write dest back.
                    snap = (
                        init_rows[ei]
                        if init_rows is not None else None
                    )
                    for n in entry.nav_names:
                        rows = global_bufs[ei][n][
                            goff0:goff0 + n_sel
                        ]
                        src_d[n] = rows.copy()
                        dest_d[n] = (
                            snap[n] if snap is not None
                            else np.zeros_like(src_d[n])
                        )
                        nav_rows[n] = rows
                dest = UDFData(dest_d)
                src = UDFData(src_d)
                aux_all = self.prep.get("aux")
                if aux_all is not None and (
                    goff0 is not None or runs is not None
                ):
                    # merge sees the partition's aux rows like the
                    # process functions do (reference: views are set
                    # for the partition around merge,
                    # test_dynamic_parameter_aux_data)
                    if runs is not None:
                        aux_views = {
                            k: np.concatenate([
                                np.asarray(arr[lo:lo + cnt])
                                for lo, cnt in runs
                            ])
                            for k, arr in aux_all[ei].items()
                        }
                    else:
                        aux_views = {
                            k: np.asarray(arr[goff0:goff0 + n_sel])
                            for k, arr in aux_all[ei].items()
                        }
                    udf.params = UDFParams(udf._kwargs, aux_views)
                udf.merge(dest, src)
                for n in entry.part_names:
                    if n in dest._touched:
                        global_bufs[ei][n][...] = dest._get(n)
                for n, rows in nav_rows.items():
                    merged_rows = dest._get(n)
                    if rows is None:
                        # scatter the concatenated result back into
                        # the shard's runs
                        off = 0
                        for lo, cnt in runs:
                            global_bufs[ei][n][lo:lo + cnt] = (
                                merged_rows[off:off + cnt]
                            )
                            off += cnt
                    else:
                        rows[...] = merged_rows
            finally:
                udf._host_mode = False
                udf.params = UDFParams(udf._kwargs)
