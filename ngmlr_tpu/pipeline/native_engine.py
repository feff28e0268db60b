"""Driver for the native (C++) per-read assembly engine.

The engine (ngmlr_tpu/native/engine.cpp) runs the whole per-read long-read
pipeline — anchors → cLIS → segments → SV logic → reconciliation — in C++
threads, posting batched device requests (banded convex alignments, ungapped
scoring probes) through a wave gate. This module is the Python side of that
gate: it pulls each wave's packed request arrays, runs them through
DeviceContext (the same kernels the Python path uses), posts the results
back, and converts the engine's final records into the AlignmentRecord/Align
objects the SAM writer consumes.

The Python implementation (pipeline/longread.py) remains the oracle: the
default path falls back to it per-read on any engine-side failure, entirely
when the engine library is unavailable, and always for the --stdout debug
modes (whose dump ordering requires the serial Python path).
"""

import ctypes
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..align.cigar import Align
from ..native import get_engine_lib, RecordABI
from .longread import AlignmentRecord

FAILED = object()   # sentinel: read must be re-run through the Python path


class NativeEngine:
    def __init__(self, ref, cfg, params):
        lib = get_engine_lib()
        if lib is None:
            raise RuntimeError("native engine unavailable")
        self.lib = lib
        self.params = tuple(params)
        # keep every array the engine sees alive for the engine's lifetime
        self._codes = np.ascontiguousarray(ref.codes, dtype=np.uint8)
        self._sp = np.ascontiguousarray(ref.ref_start_pos, dtype=np.int64)
        self._cfg_d = np.asarray(
            [cfg.min_identity, cfg.min_residues, cfg.inv_score_ratio,
             cfg.max_segment_number_per_kb], dtype=np.float64)
        self._cfg_i = np.asarray(
            [cfg.min_inversion_length, cfg.read_part_length,
             cfg.max_matrix_size_mb, int(cfg.small_inversion_detection),
             int(cfg.low_quality_split), cfg.max_clis_runs,
             int(cfg.skip_align)], dtype=np.int64)
        self.h = lib.engine_create(
            self._cfg_d.ctypes.data, self._cfg_i.ctypes.data,
            self._codes.ctypes.data, len(self._codes),
            self._sp.ctypes.data, len(self._sp))

    def __del__(self):
        try:
            if getattr(self, "h", None):
                self.lib.engine_destroy(self.h)
        except Exception:
            pass

    # ------------------------------------------------------------------

    def run_batch(self, ctx, readbuf, reads: List, sb,
                  shorts: Optional[List] = None) -> List[object]:
        """Process a batch through the engine. `reads` = long reads (whose
        ScoredBatch `sb` rows cover them in order) followed by short reads;
        `shorts` is the per-short-read SubreadCandidates list (or None).
        Returns one outcome per read: (mapped, records) for long reads,
        (mapped, records, read_mq) for short reads, or FAILED."""
        lib = self.lib
        n = len(reads)
        n_short = len(shorts) if shorts else 0
        n_long = n - n_short
        if n == 0:
            return []

        read_len = np.asarray([r.length for r in reads], dtype=np.int64)
        buf_off = np.asarray([r.buf_offset for r in reads], dtype=np.int64)
        seq_refs = [r.seq for r in reads]          # keep bytes alive
        seqs = (ctypes.c_char_p * n)(*seq_refs)

        if sb is None:
            class _EmptySB:
                on_read = np.zeros(0, np.int64)
                mq = np.zeros(0, np.int32)
                counts = np.zeros(0, np.int64)
                loc = np.zeros(0, np.int64)
                rev = np.zeros(0, np.uint8)
                score = np.zeros(0, np.float32)
                n_subs = np.zeros(0, np.int32)
            sb = _EmptySB()
        n_subs = np.zeros(n, dtype=np.int32)
        n_subs[:n_long] = sb.n_subs
        short_counts = np.zeros(n, dtype=np.int64)
        if n_short:
            short_counts[n_long:] = [len(c.locations) for c in shorts]
            s_loc = np.concatenate(
                [np.ascontiguousarray(c.locations, dtype=np.int64)
                 for c in shorts]) if short_counts[n_long:].sum() else \
                np.zeros(0, np.int64)
            s_rev = np.concatenate(
                [np.ascontiguousarray(c.reverse, dtype=np.uint8)
                 for c in shorts]) if short_counts[n_long:].sum() else \
                np.zeros(0, np.uint8)
        else:
            s_loc = np.zeros(0, np.int64)
            s_rev = np.zeros(0, np.uint8)

        lib.engine_start_batch(
            self.h, n, read_len.ctypes.data, buf_off.ctypes.data,
            ctypes.cast(seqs, ctypes.c_void_p),
            n_subs.ctypes.data, sb.on_read.ctypes.data,
            sb.mq.ctypes.data, sb.counts.ctypes.data,
            sb.loc.ctypes.data, sb.rev.ctypes.data, sb.score.ctypes.data,
            short_counts.ctypes.data, s_loc.ctypes.data, s_rev.ctypes.data)

        apk_p = ctypes.c_void_p()
        na = ctypes.c_int64()
        spk_p = ctypes.c_void_p()
        ns = ctypes.c_int64()
        try:
            while lib.engine_wait_wave(self.h, ctypes.byref(apk_p),
                                       ctypes.byref(na), ctypes.byref(spk_p),
                                       ctypes.byref(ns)):
                self._run_wave(ctx, readbuf, apk_p, int(na.value), spk_p,
                               int(ns.value))
        except BaseException:
            # a driver-level failure (device error, tunnel drop) must not
            # leave engine threads blocked: abort unwinds every read with
            # ReadFailure (-> status 1 -> Python per-read fallback) and the
            # batch joins cleanly
            lib.engine_abort_batch(self.h)
            lib.engine_finish_batch(self.h)
            raise
        lib.engine_finish_batch(self.h)

        out: List[object] = []
        rec_abi = RecordABI()
        cg_p = ctypes.c_void_p()
        cg_n = ctypes.c_int64()
        md_p = ctypes.c_void_p()
        md_n = ctypes.c_int64()
        for ri in range(n):
            if lib.engine_read_status(self.h, ri) != 0:
                out.append(FAILED)
                continue
            mapped = bool(lib.engine_read_mapped(self.h, ri))
            nr = lib.engine_record_count(self.h, ri)
            records: List[AlignmentRecord] = []
            for j in range(nr):
                lib.engine_get_record(self.h, ri, j, ctypes.byref(rec_abi),
                                      ctypes.byref(cg_p), ctypes.byref(cg_n),
                                      ctypes.byref(md_p), ctypes.byref(md_n))
                a = Align()
                a.cigar = ctypes.string_at(cg_p, cg_n.value).decode()
                a.md = ctypes.string_at(md_p, md_n.value).decode()
                a.score = rec_abi.score
                a.identity = rec_abi.identity
                a.nm = rec_abi.nm
                a.mq = rec_abi.mq
                a.qstart = rec_abi.qstart
                a.qend = rec_abi.qend
                a.position_offset = rec_abi.position_offset
                a.alignment_length = rec_abi.alignment_length
                a.cigar_op_count = rec_abi.cigar_op_count
                a.first_ref_pos = rec_abi.first_ref_pos
                a.first_read_pos = rec_abi.first_read_pos
                a.last_ref_pos = rec_abi.last_ref_pos
                a.last_read_pos = rec_abi.last_read_pos
                a.skip = bool(rec_abi.skip)
                a.primary = bool(rec_abi.primary)
                a.sv_type = rec_abi.sv_type
                records.append(AlignmentRecord(
                    a, int(rec_abi.location), bool(rec_abi.reverse),
                    float(rec_abi.score)))
            if ri >= n_long:   # short-read outcome carries read_mq
                out.append((mapped, records, lib.engine_read_mq(self.h, ri)))
            else:
                out.append((mapped, records))
        return out

    # ------------------------------------------------------------------

    def _run_wave(self, ctx, readbuf, apk_p, na: int, spk_p, ns: int):
        """One wave: dispatch every align launch before the score wave's
        fetch (batcher._fire discipline — dispatch is async, fetches
        overlap), then post all results back to the engine."""
        lib = self.lib
        with ctx._stats_lock:
            ctx.stats["engine_waves"] = ctx.stats.get("engine_waves", 0) + 1
        a_scores = np.zeros(na, dtype=np.float32)
        a_bx = np.full(na, -1, dtype=np.int32)
        a_by = np.full(na, -1, dtype=np.int32)
        a_ok = np.zeros(na, dtype=np.uint8)
        ops_ptrs = (ctypes.c_void_p * max(na, 1))()
        ops_lens = np.zeros(max(na, 1), dtype=np.int64)
        keep = []   # keep ops row arrays alive through engine_post_results

        pend = None
        if na:
            apk = np.ctypeslib.as_array(
                ctypes.cast(apk_p, ctypes.POINTER(ctypes.c_int32)),
                shape=(na, 12)).copy()
            pend = ctx.align_dispatch_pk(apk, self.params, readbuf=readbuf)

        spend = None
        if ns:
            spk = np.ctypeslib.as_array(
                ctypes.cast(spk_p, ctypes.POINTER(ctypes.c_int32)),
                shape=(ns, 7)).copy()
            spend = ctx.score_dispatch_np(spk, readbuf=readbuf)

        # ONE fetch for the whole wave: the engine consumes align + score
        # results together (engine_post_results), so separate device_gets
        # only added a second ~25 ms tunnel round trip per wave
        a_res, s_np = ctx.fetch_waves_np(pend, spend)

        s_results = np.zeros(max(ns, 1), dtype=np.float32)
        if ns:
            s_results[:ns] = s_np

        if a_res is not None:
            scores, bx, by, _sx, _sy, okf, ops = a_res
            a_scores[:] = scores
            a_bx[:] = bx
            a_by[:] = by
            a_ok[:] = okf
            for i in range(na):
                if okf[i] and ops[i] is not None:
                    row = np.ascontiguousarray(ops[i])
                    keep.append(row)
                    ops_ptrs[i] = row.ctypes.data
                    ops_lens[i] = len(row)

        lib.engine_post_results(
            self.h, a_scores.ctypes.data, a_bx.ctypes.data, a_by.ctypes.data,
            a_ok.ctypes.data, ctypes.cast(ops_ptrs, ctypes.c_void_p),
            ops_lens.ctypes.data, s_results.ctypes.data)
        del keep
