"""Device-resident compute engine: genome + read batch live in HBM; every
kernel input is a handful of scalars per problem and every output is a few
bytes per problem.

Motivation (measured on the target setup): the host<->device tunnel runs at
~25 ms round-trip latency and ~50-90 MB/s. The original design uploaded
decoded reference windows / corridor row tables and downloaded packed
direction planes — hundreds of KB to MB per alignment. This engine removes
all of it:

  * the encoded genome (uint8 codes, SequenceProvider enc4 space: A=0,T=1,
    G=2,C=3,N=4) is uploaded ONCE; reference windows are gathered on device
    from (decode_start, diff, hi) descriptors that reproduce
    DecodeRefSequence / DecodeRefSequenceExact byte-for-byte
    (/root/reference/src/SequenceProvider.cpp:493-625) with 'x' as code 5,
  * the read batch is uploaded once per batch (code space as above); every
    query anywhere in the pipeline is a (start, len, revcomp) view of a read
    (AlignmentBuffer::extractReadSeq semantics, AlignmentBuffer.cpp:1515-1549),
  * all four corridor generators of AlignmentBuffer.cpp:52-197 are affine
    formulas — corridors travel as (mode, 2 floats, 2 ints) and the per-row
    offsets / per-wavefront row windows are recomputed on device,
  * backtracking runs ON DEVICE as a reverse sweep over the direction planes
    (which never leave HBM): a lax.scan from the last anti-diagonal down to 0
    carries (x, y) per problem and emits at most one CIGAR op per wavefront —
    no HBM gathers, pure [B, L] vector ops. The op stream crosses the tunnel
    2-bit-packed (<= T/4 bytes per alignment).

The wavefront fill itself reproduces ConvexAlignFast::fwdFillMatrix
(/root/reference/src/ConvexAlignFast.cpp:606-774) exactly, including f32
arithmetic, the D-run > I-run > diag > D > I > STOP tie-break and the
first-in-row-major-order best-cell rule; see ngmlr_tpu.ops.convex for the
derivation of the anti-diagonal formulation (this file replaces its mod-L
lane ring with a window-aligned layout: lane l of wavefront t holds row
ymin(t)+l, which turns all neighbor reads into shifts by {0,1,2} and all
sequence reads into contiguous dynamic slices).
"""

from dataclasses import dataclass
import functools
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

STOP, DIAG, INS, DEL = 0, 1, 2, 3
XCODE = 5            # 'x' (undecodable) — never equals a query code
NCODE = 4

# corridor modes (AlignmentBuffer.cpp:52-197)
CORRIDOR_FULL, CORRIDOR_LINEAR, CORRIDOR_ENDPOINTS, CORRIDOR_ANCHORS = 0, 1, 2, 3

MAX_SEQ_LEN = 100000  # ssw guard (StrippedSW.h:87)


# Genome positions are uint32 on device (human-scale concat coordinates
# exceed int31 but fit uint32 — the reference itself caps a TableUnit at
# 2^32-1 positions, PrefixTable.cpp:24). x64 mode is deliberately NOT
# enabled: the axon Mosaic compile helper rejects gridded Pallas kernels
# under x64, and nothing here needs int64 on device.


def _enable_compilation_cache():
    try:
        d = os.environ.get("NGMLR_TPU_JAX_CACHE",
                           os.path.expanduser("~/.cache/ngmlr_tpu_jax"))
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _pow2(x: int, lo: int) -> int:
    v = lo
    while v < x:
        v *= 2
    return v


def _size_class(x: int, lo: int) -> int:
    """Smallest bucket >= x from the {2^n, 1.5*2^n} size classes — halves
    the average padding waste of pure pow2 at a modest shape-count cost."""
    v = lo
    while True:
        if x <= v:
            return v
        if x <= v + v // 2:
            return v + v // 2
        v *= 2


# ---------------------------------------------------------------------------
# descriptors
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class RefDesc:
    """Device recipe for a decoded reference window of length W:
    window[i] = CODE2CHAR[genome[ds + i - diff]] if (i >= diff and i < W and
    ds + i - diff < hi) else 'x'. Produced by ReferenceGenome.decode_*_desc.

    For multi-unit genomes (> one 2^31 slab; the reference's TableUnit
    analog, PrefixTable.h:58-75) ds/hi are UNIT-LOCAL and `unit` names the
    device genome plane; the packers carry the unit in the W column's high
    bits (W < 2^28 asserted at build)."""
    ds: int
    diff: int
    hi: int
    W: int
    unit: int = 0


@dataclass(frozen=True)
class QryDesc:
    """Query = read byte range [start, start+length) of the batch read
    buffer, reverse-complemented iff rev."""
    start: int          # absolute offset into the batch read-code buffer
    length: int
    rev: bool


@dataclass
class ScoreProblem:
    ref: RefDesc
    qry: QryDesc
    result: float = 0.0


@dataclass
class AlignProblem:
    ref: RefDesc
    qry: QryDesc
    corridor_mode: int
    corridor_f: Tuple[float, float]    # (k, d) / (k_align, corridor_right)
    corridor_i: int                    # full: base offset; linear: corridor//2
    width: int
    # results:
    score: float = 0.0
    best_x: int = -1
    best_y: int = -1
    stop_x: int = -1
    stop_y: int = -1
    ok: bool = False                   # backtrack reached STOP inside corridor
    ops: Optional[np.ndarray] = None   # packed op stream [ceil(T/4)] uint8

    @property
    def T(self) -> int:
        return self.ref.W + self.qry.length - 1


# ---------------------------------------------------------------------------
# device context
# ---------------------------------------------------------------------------

_current: Optional["DeviceContext"] = None


def set_current(ctx: Optional["DeviceContext"]):
    global _current
    _current = ctx


def current() -> Optional["DeviceContext"]:
    return _current


class DeviceContext:
    """Holds the device-resident genome and the per-batch read buffer.

    Multi-chip (single-process): with ``n_devices > 1`` (the CLI maps
    ``-t/--threads`` here — the TPU analog of the reference's worker pool,
    NGM.cpp:334-348) every score/align wave is sharded data-parallel over a
    1-D device mesh via shard_map: genome + read buffer replicated,
    problem batches split along the batch axis, per-wave problem counters
    psum'd on-mesh. Results are bit-identical to single-device execution
    (same kernels, same per-problem math, order preserved on gather)."""

    def __init__(self, genome_codes: np.ndarray,
                 n_devices: Optional[int] = None,
                 unit_spec: Optional[Tuple[int, int, int]] = None):
        _enable_compilation_cache()
        avail = jax.local_device_count()
        nd_env = os.environ.get("NGMLR_TPU_DEVICES")
        if nd_env:
            nd = int(nd_env)
        elif n_devices is not None:
            nd = int(n_devices)
        else:
            nd = 1
        if nd > avail:
            import sys as _sys
            _sys.stderr.write(
                "ngmlr-tpu: %d devices requested, %d available — using %d\n"
                % (nd, avail, avail))
            nd = avail
        self.mesh = None
        self._repl = None
        if nd > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec
            # local_devices, not devices: under multi-host jax.distributed
            # the global list starts with process 0's (non-addressable
            # here) devices
            self.mesh = Mesh(np.asarray(jax.local_devices()[:nd]), ("dp",))
            self._repl = NamedSharding(self.mesh, PartitionSpec())
        self.n_devices = nd if self.mesh is not None else 1
        self.genome_len = int(len(genome_codes))
        # pad the device genome to a size class: the genome array's SHAPE
        # is part of every kernel's compile key, so without padding each
        # distinct reference forces a full 20-90s-per-shape Mosaic
        # recompile (measured 800+ s on first contact with a new genome).
        # Padding is N-codes; gathers mask by hi/valid and never read it
        # as sequence.
        self.n_units = 1 if unit_spec is None else int(unit_spec[0])
        if self.n_units > 1:
            # TableUnit analog (DIVERGENCES #5): genome planes [U, planeP],
            # descriptors carry (unit, local ds/hi); see RefDesc
            _, bits, plane_len = unit_spec
            planeP = _size_class(int(plane_len) + 8, 1 << 20)
            planes = np.full((self.n_units, planeP), NCODE, dtype=np.uint8)
            for u in range(self.n_units):
                base = u << bits
                seg = genome_codes[base: base + plane_len]
                planes[u, : len(seg)] = seg
            self.genome = self._put_replicated(planes)
        else:
            n = _size_class(self.genome_len + 8, 1 << 20)
            buf = np.full(n, NCODE, dtype=np.uint8)
            buf[: self.genome_len] = genome_codes
            self.genome = self._put_replicated(buf)
        self.readbuf = None
        self.readbuf_len = 0
        self._i32 = self.genome_len < 2 ** 31 - 2
        # observability (the reference's csTime/scoreTime/alignTime split,
        # NGMStats.h:11-54): wall seconds + launch/problem counts per stage
        import threading as _threading
        # stats are mutated from concurrent finalize threads (parallel
        # per-bucket fetches) — guard the read-modify-write updates
        self._stats_lock = _threading.Lock()
        self.stats = {"score_s": 0.0, "score_waves": 0, "score_problems": 0,
                      "align_s": 0.0, "align_waves": 0, "align_problems": 0,
                      "upload_s": 0.0,
                      # DP-cell accounting, split per stage and padded vs
                      # useful so GCUPS can be reported honestly (padded =
                      # what the kernel actually computes incl. tile slack;
                      # useful = the problems' own corridor areas)
                      "cells_score": 0, "cells_score_useful": 0,
                      "cells_align": 0, "cells_align_useful": 0}

    def _put_replicated(self, arr):
        """device_put, replicated across the wave mesh when one exists."""
        if self._repl is not None:
            return jax.device_put(arr, self._repl)
        return jax.device_put(arr)

    def _shard_B(self, n: int, tile: int) -> int:
        """Wave batch-dim padding: per-device shard is a pow2 (>= tile)
        multiple of the tile so compile keys stay bounded and shard_map
        divides evenly."""
        if self.mesh is None:
            return max(_pow2(n, tile), tile)
        per = _pow2(max((n + self.n_devices - 1) // self.n_devices, 1), tile)
        return per * self.n_devices

    def _params_vec(self, params: Tuple[float, ...]):
        """Device-cached score-parameter vector (uploads once per value)."""
        cache = getattr(self, "_pvec_cache", None)
        if cache is None:
            cache = self._pvec_cache = {}
        if params not in cache:
            cache[params] = self._put_replicated(
                np.asarray(params, dtype=np.float32))
        return cache[params]

    def upload_reads(self, read_codes: np.ndarray):
        """Upload a concatenated read-batch code buffer; returns the device
        array (also set as the context default). Batches can be in flight
        concurrently — each wave binds the buffer it was built against."""
        import time
        t0 = time.perf_counter()
        # pad so clipped gathers never read past the end
        n = _pow2(len(read_codes) + 8, 4096)
        buf = np.full(n, NCODE, dtype=np.uint8)
        buf[: len(read_codes)] = read_codes
        self.readbuf = self._put_replicated(buf)
        self.readbuf_len = len(read_codes)
        self.stats["upload_s"] += time.perf_counter() - t0
        return self.readbuf

    # -- scoring -----------------------------------------------------------

    def score_wave(self, problems: Sequence[ScoreProblem],
                   readbuf=None) -> None:
        """Fill .result of every problem (ungapped local segment score,
        StrippedSW semantics — see ngmlr_tpu.ops.ungapped)."""
        pend = self.score_dispatch(problems, readbuf)
        self.score_finalize(pend)

    def score_dispatch(self, problems: Sequence[ScoreProblem], readbuf=None):
        if not problems:
            return None
        readbuf = self.readbuf if readbuf is None else readbuf
        import time
        t0 = time.perf_counter()
        buckets = {}
        for i, p in enumerate(problems):
            # small problems bucket at 64-granularity (the hot subread shape
            # is 306x256 -> 320x256); larger rare probes use pow2 to bound
            # the number of compiled shapes
            if p.ref.W <= 512:
                Rp = max(64, (p.ref.W + 63) // 64 * 64)
            else:
                Rp = _pow2(p.ref.W, 512)
            Qp = _pow2(max(p.qry.length, 1), 64)
            buckets.setdefault((Rp, Qp), []).append(i)
        s_impl = ("pallas" if jax.default_backend() == "tpu"
                  and not os.environ.get("NGMLR_TPU_NO_PALLAS") else "scan")
        pending = []
        for (Rp, Qp), idxs in buckets.items():
            P = self._shard_B(len(idxs), 8)
            # ONE packed upload per bucket — each host->device transfer costs
            # ~17 ms latency on the tunnel
            pk = np.zeros((P, 7), dtype=np.int32)
            pku = pk.view(np.uint32)
            for bi, i in enumerate(idxs):
                p = problems[i]
                pku[bi, 0] = p.ref.ds
                pku[bi, 1] = p.ref.hi
                pk[bi, 2:7] = (p.ref.diff, p.ref.W | (p.ref.unit << 28),
                               p.qry.start, p.qry.length, 1 if p.qry.rev else 0)
            scores, cnt = self._score_call(readbuf, pk, Rp, Qp, s_impl)
            pending.append((idxs, scores, cnt))
            with self._stats_lock:
                self.stats["score_waves"] += 1
                self.stats["cells_score"] += len(idxs) * Rp * Qp
                self.stats["cells_score_useful"] += sum(
                    problems[i].ref.W * problems[i].qry.length for i in idxs)
        with self._stats_lock:
            self.stats["score_problems"] += len(problems)
            self.stats["score_s"] += time.perf_counter() - t0
        return (problems, pending)

    def score_wave_np(self, pk: np.ndarray, readbuf=None) -> np.ndarray:
        """Array fast path for bulk candidate scoring: pk int32 [P, 7] rows
        laid out as in score_dispatch ((ds u32, hi u32, diff, W, qstart,
        qlen, qrev)). Returns f32 [P] scores. Avoids per-problem Python
        objects on the 10k-problems-per-batch hot path (ScoreBuffer's role,
        ScoreBuffer.cpp:87-130)."""
        return self.score_finalize_np(self.score_dispatch_np(pk, readbuf))

    def score_dispatch_np(self, pk: np.ndarray, readbuf=None):
        """Async half of score_wave_np: uploads + launches, no fetch.
        Returns an opaque pending for score_finalize_np."""
        readbuf = self.readbuf if readbuf is None else readbuf
        import time
        t0 = time.perf_counter()
        P = len(pk)
        if P == 0:
            return None
        W = (pk[:, 3] & ((1 << 28) - 1)).astype(np.int64)  # high bits: unit
        qlen = np.maximum(pk[:, 5].astype(np.int64), 1)
        Rp = np.where(
            W <= 512,
            np.maximum(64, (W + 63) // 64 * 64),
            np.int64(1) << np.ceil(np.log2(np.maximum(W, 512))).astype(np.int64))
        Qp = np.int64(1) << np.ceil(np.log2(np.maximum(qlen, 64))
                                    ).astype(np.int64)
        key = Rp * (1 << 20) + Qp
        s_impl = ("pallas" if jax.default_backend() == "tpu"
                  and not os.environ.get("NGMLR_TPU_NO_PALLAS") else "scan")
        # build every bucket's padded block, upload ONCE (single device):
        # each host->device transfer costs ~17 ms latency on the tunnel
        metas = []
        blocks = []
        off = 0
        for k in np.unique(key):
            idxs = np.nonzero(key == k)[0]
            rp, qp = int(k >> 20), int(k & ((1 << 20) - 1))
            n = len(idxs)
            Pp = self._shard_B(n, 8)
            pkb = np.zeros((Pp, 7), dtype=np.int32)
            pkb[:n] = pk[idxs]
            blocks.append(pkb)
            metas.append((idxs, rp, qp, off, Pp))
            off += Pp
        big_dev = None
        if blocks and self.mesh is None:
            big_dev = jnp.asarray(np.concatenate(blocks, axis=0))
        pending = []
        for pkb, (idxs, rp, qp, boff, Pp) in zip(blocks, metas):
            if self.mesh is None:
                scores = _score_kernel(self.genome, readbuf,
                                       big_dev[boff:boff + Pp],
                                       Rp=rp, Qp=qp, impl=s_impl)
                cnt = None
            else:
                scores, cnt = self._score_call(readbuf, pkb, rp, qp, s_impl)
            pending.append((idxs, scores, cnt))
            n = len(idxs)
            with self._stats_lock:
                self.stats["score_waves"] += 1
                self.stats["cells_score"] += n * rp * qp
                self.stats["cells_score_useful"] += int(
                    np.sum(W[idxs] * qlen[idxs]))
        with self._stats_lock:
            self.stats["score_problems"] += P
            self.stats["score_s"] += time.perf_counter() - t0
        return (P, W, qlen, pending)

    def score_finalize_np(self, pend, fetched=None) -> np.ndarray:
        """Fetch + scatter the scores of a score_dispatch_np pending.
        `fetched` optionally supplies pre-fetched per-bucket score arrays
        (the combined-wave fetch path)."""
        if pend is None:
            return np.zeros(0, dtype=np.float32)
        import time
        t0 = time.perf_counter()
        P, W, qlen, pending = pend
        out = np.zeros(P, dtype=np.float32)
        if fetched is None:
            fetched, cnts = jax.device_get(
                [[s for _, s, _ in pending],
                 [c for _, _, c in pending if c is not None]])
            with self._stats_lock:
                for c in cnts:
                    self.stats["mesh_problems_psum"] = (
                        self.stats.get("mesh_problems_psum", 0) + int(c))
        for (idxs, _, _), scores in zip(pending, fetched):
            out[idxs] = scores[:len(idxs)]
        # ssw maxSeqLen guard (StrippedSW.h:87), as in score_finalize
        out[(W + 1 >= MAX_SEQ_LEN) | (qlen + 1 >= MAX_SEQ_LEN)] = -1.0
        with self._stats_lock:
            self.stats["score_s"] += time.perf_counter() - t0
        return out

    def _score_call(self, readbuf, pk_np: np.ndarray, Rp: int, Qp: int,
                    impl: str):
        """Launch one score wave, sharded over the mesh when present.
        Returns (scores device array, on-mesh psum'd count or None)."""
        if self.mesh is None:
            return _score_kernel(self.genome, readbuf, jnp.asarray(pk_np),
                                 Rp=Rp, Qp=Qp, impl=impl), None
        return _score_kernel_mc(self.mesh, Rp, Qp, impl)(
            self.genome, readbuf, jnp.asarray(pk_np))

    def score_finalize(self, pend, fetched=None) -> None:
        if pend is None:
            return
        import time
        t0 = time.perf_counter()
        problems, pending = pend
        if fetched is None:
            fetched, cnts = jax.device_get(
                [[s for _, s, _ in pending],
                 [c for _, _, c in pending if c is not None]])
            with self._stats_lock:
                for c in cnts:
                    self.stats["mesh_problems_psum"] = (
                        self.stats.get("mesh_problems_psum", 0) + int(c))
        for (idxs, _, _), scores in zip(pending, fetched):
            for bi, i in enumerate(idxs):
                p = problems[i]
                if (p.ref.W + 1 >= MAX_SEQ_LEN
                        or p.qry.length + 1 >= MAX_SEQ_LEN):
                    p.result = -1.0
                else:
                    p.result = float(scores[bi])
        with self._stats_lock:
            self.stats["score_s"] += time.perf_counter() - t0

    @staticmethod
    def _convex_impl(Wp: int, Hp: int, L: int,
                     n_problems: int) -> Tuple[str, int, int]:
        """Pick the kernel implementation, fill wavefront-block size K, and
        problems-per-tile BT for a bucket: Pallas on TPU when the working
        set fits VMEM, else the pure-XLA scan (~10 us/wavefront — only for
        corridors too wide for any VMEM budget). For wide corridors
        (L > 1024: retry multipliers, realigns) the FILL kernel shrinks K
        (its blocks are 3D, so K only needs 8-alignment); the backtrack
        kernel keeps K=128 (2D [BT, K] blocks need 128 lanes) and fits
        because it has no i32 accumulator — see align_dispatch."""
        if (jax.default_backend() != "tpu"
                or os.environ.get("NGMLR_TPU_NO_PALLAS")):
            return "scan", 256, 8
        budget = 14 * 1024 * 1024
        # BT must NOT depend on n_problems: compile keys stay deterministic
        # across nondeterministic wave compositions (a fresh BT mid-run costs
        # a 20-90 s Mosaic compile), and a BT=32 tile takes the same wall
        # time as a BT=8 tile anyway (NS-way latency hiding) so padding a
        # small wave to 32 is free
        if L <= 1024:
            # K=128 lets BT=32 fit the VMEM budget at L=256 (K=256 pushed
            # it to BT=16); measured best on chip (scripts/tune_fill.py:
            # BT=32 K=128 2.64 useful-GCUPS vs BT=16 K=256 2.45)
            K = 128
            for BT in (32, 16, 8):
                vmem = (BT * K * L * 4            # dirs accumulator (i32)
                        + 3 * BT * K * L          # dirs in/out blocks (u8)
                        + 10 * BT * L * 4)        # qry0 + carry/scratch
                if vmem <= budget:
                    return "pallas", K, BT
        BT = 8
        # backtrack VMEM bound: double-buffered [BT, 128, L] u8 dirs blocks
        if 2 * BT * 128 * L > budget:
            return "scan", 256, 8
        for K in (128, 64, 32, 16, 8):
            vmem = (BT * K * L * 4 + 3 * BT * K * L + 10 * BT * L * 4)
            if vmem <= budget:
                return "pallas", K, BT
        return "scan", 256, 8

    # -- banded convex alignment --------------------------------------------

    def align_wave(self, problems: Sequence[AlignProblem],
                   params: Tuple[float, ...], readbuf=None) -> None:
        pend = self.align_dispatch(problems, params, readbuf)
        self.align_finalize(pend)

    @staticmethod
    def _lane_bound(p: "AlignProblem") -> int:
        """Upper bound on the max anti-diagonal window height (lanes the
        kernel must hold). The corridor's cross-section along x+y=t is
        roughly width/(1 + 1/k) — a LINEAR corridor (k=1) occupies only
        every other (x-y) parity at fixed t, so half its width — which
        halves the padded lane count vs the naive width+3. The kernels
        report the realized max height (hmax scalar); align_finalize
        re-runs conservatively if this bound is ever exceeded, so a bound
        bug degrades speed, never correctness."""
        w = p.width
        if p.corridor_mode == CORRIDOR_LINEAR:
            b = w // 2 + 4
        elif p.corridor_mode in (CORRIDOR_ENDPOINTS, CORRIDOR_ANCHORS):
            k = float(p.corridor_f[0])
            b = int(w * k / (k + 1.0)) + 6 if k > 0 else w + 3
        else:                                   # CORRIDOR_FULL
            b = w + 3
        return max(min(b, w + 3, p.ref.W + 2, p.qry.length + 2), 8)

    @staticmethod
    def _size_class_vec(x: np.ndarray, lo: int) -> np.ndarray:
        """Vectorized _size_class: smallest {2^n, 1.5*2^n} bucket >= x."""
        mx = int(x.max()) if len(x) else lo
        classes = [lo]
        v = lo
        while classes[-1] < mx:
            classes.append(v + v // 2)
            v *= 2
            classes.append(v)
        arr = np.asarray(classes, dtype=np.int64)
        return arr[np.searchsorted(arr, x)]

    def align_dispatch_pk(self, pk_all: np.ndarray,
                          params: Tuple[float, ...], readbuf=None,
                          conservative_L: bool = False):
        """Array-path align dispatch. pk_all: int32 [P, 12] rows laid out as
        (ds u32, hi u32, diff, W, qstart, qlen, qrev, corridor_mode,
        corridor_i, width, k f32 bits, d f32 bits) — the layout the kernels
        consume and the native engine produces. ONE packed host->device
        upload per call (per wave) on a single device; per-chunk uploads
        on a mesh (shard_map needs per-launch arrays).

        ONE launch per lane-class: kernel wall scales with PADDED cells
        (B x TpP x L) but the per-b-tile activity table skips trailing
        wavefront blocks, so problems of very different lengths share a
        launch almost for free once sorted by T (tiles stay
        length-homogeneous). Splitting a 64-problem wave into 8 launches
        measured 2.2x slower than one launch on the chip."""
        P = len(pk_all)
        if P == 0:
            return None
        readbuf = self.readbuf if readbuf is None else readbuf
        import time
        t0 = time.perf_counter()
        pkf = pk_all.view(np.float32)
        W = (pk_all[:, 3] & ((1 << 28) - 1)).astype(np.int64)  # hi: unit
        qlen = pk_all[:, 5].astype(np.int64)
        width = pk_all[:, 9].astype(np.int64)
        mode = pk_all[:, 7]
        T_arr = W + qlen - 1
        if conservative_L:
            wb = width + 3
        else:
            # _lane_bound vectorized (see its docstring for the geometry)
            kk = pkf[:, 10].astype(np.float64)
            b_ep = np.where(
                kk > 0,
                (width.astype(np.float64) * kk / (kk + 1.0)).astype(np.int64)
                + 6,
                width + 3)
            wb = np.where(mode == CORRIDOR_LINEAR, width // 2 + 4,
                          np.where(mode == CORRIDOR_FULL, width + 3, b_ep))
            wb = np.maximum(
                np.minimum.reduce([wb, width + 3, W + 2, qlen + 2]), 8)
        # lanes: multiples of 128 up to 1024, then size classes
        L_arr = np.where(wb <= 1024, (wb + 127) // 128 * 128,
                         self._size_class_vec(np.maximum(wb, 1), 1024))
        pvec = self._params_vec(tuple(params))
        failed: List[int] = []
        chunks = []   # (L, [row indices])
        # bucket ALSO by per-problem pow2 classes of W and qlen: the launch
        # shape (Wp, Hp) then depends only on each problem's own geometry,
        # never on which problems happened to share a wave. Wave
        # composition is nondeterministic (thread timing), and deriving
        # Wp/Hp from the chunk max minted fresh compile keys mid-run —
        # measured 19 _convex_kernel XLA compiles x ~5 s in ONE warm bench
        # process, dwarfing the kernels' own runtime. Pow2 (not the finer
        # {2^n, 1.5*2^n}) bounds the key count; padded cells are skipped
        # by the per-tile activity table so the extra padding is cheap.
        Wc_arr = np.int64(1) << np.ceil(
            np.log2(np.maximum(W, 256))).astype(np.int64)
        Hc_arr = np.int64(1) << np.ceil(
            np.log2(np.maximum(qlen, 256))).astype(np.int64)
        bucket_key = (L_arr << 40) | (Wc_arr << 20) | Hc_arr
        tpp_arr = Wc_arr + Hc_arr
        # cap HBM held by one launch's direction planes (B x TpP x L u8);
        # ultra-long reads split into their own launches, and a problem too
        # big for even a solo launch fails like the reference's
        # maxMatrixSizeMB refusal (AlignmentMatrixFast.cpp:45-58)
        DIRS_CAP = int(os.environ.get("NGMLR_TPU_DIRS_CAP_GB", "4")) << 30
        for bk in np.unique(bucket_key):
            idxs = np.nonzero(bucket_key == bk)[0]
            idxs = idxs[np.argsort(-T_arr[idxs], kind="stable")]
            L = int(L_arr[idxs[0]])
            chunk: List[int] = []
            chunk_tpp = 0
            for i in idxs.tolist():
                tpp = int(tpp_arr[i])
                if not chunk:
                    if 8 * tpp * L > DIRS_CAP:
                        failed.append(i)
                        continue
                    chunk = [i]
                    chunk_tpp = tpp
                    continue
                n1 = (len(chunk) + 8) // 8 * 8   # worst-case BT padding is
                # moot: B rounds to a BT multiple and BT >= 8
                if n1 * chunk_tpp * L > DIRS_CAP:
                    chunks.append((L, chunk))
                    if 8 * tpp * L > DIRS_CAP:
                        chunk = []
                        failed.append(i)
                        continue
                    chunk = [i]
                    chunk_tpp = tpp
                else:
                    chunk.append(i)
            if chunk:
                chunks.append((L, chunk))

        # build every chunk's padded block, upload ONCE, launch on slices
        t_pack0 = time.perf_counter()
        metas = []
        blocks = []
        off = 0
        for L, idxs in chunks:
            Wp = int(Wc_arr[idxs[0]])
            Hp = int(Hc_arr[idxs[0]])
            impl, K, BT = self._convex_impl(Wp, Hp, L, len(idxs))
            g = BT * self.n_devices
            B = max((len(idxs) + g - 1) // g * g, 8 * self.n_devices)
            blk = np.zeros((B, 12), dtype=np.int32)
            blkf = blk.view(np.float32)
            blk[:, 9] = 1   # empty slots: width 1, zero-length → inert
            blkf[:, 10] = 1.0
            blk[: len(idxs)] = pk_all[idxs]
            blocks.append(blk)
            metas.append((L, idxs, Wp, Hp, impl, K, BT, off, B))
            off += B
        t_up0 = time.perf_counter()
        big_dev = None
        if blocks and self.mesh is None:
            # ONE packed upload per wave (~17 ms latency per transfer);
            # per-chunk device slices are free
            big_dev = jnp.asarray(np.concatenate(blocks, axis=0))
        t_launch0 = time.perf_counter()
        pending = []
        for blk, (L, idxs, Wp, Hp, impl, K, BT, boff, B) in zip(blocks, metas):
            if self.mesh is None:
                packed_ops_dev, scalars_dev = _convex_kernel(
                    self.genome, readbuf, big_dev[boff:boff + B], pvec,
                    Wp=Wp, Hp=Hp, L=L, impl=impl, K=K, BT=BT)
                cnt = None
            else:
                packed_ops_dev, scalars_dev, cnt = _convex_kernel_mc(
                    self.mesh, Wp, Hp, L, impl, K, BT)(
                        self.genome, readbuf, jnp.asarray(blk), pvec)
            # a conservative launch accepts its results unconditionally
            # (hmax <= width+3 is proven for monotone corridors; the
            # sentinel makes the retry recursion terminate even if that
            # proof is ever violated)
            pending.append((idxs, packed_ops_dev, scalars_dev, cnt,
                            (1 << 30) if conservative_L else L,
                            int(packed_ops_dev.shape[0]) // B))
            with self._stats_lock:
                self.stats["align_waves"] += 1
                self.stats["cells_align"] += len(idxs) * (Wp + Hp) * L
                self.stats["cells_align_useful"] += int(
                    np.sum(qlen[idxs] * np.minimum(width[idxs], W[idxs])))
        t_end = time.perf_counter()
        with self._stats_lock:
            self.stats["align_problems"] += P
            self.stats["align_s"] += t_end - t0
            self.stats["align_pack_s"] = (self.stats.get("align_pack_s", 0.0)
                                          + t_up0 - t_pack0)
            self.stats["align_upload_s"] = (
                self.stats.get("align_upload_s", 0.0) + t_launch0 - t_up0)
            self.stats["align_launch_s"] = (
                self.stats.get("align_launch_s", 0.0) + t_end - t_launch0)
        return (pk_all, pending, params, readbuf, failed)

    def fetch_waves_np(self, apend, spend):
        """ONE device_get covering an align pending and a score pending
        (the native engine posts both kinds of results to the wave gate
        together, so separate fetches just paid an extra ~25 ms tunnel
        round trip per wave). Returns (align results tuple, scores f32)."""
        import time
        a_items = [] if apend is None else apend[1]
        s_items = [] if spend is None else spend[3]
        t0 = time.perf_counter()
        fa, fs, cnts = jax.device_get(
            [[(p, s) for _, p, s, _, _, _ in a_items],
             [s for _, s, _ in s_items],
             [c for _, _, _, c, _, _ in a_items if c is not None]
             + [c for _, _, c in s_items if c is not None]])
        with self._stats_lock:
            self.stats["align_fetch_s"] = (
                self.stats.get("align_fetch_s", 0.0)
                + time.perf_counter() - t0)
            for c in cnts:
                self.stats["mesh_problems_psum"] = (
                    self.stats.get("mesh_problems_psum", 0) + int(c))
        a_res = self.align_finalize_pk(apend, fetched=fa)
        s_res = self.score_finalize_np(spend, fetched=fs)
        return a_res, s_res

    def align_finalize_pk(self, pend, fetched=None):
        """Returns (scores f32 [P], best_x i32, best_y i32, stop_x, stop_y,
        ok u8, ops) where ops[i] is the packed op-stream row (np.uint8) or
        None for failed rows. `fetched` optionally supplies pre-fetched
        per-chunk (packed, scalars) pairs (the combined-wave fetch path)."""
        if pend is None:
            return None
        import time
        t0 = time.perf_counter()
        pk_all, pending, params, readbuf, failed = pend
        P = len(pk_all)
        scores = np.zeros(P, dtype=np.float32)
        bx = np.full(P, -1, dtype=np.int32)
        by = np.full(P, -1, dtype=np.int32)
        sx = np.full(P, -1, dtype=np.int32)
        sy = np.full(P, -1, dtype=np.int32)
        ok = np.zeros(P, dtype=np.uint8)
        ops: List[Optional[np.ndarray]] = [None] * P
        if fetched is None:
            fetched, cnts = jax.device_get(
                [[(p, s) for _, p, s, _, _, _ in pending],
                 [c for _, _, _, c, _, _ in pending if c is not None]])
            t_fetch = time.perf_counter()
            with self._stats_lock:
                self.stats["align_fetch_s"] = (
                    self.stats.get("align_fetch_s", 0.0) + t_fetch - t0)
                for c in cnts:
                    self.stats["mesh_problems_psum"] = (
                        self.stats.get("mesh_problems_psum", 0) + int(c))
        n_ok = 0
        corr_sum = 0
        lane_retry: List[int] = []
        for (idxs, _, _, _, L, T4), (packed, scalars) in zip(pending, fetched):
            packed = packed.reshape(-1, T4)
            for bi, i in enumerate(idxs):
                (score_i, bxi, byi, sxi, syi, okf, hmax) = scalars[bi]
                if int(hmax) > L:
                    # the _lane_bound estimate was too tight for this
                    # corridor — re-run with the conservative width+3
                    # lane count (correctness safety net; should never
                    # fire for the analytic bounds)
                    lane_retry.append(int(i))
                    continue
                scores[i] = np.int32(score_i).view(np.float32)
                bx[i], by[i] = int(bxi), int(byi)
                sx[i], sy[i] = int(sxi), int(syi)
                ok[i] = 1 if okf else 0
                ops[i] = packed[bi]
                n_ok += int(ok[i])
                corr_sum += int(pk_all[i, 9])
        if lane_retry:
            with self._stats_lock:
                self.stats["lane_bound_retries"] = (
                    self.stats.get("lane_bound_retries", 0) + len(lane_retry))
            # re-dispatch the subset conservatively; splice results back
            sub = np.ascontiguousarray(pk_all[lane_retry])
            r = self.align_finalize_pk(self.align_dispatch_pk(
                sub, params, readbuf, conservative_L=True))
            (s2, bx2, by2, sx2, sy2, ok2, ops2) = r
            for j, i in enumerate(lane_retry):
                scores[i] = s2[j]
                bx[i], by[i] = bx2[j], by2[j]
                sx[i], sy[i] = sx2[j], sy2[j]
                ok[i] = ok2[j]
                ops[i] = ops2[j]
                n_ok += int(ok2[j])
                corr_sum += int(pk_all[i, 9])
        # NGMStats corridorLen/alignmentCount/invalidAligmentCount
        # (AlignmentBuffer.cpp:60,120,188)
        with self._stats_lock:
            self.stats["alignment_ok"] = (self.stats.get("alignment_ok", 0)
                                          + n_ok)
            self.stats["alignment_all"] = (self.stats.get("alignment_all", 0)
                                           + P)
            self.stats["corridor_sum"] = (self.stats.get("corridor_sum", 0)
                                          + corr_sum)
            self.stats["align_s"] += time.perf_counter() - t0
        return (scores, bx, by, sx, sy, ok, ops)

    def align_dispatch(self, problems: Sequence[AlignProblem],
                       params: Tuple[float, ...], readbuf=None,
                       conservative_L: bool = False):
        """Object-path wrapper over align_dispatch_pk (the WaveBatcher /
        Python-oracle entry point)."""
        if not problems:
            return None
        P = len(problems)
        pk = np.zeros((P, 12), dtype=np.int32)
        pku = pk.view(np.uint32)
        pkf = pk.view(np.float32)
        for bi, p in enumerate(problems):
            pku[bi, 0] = p.ref.ds
            pku[bi, 1] = p.ref.hi
            pk[bi, 2:10] = (p.ref.diff, p.ref.W | (p.ref.unit << 28),
                            p.qry.start, p.qry.length,
                            1 if p.qry.rev else 0,
                            p.corridor_mode, p.corridor_i, p.width)
            pkf[bi, 10:12] = p.corridor_f
        pend = self.align_dispatch_pk(pk, params, readbuf,
                                      conservative_L=conservative_L)
        return (problems, pend)

    def align_finalize(self, pend) -> None:
        if pend is None:
            return
        problems, pk_pend = pend
        r = self.align_finalize_pk(pk_pend)
        if r is None:
            return
        scores, bx, by, sx, sy, ok, ops = r
        for i, p in enumerate(problems):
            p.score = float(scores[i])
            p.best_x, p.best_y = int(bx[i]), int(by[i])
            p.stop_x, p.stop_y = int(sx[i]), int(sy[i])
            p.ok = bool(ok[i])
            p.ops = ops[i]


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _gather_ref(genome, ds, diff, hi, W, Wp, unit=None):
    """[B, Wp] window codes per RefDesc rule. ds/hi: uint32 absolute genome
    positions (unit-LOCAL when genome is a 2D unit-plane stack and `unit`
    selects the plane per problem); diff/W: int32 window-relative.
    Out-of-window lanes may wrap in uint32 arithmetic — they are masked by
    `valid` (which never wraps: i >= diff implies pos = ds + (i - diff) >=
    ds >= 0 exactly)."""
    B = ds.shape[0]
    i = jnp.arange(Wp, dtype=jnp.int32)[None, :]
    rel = (i - diff[:, None]).astype(jnp.uint32)
    pos = ds[:, None] + rel
    valid = ((i >= diff[:, None]) & (i < W[:, None]) & (pos < hi[:, None]))
    idx = jnp.minimum(pos, jnp.uint32(genome.shape[-1] - 1))
    # mode="clip": idx is already clamped, and the default mode's
    # negative-wrap adjustment (idx + len) overflows int32 tracing for a
    # > 2^31-byte genome with x64 off
    if genome.ndim == 2:
        # multi-unit genome (TableUnit analog): gather each plane, select
        # by the problem's unit id — U is tiny (<= 4 at 8.5 Gbp), so U
        # gathers + selects beat a flat index that would not fit uint32
        codes = jnp.take(genome[0], idx.reshape(-1),
                         mode="clip").reshape(B, Wp)
        for u in range(1, genome.shape[0]):
            cu = jnp.take(genome[u], idx.reshape(-1),
                          mode="clip").reshape(B, Wp)
            codes = jnp.where((unit == u)[:, None], cu, codes)
    else:
        codes = jnp.take(genome, idx.reshape(-1),
                         mode="clip").reshape(B, Wp)
    return jnp.where(valid, codes, jnp.uint8(XCODE))


def _gather_qry(readbuf, start, length, rev, Qp):
    """[B, Qp] query codes: read slice, reverse-complemented iff rev.
    start/length: int32 (the per-batch read buffer is < 2^31)."""
    B = start.shape[0]
    j = jnp.arange(Qp, dtype=jnp.int32)[None, :]
    src = jnp.where(rev[:, None] == 1, length[:, None] - 1 - j, j)
    pos = start[:, None] + src
    valid = (j < length[:, None]) & (src >= 0)
    idx = jnp.clip(pos, 0, readbuf.shape[0] - 1).astype(jnp.int32)
    codes = jnp.take(readbuf, idx.reshape(-1),
                     mode="clip").reshape(B, Qp)
    comp = jnp.where(codes < 4, codes ^ 1, codes)
    codes = jnp.where(rev[:, None] == 1, comp, codes)
    return jnp.where(valid, codes, jnp.uint8(NCODE))


@functools.partial(jax.jit, static_argnames=("Rp", "Qp", "impl"))
def _score_kernel(genome, readbuf, pk, Rp: int, Qp: int,
                  impl: str = "scan"):
    """Batched ungapped local-segment scores (see ngmlr_tpu.ops.ungapped for
    the semantics proof vs the vendored ssw). pk: int32 [P, 7] = (ds u32,
    hi u32, diff, W, qstart, qlen, qrev). Returns f32 [P]."""
    pu = jax.lax.bitcast_convert_type(pk[:, 0:2], jnp.uint32)
    pi = pk[:, 2:7]
    W_raw = pi[:, 1]
    unit = None
    if genome.ndim == 2:
        unit = W_raw >> 28
        W_raw = W_raw & ((1 << 28) - 1)
    ref = _gather_ref(genome, pu[:, 0], pi[:, 0], pu[:, 1], W_raw, Rp,
                      unit=unit)
    qry = _gather_qry(readbuf, pi[:, 2], pi[:, 3], pi[:, 4], Qp)
    if impl == "pallas":
        from .pallas_kernels import score_fill
        # 512-lane tiles measured fastest on the chip (vs the 128 default:
        # 4x the vregs per fori_loop step amortize the loop overhead)
        pt = int(os.environ.get("NGMLR_TPU_SCORE_PT", "512"))
        P = ref.shape[0]
        Pp = ((P + pt - 1) // pt) * pt
        ref_t = jnp.pad(ref, ((0, Pp - P), (0, 0))).astype(jnp.int32).T
        qry_t = jnp.pad(qry, ((0, Pp - P), (0, 0)),
                        constant_values=NCODE).astype(jnp.int32).T
        best = score_fill(ref_t, qry_t, pt=pt)
        return best[0, :P].astype(jnp.float32)
    q = qry.astype(jnp.int32)
    q_ok = q < 4

    def step(carry, ref_col):
        h, best = carry
        rc = ref_col.astype(jnp.int32)[:, None]
        s = jnp.where((q == rc) & q_ok, 1,
                      jnp.where(q_ok & (rc < 4), -1, 0))
        h_new = jnp.maximum(jnp.pad(h[:, :-1], ((0, 0), (1, 0))) + s, 0)
        return (h_new, jnp.maximum(best, h_new.max(axis=1))), None

    h0 = jnp.zeros(q.shape, dtype=jnp.int32)
    b0 = jnp.zeros((q.shape[0],), dtype=jnp.int32)
    (_, best), _ = jax.lax.scan(step, (h0, b0), ref.T, unroll=8)
    return best.astype(jnp.float32)


def _shard_map(body, mesh, in_specs, out_specs):
    try:
        from jax.experimental.shard_map import shard_map as sm
    except ImportError:                      # newer jax moved it
        from jax import shard_map as sm
    # the varying-manual-axes analysis rejects scan carries initialized
    # from unvarying zeros inside the per-device body; the bodies are
    # plain per-shard compute + one explicit psum, so disable it
    for kw in ("check_vma", "check_rep"):
        try:
            return sm(body, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, **{kw: False})
        except TypeError:
            continue
    return sm(body, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


@functools.lru_cache(maxsize=None)
def _score_kernel_mc(mesh, Rp: int, Qp: int, impl: str):
    """shard_map'd twin of _score_kernel: problems sharded over the 'dp'
    mesh axis, genome/read buffer replicated. Also psums the per-device
    real-problem count on-mesh (the reference's atomic counters,
    PlatformSpecifics.h:60-82)."""
    from jax.sharding import PartitionSpec as P

    def body(g, rb, pk):
        s = _score_kernel(g, rb, pk, Rp=Rp, Qp=Qp, impl=impl)
        cnt = jax.lax.psum(jnp.sum((pk[:, 5] > 0).astype(jnp.int32)), "dp")
        return s, cnt

    return jax.jit(_shard_map(body, mesh, (P(), P(), P("dp")),
                              (P("dp"), P())))


@functools.lru_cache(maxsize=None)
def _convex_kernel_mc(mesh, Wp: int, Hp: int, L: int, impl: str,
                      K: int, BT: int):
    """shard_map'd twin of _convex_kernel (see _score_kernel_mc)."""
    from jax.sharding import PartitionSpec as P

    def body(g, rb, pk, params):
        packed, scalars = _convex_kernel(g, rb, pk, params, Wp=Wp, Hp=Hp,
                                         L=L, impl=impl, K=K, BT=BT)
        cnt = jax.lax.psum(jnp.sum((pk[:, 5] > 0).astype(jnp.int32)), "dp")
        return packed, scalars, cnt

    return jax.jit(_shard_map(body, mesh, (P(), P(), P("dp"), P()),
                              (P("dp"), P("dp"), P())))


def _corridor_offs(mode, ci, pf, i_f32, i_int):
    """Per-row corridor offsets, f32-exact vs the host generators
    (AlignmentBuffer.cpp:68-197). mode/ci: int32 [B]; pf: f32 [B, 2];
    i_f32/i_int: [1, H] row index. Returns int32 [B, H]."""
    k = pf[:, 0:1]
    d = pf[:, 1:2]
    full = ci[:, None] + jnp.zeros_like(i_int)
    linear = i_int - ci[:, None]
    endpoints = jnp.trunc((i_f32 - d) / k).astype(jnp.int32)
    anchors = jnp.trunc(i_f32 / k - d).astype(jnp.int32)
    m = mode[:, None]
    return jnp.where(m == CORRIDOR_FULL, full,
                     jnp.where(m == CORRIDOR_LINEAR, linear,
                               jnp.where(m == CORRIDOR_ENDPOINTS, endpoints,
                                         anchors)))


def _shift_dn(a):   # out[l] = a[l+1]
    return jnp.concatenate([a[:, 1:], jnp.zeros_like(a[:, :1])], axis=1)


def _shift_up(a):   # out[l] = a[l-1]
    return jnp.concatenate([jnp.zeros_like(a[:, :1]), a[:, :-1]], axis=1)


@functools.partial(jax.jit,
                   static_argnames=("Wp", "Hp", "L", "impl", "K", "BT"))
def _convex_kernel(genome, readbuf, pk, params, Wp: int, Hp: int,
                   L: int, impl: str = "scan", K: int = 256, BT: int = 8):
    """Fused banded convex-gap fill + on-device backtrack.

    pk: int32 [B, 12] packed per-problem params — (ds u32, hi u32, diff, W,
    qstart, qlen, qrev, cmode, ci, width, k f32, d f32); params: f32 [6]
    score params.
    impl: "scan" (pure-XLA reference formulation, works everywhere) or
    "pallas" (TPU Mosaic kernels, ~100x less per-wavefront overhead).

    Returns (packed_ops uint8 [B, ceil(Tp'/4)], scalars int32 [B, 6] =
    (score bits, best_x, best_y, stop_x, stop_y, ok)).
    """
    pu = jax.lax.bitcast_convert_type(pk[:, 0:2], jnp.uint32)
    pi = pk[:, 2:10]
    pf = jax.lax.bitcast_convert_type(pk[:, 10:12], jnp.float32)
    B = pi.shape[0]
    Tp = Wp + Hp
    mat, mis, go, ge, gemin, gdecay = [params[i] for i in range(6)]

    W = pi[:, 1]
    unit = None
    if genome.ndim == 2:
        unit = W >> 28
        W = W & ((1 << 28) - 1)
    H = pi[:, 3]
    mode = pi[:, 5]
    ci = pi[:, 6]
    width = pi[:, 7]

    ref = _gather_ref(genome, pu[:, 0], pi[:, 0], pu[:, 1], W, Wp,
                      unit=unit)
    qry = _gather_qry(readbuf, pi[:, 2], pi[:, 3], pi[:, 4], Hp)
    zpad = jnp.zeros((B, L), dtype=jnp.uint8)
    ref_pad = jnp.concatenate([zpad, ref, zpad], axis=1)
    qry_pad = jnp.concatenate([zpad, qry, zpad], axis=1)

    # per-row corridor -> per-wavefront active row window [ymin, ymax]
    hrow_i = jnp.arange(Hp, dtype=jnp.int32)[None, :]
    hrow_f = hrow_i.astype(jnp.float32)
    offs = _corridor_offs(mode, ci, pf, hrow_f, hrow_i)           # [B, Hp]
    lo = jnp.clip(offs, 0, W[:, None])
    hi = jnp.maximum(jnp.clip(offs + width[:, None], 0, W[:, None]), lo)
    row_ok = hrow_i < H[:, None]
    BIG = jnp.int32(2 ** 30)
    key_lo = jnp.where(row_ok, hrow_i + lo, BIG)
    key_hi = jnp.where(row_ok, hrow_i + hi, BIG)
    # ymin[t] = #{y: key_hi[y] <= t}, ymax[t] = #{y: key_lo[y] <= t} - 1.
    # The keys are nonnegative. Two interchangeable formulations (both
    # exact; pick per backend with NGMLR_TPU_YMIN_IMPL=hist|sort):
    #  * hist: scatter-add histogram + cumsum (~100x faster than a
    #    vmapped searchsorted on this backend),
    #  * sort: merge-rank — stable-sort keys (tag 0) against the t-grid
    #    (tag 1); a grid element t at merged position i has exactly
    #    i - t keys <= t. Scatter-free: for backends where scatters
    #    serialize, two lax.sorts may beat the histogram.
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    # one documented default: the pallas path uses the corridor-window
    # pointer-advance kernel ("cw"); the XLA twin uses the scatter
    # histogram ("hist"). Setting NGMLR_TPU_YMIN_IMPL=hist|sort forces
    # that formulation on either path (cw is pallas-only).
    _ymin_impl = os.environ.get("NGMLR_TPU_YMIN_IMPL") or (
        "cw" if impl == "pallas" else "hist")
    if _ymin_impl == "cw" and impl != "pallas":
        _ymin_impl = "hist"

    def count_leq(key):
        kc = jnp.minimum(key, jnp.int32(Tp)).astype(jnp.int32)
        if _ymin_impl == "sort":
            grid = jnp.broadcast_to(
                jnp.arange(Tp, dtype=jnp.int32)[None], (B, Tp))
            vals = jnp.concatenate([kc, grid], axis=1)
            tags = jnp.concatenate(
                [jnp.zeros((B, Hp), jnp.int32),
                 jnp.ones((B, Tp), jnp.int32)], axis=1)
            sv, st = jax.lax.sort((vals, tags), dimension=1, num_keys=2,
                                  is_stable=True)
            iota = jnp.arange(Hp + Tp, dtype=jnp.int32)[None]
            gpos = jnp.where(st == 1, iota, jnp.int32(Hp + Tp))
            gpos = jax.lax.sort(gpos, dimension=1)[:, :Tp]
            return gpos - jnp.arange(Tp, dtype=jnp.int32)[None]
        hist = jnp.zeros((B, Tp + 1), jnp.int32).at[rows, kc].add(1)
        return jnp.cumsum(hist[:, :Tp], axis=1)

    if _ymin_impl != "cw":
        # (skipped entirely on the cw path: the kernel supplies
        # ymin/ymax/hmax, and tracing the ~30 ms scatter histograms just
        # to DCE them would still cost compile time)
        ymin = count_leq(key_hi)                                   # [B, Tp]
        ymax = count_leq(key_lo) - 1
        # realized max window height — align_finalize checks it against
        # the lane count L (the _lane_bound safety net)
        hmax = jnp.max(ymax - ymin + 1, axis=1)                    # [B]

    if impl == "pallas":
        from .pallas_kernels import (convex_fill, convex_backtrack,
                                     corridor_windows)
        # backtrack always runs K=128 blocks (2D lane constraint); pad Tp
        # to a common multiple of the fill K (a power of two <= 256) and 128
        KP = max(K, 128)
        TpP = ((Tp + KP - 1) // KP) * KP
        padT = TpP - Tp
        if _ymin_impl == "cw":
            # monotone pointer-advance kernel: both count_leq scatter
            # histograms (~30 ms each per launch) become one cheap serial
            # walk; windows past Tp come out empty (ymin=H > ymax=H-1),
            # matching the edge/-1 padding semantics below
            Bp = (B + 127) // 128 * 128

            def _row(a):
                return jnp.pad(a.astype(jnp.int32)[None, :],
                               ((0, 0), (0, Bp - B)))

            scal_cw = jnp.concatenate([
                _row(mode), _row(ci), _row(width), _row(W), _row(H),
                _row(jax.lax.bitcast_convert_type(pf[:, 0], jnp.int32)),
                _row(jax.lax.bitcast_convert_type(pf[:, 1], jnp.int32)),
                jnp.zeros((1, Bp), jnp.int32)], axis=0)
            ymin_T, ymax_T = corridor_windows(scal_cw, TpP, K=128, GU=8)
            ymin_p = ymin_T.T[:B]
            ymax_p = ymax_T.T[:B]
            hmax = jnp.max(ymax_p - ymin_p + 1, axis=1)
        else:
            ymin_p = jnp.pad(ymin, ((0, 0), (0, padT)), mode="edge")
            ymax_p = jnp.pad(ymax, ((0, 0), (0, padT)), constant_values=-1)
        # deltas with ymin[-1] := 0 — the in-kernel incremental sequence
        # windows start from the (t=-1, ymin=0) state
        d1p = jnp.concatenate([ymin_p[:, :1],
                               ymin_p[:, 1:] - ymin_p[:, :-1]], axis=1)
        d2p = jnp.concatenate([ymin_p[:, :2],
                               ymin_p[:, 2:] - ymin_p[:, :-2]], axis=1)
        zL = jnp.zeros((B, L), jnp.int32)
        ref_i = jnp.concatenate([zL, ref.astype(jnp.int32), zL], axis=1)
        qry_i = jnp.concatenate([zL, qry.astype(jnp.int32), zL], axis=1)
        ts_row = jnp.arange(TpP, dtype=jnp.int32)[None, :]
        rcpatch = jnp.take_along_axis(
            ref_i, jnp.clip(L + ts_row - ymin_p, 0, Wp + 2 * L - 1), axis=1)
        qcpatch = jnp.take_along_axis(
            qry_i, jnp.clip(2 * L - 1 + ymin_p, 0, Hp + 2 * L - 1), axis=1)
        params8 = jnp.concatenate([params.astype(jnp.float32),
                                   jnp.zeros(2, jnp.float32)])
        # 32-wavefront unrolled groups cut loop overhead ~19% vs 8
        GU = min(32, K)
        dirs, best, by, bx = convex_fill(params8, qry_i[:, L:2 * L],
                                         ymin_p, ymax_p,
                                         d1p, d2p, rcpatch, qcpatch, L, K, BT,
                                         GU=GU)
        ops_i, sx, sy, state = convex_backtrack(
            dirs, ymin_p, bx, by, mode[:, None], ci[:, None],
            width[:, None], pf.astype(jnp.float32), L, KP, BT,
            GU=min(32, KP))
        ok = (state[:, 0] == 1).astype(jnp.int32)   # DONE
        scalars = jnp.stack([
            jax.lax.bitcast_convert_type(best[:, 0], jnp.int32),
            bx[:, 0], by[:, 0], sx[:, 0], sy[:, 0], ok, hmax], axis=1)
        o4 = ops_i.reshape(B, TpP // 4, 4).astype(jnp.uint8)
        packed = (o4[..., 0] | (o4[..., 1] << 2) | (o4[..., 2] << 4)
                  | (o4[..., 3] << 6)).astype(jnp.uint8)
        # flat return: device_get of a 2D array measured ~30-45% slower
        # than the same bytes as 1D over the tunnel, and fetching a lazy
        # [:, :n4] SLICE ~4x slower — so the kernel returns the full
        # packed plane flattened and the host reshapes for free
        return packed.reshape(-1), scalars

    ymin_t = ymin.T                                                # [Tp, B]
    ymax_t = ymax.T
    d1 = jnp.concatenate([ymin_t[:1] * 0, ymin_t[1:] - ymin_t[:-1]], axis=0)
    d2 = jnp.concatenate([ymin_t[:2] * 0, ymin_t[2:] - ymin_t[:-2]], axis=0)

    lanes = jnp.arange(L, dtype=jnp.int32)[None, :]                # [1, L]
    BIGI = jnp.int32(2 ** 30)

    def fill_step(carry, xs):
        s1, dd1, r1, s2, best, by, bx = carry
        t, ym, yx, dl1, dl2 = xs
        y = ym[:, None] + lanes                                    # [B, L]
        x = t - y
        valid = (lanes <= (yx - ym)[:, None]) & (ym <= yx)[:, None]

        # sequence codes for this wavefront (contiguous slices of padded rows)
        s_ref = jnp.clip(t - ym + 1, 0, Wp + L)
        s_qry = jnp.clip(ym + L, 0, Hp + L)
        rc = jax.vmap(lambda r, s: jax.lax.dynamic_slice(r, (s,), (L,)))(
            ref_pad, s_ref)[:, ::-1]
        qc = jax.vmap(lambda r, s: jax.lax.dynamic_slice(r, (s,), (L,)))(
            qry_pad, s_qry)
        eq = rc == qc

        # neighbors: left = prev1[l + d1], up = prev1[l + d1 - 1],
        # diag = prev2[l + d2 - 1]  (window-aligned shifts)
        def sel1(a):
            return jnp.where((dl1 == 1)[:, None], _shift_dn(a), a)

        lf_s, lf_d, lf_r = sel1(s1), sel1(dd1), sel1(r1)
        up_s = jnp.where((dl1 == 1)[:, None], s1, _shift_up(s1))
        up_d = jnp.where((dl1 == 1)[:, None], dd1, _shift_up(dd1))
        up_r = jnp.where((dl1 == 1)[:, None], r1, _shift_up(r1))
        diag_s = jnp.where((dl2 == 0)[:, None], _shift_up(s2),
                           jnp.where((dl2 == 1)[:, None], s2, _shift_dn(s2)))

        diag_cell = diag_s + jnp.where(eq, mat, mis)
        ins_ext = up_d == INS
        up_gap = jnp.minimum(gemin, ge + up_r.astype(jnp.float32) * gdecay)
        up_cell = jnp.where(ins_ext,
                            jnp.where(up_s == 0.0, 0.0, up_s + up_gap),
                            up_s + go)
        del_ext = lf_d == DEL
        lf_gap = jnp.minimum(gemin, ge + lf_r.astype(jnp.float32) * gdecay)
        lf_cell = jnp.where(del_ext,
                            jnp.where(lf_s == 0.0, 0.0, lf_s + lf_gap),
                            lf_s + go)

        max_cell = jnp.maximum(jnp.maximum(lf_cell, 0.0),
                               jnp.maximum(diag_cell, up_cell))
        c1 = del_ext & (max_cell == lf_cell)
        c2 = (~c1) & ins_ext & (max_cell == up_cell)
        c3 = (~c1) & (~c2) & (max_cell == diag_cell)
        c4 = (~c1) & (~c2) & (~c3) & (max_cell == lf_cell)
        c5 = (~c1) & (~c2) & (~c3) & (~c4) & (max_cell == up_cell)
        new_d = jnp.where(c1 | c4, DEL,
                          jnp.where(c2 | c5, INS,
                                    jnp.where(c3, DIAG, STOP))).astype(jnp.uint8)
        new_r = jnp.where(c1, lf_r + 1,
                          jnp.where(c2, up_r + 1,
                                    jnp.where(c4 | c5, 1, 0))).astype(jnp.int32)
        new_s = jnp.where(new_d == STOP, 0.0, max_cell)

        new_s = jnp.where(valid, new_s, 0.0)
        new_d = jnp.where(valid, new_d, jnp.uint8(STOP))
        new_r = jnp.where(valid, new_r, 0)

        cand = jnp.where(valid, new_s, -jnp.inf)
        m = cand.max(axis=1)
        ys = jnp.where(valid & (cand == m[:, None]), y, BIGI)
        y_m = ys.min(axis=1)
        x_m = t - y_m
        better = (m > best) | ((m == best) & ((y_m < by)
                                              | ((y_m == by) & (x_m < bx))))
        best = jnp.where(better, m, best)
        by = jnp.where(better, y_m, by)
        bx = jnp.where(better, x_m, bx)
        return (new_s, new_d, new_r, s1, best, by, bx), new_d

    zf = jnp.zeros((B, L), jnp.float32)
    zd = jnp.zeros((B, L), jnp.uint8)
    zr = jnp.zeros((B, L), jnp.int32)
    best0 = jnp.full((B,), -1.0, jnp.float32)
    z0 = jnp.zeros((B,), jnp.int32)
    ts = jnp.arange(Tp, dtype=jnp.int32)
    (_, _, _, _, best, by, bx), dirs = jax.lax.scan(
        fill_step, (zf, zd, zr, zf, best0, z0, z0),
        (ts, ymin_t, ymax_t, d1, d2))

    # ---- backtrack: reverse sweep over wavefronts --------------------------
    k_f = pf[:, 0]
    d_f = pf[:, 1]
    width_f = width.astype(jnp.float32)

    def offs_at(yv):
        yf = yv.astype(jnp.float32)
        full = ci
        linear = yv - ci
        endpoints = jnp.trunc((yf - d_f) / k_f).astype(jnp.int32)
        anchors = jnp.trunc(yf / k_f - d_f).astype(jnp.int32)
        return jnp.where(mode == CORRIDOR_FULL, full,
                         jnp.where(mode == CORRIDOR_LINEAR, linear,
                                   jnp.where(mode == CORRIDOR_ENDPOINTS,
                                             endpoints, anchors)))

    def valid_path(xv, yv):
        """AlignmentMatrixFast::validPath (AlignmentMatrixFast.cpp:213-220)."""
        o = offs_at(yv).astype(jnp.float32)
        min_c = jnp.trunc(o + jnp.float32(0.1) * width_f).astype(jnp.int32)
        max_c = jnp.trunc(min_c.astype(jnp.float32) + width_f
                          - jnp.float32(0.1) * width_f).astype(jnp.int32)
        return (xv > min_c) & (xv < max_c)

    WALK, DONE, FAIL = 0, 1, 2
    state0 = jnp.where(by > 0, WALK, FAIL)

    def bt_step(carry, xs):
        x, y, state, sx, sy = carry
        dirs_t, ym, t = xs
        here = (state == WALK) & (x + y == t)
        lane = y - ym
        onehot = (lanes == lane[:, None]) & here[:, None]
        d = jnp.max(jnp.where(onehot, dirs_t, jnp.uint8(0)), axis=1)
        d = jnp.where((lane >= 0) & (lane < L), d, jnp.uint8(STOP))

        stop_now = here & (d == STOP)
        bad = here & (~stop_now) & ~valid_path(x, y)
        emit = jnp.where(here & (~stop_now) & (~bad), d, jnp.uint8(0))

        nx = jnp.where(emit == DIAG, x - 1, jnp.where(emit == DEL, x - 1, x))
        ny = jnp.where(emit == DIAG, y - 1, jnp.where(emit == INS, y - 1, y))
        off_matrix = (emit != 0) & ((nx < 0) | (ny < 0))

        sx = jnp.where(stop_now | off_matrix, nx, sx)
        sy = jnp.where(stop_now | off_matrix, ny, sy)
        state = jnp.where(stop_now | off_matrix, DONE,
                          jnp.where(bad, FAIL, state))
        return (nx, ny, state, sx, sy), emit

    (fx, fy, fstate, sx, sy), ops = jax.lax.scan(
        bt_step, (bx, by, state0, z0 - 1, z0 - 1),
        (dirs, ymin_t, ts), reverse=True)

    ok = (fstate == DONE).astype(jnp.int32)
    scalars = jnp.stack([
        jax.lax.bitcast_convert_type(best, jnp.int32),
        bx, by, sx, sy, ok, hmax], axis=1)

    opsT = ops.T                                                # [B, Tp]
    pad = (-Tp) % 4
    if pad:
        opsT = jnp.pad(opsT, ((0, 0), (0, pad)))
    o4 = opsT.reshape(B, (Tp + pad) // 4, 4)
    packed = (o4[:, :, 0] | (o4[:, :, 1] << 2) | (o4[:, :, 2] << 4)
              | (o4[:, :, 3] << 6)).astype(jnp.uint8)
    return packed.reshape(-1), scalars
