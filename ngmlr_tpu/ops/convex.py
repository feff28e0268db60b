"""Banded convex-gap DP as a batched anti-diagonal wavefront scan (the GCUPS
kernel).

TPU-native rebuild of ConvexAlignFast (/root/reference/src/ConvexAlignFast.cpp
:606-774 production recurrence; :914-1287 is its SSE formulation, which this
file replaces with a wavefront that has *no* in-row dependency at all).

Key idea: for cell (x, y), all three dependencies — diag (x-1,y-1), up
(x,y-1), left (x-1,y) — lie on the previous two anti-diagonals t-1/t-2
(t = x+y). The per-cell convex-gap run-length state (indelRun) therefore
propagates exactly, with no approximation, using only elementwise ops and
static cyclic shifts:

  * lanes form a ring buffer over rows: lane(y) = y mod L. The active rows of
    a wavefront are a contiguous window (y+lo[y] and y+hi[y] are strictly
    increasing) whose bounds move by at most 1 per step, so with
    L >= max_window + 2 each residue class has at most one active row, and
    inactive lanes hold exactly the reference's out-of-corridor `empty`
    element {score 0, dir STOP, run 0} (AlignmentMatrixFast.h:74-131),
  * left neighbor = same lane at t-1; up = lane-1 at t-1; diag = lane-1 at
    t-2 — all static cyclic rolls,
  * best-cell tracking reproduces the reference's first-in-row-major-order
    strict-maximum rule (ConvexAlignFast.cpp:752-758) via lexicographic
    (score desc, y asc, x asc) selection.

Output per alignment: direction plane [T, L] (uint8: 0 STOP / 1 DIAG /
2 INS / 3 DEL), best score/x/y. Backtracking and CIGAR generation are
host-side (ngmlr_tpu.align.cigar) — O(path length) work.
"""

from dataclasses import dataclass
import functools
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

STOP, DIAG, INS, DEL = 0, 1, 2, 3

DEFAULT_PARAMS = (2.0, -5.0, -5.0, -5.0, -1.0, 0.15)


@dataclass
class BandSpec:
    """Host-side description of one banded alignment problem."""
    ref: bytes
    qry: bytes
    offsets: np.ndarray       # int64 [H] per-row corridor offset
    width: int                # corridor length (constant per row; all four
                              # corridor generators in AlignmentBuffer.cpp
                              # :52-197 produce constant-length rows)

    ymin: Optional[np.ndarray] = None   # int32 [T]
    ymax: Optional[np.ndarray] = None   # int32 [T]
    T: int = 0
    L: int = 0

    def prepare(self) -> "BandSpec":
        H, W = len(self.qry), len(self.ref)
        off = np.asarray(self.offsets, dtype=np.int64)
        lo = np.clip(off, 0, W)
        hi = np.clip(off + self.width, 0, W)
        hi = np.maximum(hi, lo)
        y = np.arange(H, dtype=np.int64)
        key_hi = y + hi                       # strictly increasing
        key_lo = y + lo
        T = W + H - 1
        t = np.arange(T, dtype=np.int64)
        # active rows on wavefront t: ymin(t) <= y <= ymax(t)
        self.ymin = np.searchsorted(key_hi, t, side="right").astype(np.int32)
        self.ymax = (np.searchsorted(key_lo, t, side="right") - 1).astype(np.int32)
        self.T = T
        win = self.ymax - self.ymin + 1
        self.L = int(max(1, win.max() if len(win) else 1)) + 2
        return self


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("L",))
def _wavefront_kernel(ref_codes, qry_codes, ymin, ymax, params, L: int):
    """ref/qry codes: uint8 [B, Tp] ASCII; ymin/ymax: int32 [B, Tp];
    params: f32 [6] = mat, mis, gap_open, gap_ext, gap_ext_min, gap_decay.
    Returns (dirs uint8 [Tp, B, L], best f32 [B], best_y i32 [B], best_x i32 [B]).
    """
    B, Tp = ref_codes.shape
    mat, mis, go, ge, gemin, gdecay = [params[i] for i in range(6)]
    lanes = jnp.arange(L, dtype=jnp.int32)[None, :]           # [1, L]
    BIG = jnp.int32(2 ** 30)

    def step(carry, xs):
        (s1, d1, r1, s2, best, by, bx) = carry
        t, ym, yx = xs                                         # i32 scalar, [B], [B]
        r = jnp.mod(lanes - ym[:, None], L)                    # [B, L]
        y = ym[:, None] + r
        valid = (y <= yx[:, None]) & (ym <= yx)[:, None]
        x = t - y

        xc = jnp.clip(x, 0, Tp - 1)
        yc = jnp.clip(y, 0, Tp - 1)
        rc = jnp.take_along_axis(ref_codes, xc, axis=1)
        qc = jnp.take_along_axis(qry_codes, yc, axis=1)
        eq = rc == qc

        up_s = jnp.roll(s1, 1, axis=1)
        up_d = jnp.roll(d1, 1, axis=1)
        up_r = jnp.roll(r1, 1, axis=1)
        diag_s = jnp.roll(s2, 1, axis=1)
        lf_s, lf_d, lf_r = s1, d1, r1

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

        # best tracking: lexicographic (score desc, y asc, x asc) ==
        # first strict maximum in the reference's row-major scan
        cand = jnp.where(valid, new_s, -jnp.inf)
        m = cand.max(axis=1)                                     # [B]
        ys = jnp.where(valid & (cand == m[:, None]), y, BIG)
        y_m = ys.min(axis=1).astype(jnp.int32)
        x_m = t.astype(jnp.int32) - y_m
        better = (m > best) | ((m == best) & ((y_m < by) | ((y_m == by) & (x_m < bx))))
        best = jnp.where(better, m, best)
        by = jnp.where(better, y_m, by)
        bx = jnp.where(better, x_m, bx)

        return (new_s, new_d, new_r, s1, best, by, bx), new_d

    zf = jnp.zeros((B, L), jnp.float32)
    zd = jnp.zeros((B, L), jnp.uint8)
    zr = jnp.zeros((B, L), jnp.int32)
    best0 = jnp.full((B,), -1.0, jnp.float32)
    byx0 = jnp.zeros((B,), jnp.int32)

    ts = jnp.arange(Tp, dtype=jnp.int32)
    xs = (ts, ymin.T, ymax.T)
    (_, _, _, _, best, by, bx), dirs = jax.lax.scan(
        step, (zf, zd, zr, zf, best0, byx0, byx0), xs)
    # pack 4 wavefronts per byte (2-bit directions) to cut host transfer 4x
    d4 = dirs.reshape(Tp // 4, 4, B, L)
    packed = (d4[:, 0] | (d4[:, 1] << 2) | (d4[:, 2] << 4)
              | (d4[:, 3] << 6)).astype(jnp.uint8)
    return packed, best, by, bx


@dataclass
class WavefrontResult:
    score: float
    best_x: int
    best_y: int
    dirs: np.ndarray       # packed [T//4, L] uint8: 4 wavefronts per byte
    L: int

    def dir_at(self, x: int, y: int) -> int:
        if x < 0 or y < 0:
            return STOP
        t = x + y
        if t >= self.dirs.shape[0] * 4:
            return STOP
        return (int(self.dirs[t >> 2, y % self.L]) >> ((t & 3) * 2)) & 3


def run_batch(specs: List[BandSpec],
              params=DEFAULT_PARAMS) -> List[WavefrontResult]:
    """Run band problems, bucketed by padded (T, L) shape."""
    for sp in specs:
        if sp.ymin is None:
            sp.prepare()
    results: List[Optional[WavefrontResult]] = [None] * len(specs)

    buckets = {}
    for i, sp in enumerate(specs):
        # power-of-two padding caps the number of compiled kernel shapes
        Tp = 256
        while Tp < sp.T:
            Tp *= 2
        L = 128
        while L < sp.L:
            L *= 2
        buckets.setdefault((Tp, L), []).append(i)

    pvec = jnp.asarray(params, dtype=jnp.float32)
    for (Tp, L), idxs in buckets.items():
        B = len(idxs)
        ref_c = np.zeros((B, Tp), dtype=np.uint8)
        qry_c = np.full((B, Tp), 255, dtype=np.uint8)  # never equals ref pad 0
        ymin = np.zeros((B, Tp), dtype=np.int32)
        ymax = np.full((B, Tp), -1, dtype=np.int32)    # empty window on padding
        for bi, i in enumerate(idxs):
            sp = specs[i]
            ref_c[bi, :len(sp.ref)] = np.frombuffer(sp.ref, dtype=np.uint8)
            qry_c[bi, :len(sp.qry)] = np.frombuffer(sp.qry, dtype=np.uint8)
            ymin[bi, :sp.T] = sp.ymin
            ymax[bi, :sp.T] = sp.ymax
        packed, best, by, bx = _wavefront_kernel(
            jnp.asarray(ref_c), jnp.asarray(qry_c), jnp.asarray(ymin),
            jnp.asarray(ymax), pvec, L=L)
        packed = np.asarray(packed)          # [Tp//4, B, L] uint8
        best = np.asarray(best)
        by = np.asarray(by)
        bx = np.asarray(bx)
        for bi, i in enumerate(idxs):
            results[i] = WavefrontResult(
                float(best[bi]), int(bx[bi]), int(by[bi]),
                packed[:, bi, :], L)
    return results
