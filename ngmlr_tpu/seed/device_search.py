"""Device-side candidate search: the CS stage's vote/bin/emergence logic
as one jitted XLA program over the device-resident k-mer index.

At human-genome scale the host-side search_batch dominates wall time
(~4 s per 192-read batch on the 1-core host: 15M-vote expansions, random
gathers into a GB-scale position list, and two 15M-element sorts). All of
it is gather/sort/scan — XLA-native — so this module uploads the index
once (bucket starts + positions, the same arrays the host path uses) and
computes everything else ON DEVICE. The k-mer prefixes themselves are
extracted from the device-resident read-code buffer (the same buffer the
scoring/alignment kernels use), so per batch the host uploads only the
subread descriptors (two int32 per subread, ~64 KB) and downloads the
per-subread vote counts plus the compacted candidate lists — on the
~25 ms / ~50 MB/s tunnel this replaces the earlier ~30 MB of per-batch
k-mer metadata traffic (measured 0.6+ s/batch, scripts/profile_search.py).

Exactness: identical semantics to ngmlr_tpu.seed.candidates.search_batch
(the host twin — the CPU path and the test oracle), which replays the
reference's rList emergence order (CS.cpp:57-269):

  * votes are GENERATED in the reference's order — k-mer emission major
    (subread-major, position ascending; N-containing k-mers emit nothing),
    forward bucket before reverse-complement bucket per k-mer, bucket
    position order — so the vote stream needs no sort at all,
  * per-(subread, bin, strand) occurrence ranks come from one stable
    multi-key sort plus its inverse permutation (computed by a second
    sort — no scatters on the hot arrays),
  * the running per-subread maximum uses the same packed-key cummax
    trick as the host (sub in high bits; subreads are non-decreasing in
    vote order), and the crossing test is the same float32 arithmetic
    (count >= f32(run_max) * f32(sensitivity), AddLocationStd
    CS.cpp:136-148),
  * entries (bins) order by their first crossing vote; the final filter
    re-applies the final threshold, forward before reverse per entry
    (CollectResultsStd CS.cpp:248-263).

Capacity guards (the caller falls back to the host path): subread count
< 2^15 per slice (bigger batches self-split), subread length <= 272,
per-group counts < 2^16 (overflow flag), votes <= 2^22 per chunk,
entries <= 2^16 per chunk.
"""

import functools
import os
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..index.kmer_index import KmerIndex
from .candidates import SubreadCandidates

f32 = np.float32

COUNT_BITS = 16                     # per-group occurrence rank < 2^16
# (a group is one (subread, diagonal-bin, strand); its count is bounded by
# the subread's k-mers x same-bin hits — real workloads peak in the low
# hundreds, and the overflow flag falls back to the host path regardless)
MAX_SUBS = 1 << 15                  # subread slots per batch (sub id and
# rank pack into one int31 for the running-max cummax: 15 + 16 bits)
NE_CAP = 1 << 16                    # returned entry rows per chunk
NV_MAX = 1 << 22                    # largest padded vote class: XLA sort
# compile time explodes beyond this (2^24 measured 40+ min vs ~5 min at
# 2^22); bigger batches are split into per-subread chunks instead —
# candidate search is independent across subreads
BIN_SENTINEL = np.int32(1) << 29    # invalid-vote bin (> any real bin)
SL = 272                            # dense k-mer slots per subread (the
# pipeline's subreads are <= 256 bp, ReadProvider.cpp:60; 272 also covers
# slightly longer ad-hoc probes)


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


def _rc_dev(p, k: int):
    """Reverse-complement of 2-bit prefixes on device — mirrors
    kmer_index.revcomp_prefix (complement = XOR 0b10 per base is encoded
    there via the 0xAAA.. constant; base order reversed)."""
    mask = jnp.int32((1 << (2 * k)) - 1)
    pc = p ^ (jnp.int32(0x2AAAAAAA) & mask)
    out = jnp.zeros_like(p)
    for i in range(k):
        out = out | (((pc >> (2 * i)) & 3) << (2 * (k - 1 - i)))
    return out


def _kmer_mat(codes, starts, lens, k: int):
    """[NS, SL] k-mer prefixes + validity from the device-resident code
    buffer (device code space A=0,T=1,G=2,C=3,N=4). Prefix encoding is
    the reference's (char >> 1) & 3 per base (CSstatic.cpp:22-72), i.e.
    A=0,C=1,T=2,G=3 — _KM below maps between the two spaces. k-mers
    containing any non-ACGT code are invalid (kseq/kmer_stream N-run
    semantics); position p is valid iff p + k <= len."""
    NS = starts.shape[0]
    WIN = SL + k - 1
    _KM = jnp.asarray([0, 2, 3, 1, 0, 0, 0, 0], dtype=jnp.int32)
    j = jnp.arange(WIN, dtype=jnp.int32)[None, :]
    idx = jnp.minimum(starts[:, None] + j,
                      jnp.int32(codes.shape[0] - 1))
    win = jnp.take(codes, idx.reshape(-1),
                   mode="clip").reshape(NS, WIN).astype(jnp.int32)
    kmc = jnp.take(_KM, jnp.minimum(win, 7), mode="clip")
    bad = win >= 4
    pfx = jnp.zeros((NS, SL), jnp.int32)
    anybad = jnp.zeros((NS, SL), bool)
    for jj in range(k):
        pfx = (pfx << 2) | kmc[:, jj:jj + SL]
        anybad = anybad | bad[:, jj:jj + SL]
    pos = jnp.arange(SL, dtype=jnp.int32)[None, :]
    valid = (~anybad) & (pos + k <= lens[:, None])
    return jnp.where(valid, pfx, 0), valid


@functools.partial(jax.jit, static_argnames=("k",))
def _count_kernel(bucket_pairs, codes, starts, lens, k: int):
    """Per-subread vote counts (the host uses them to split the batch
    into chunks that fit the largest compiled vote class), zero-hit k-mer
    counts (the CS mappingQlty=0 rule input, CS.cpp:221-226), AND the
    per-k-mer bucket offsets/counts — kept device-resident and consumed
    by the chunk kernels so the k-mer extraction + index gathers run
    once per batch, not once per chunk. bucket_pairs[p] = (start, count)
    of prefix p's bucket: one row gather per strand instead of two
    single gathers (row gathers are ~2.7x cheaper per value here)."""
    pfx, valid = _kmer_mat(codes, starts, lens, k)
    rc = _rc_dev(pfx, k)
    NS = pfx.shape[0]
    fp = bucket_pairs[pfx.reshape(-1)].reshape(NS, SL, 2)
    rp = bucket_pairs[rc.reshape(-1)].reshape(NS, SL, 2)
    fs = fp[:, :, 0]
    fc = jnp.where(valid, fp[:, :, 1], 0)
    rs = rp[:, :, 0]
    rcnt = jnp.where(valid, rp[:, :, 1], 0)
    votes = jnp.sum(fc + rcnt, axis=1)
    kcnt = jnp.sum((valid & ((fc + rcnt) == 0)).astype(jnp.int32), axis=1)
    return votes, kcnt, fs, fc, rs, rcnt


@functools.partial(
    jax.jit, static_argnames=("k", "bin_size", "NSc", "NV", "sens",
                              "min_kmer_hits"))
def _search_kernel(positions, fs_all, fc_all, rs_all, rcnt_all, lens,
                   s0m, delta, n_sub,
                   k: int, bin_size: int, NSc: int, NV: int,
                   sens: float, min_kmer_hits: float):
    """One chunk (subreads [s0m + delta, s0m + delta + n_sub)) of a batch.
    fs/fc/rs/rcnt are the count kernel's device-resident per-k-mer bucket
    offsets/counts [NSp, SL]; the slice starts at s0m (clamped so
    s0m + NSc fits — `delta` re-bases the row ids so sub 0 is the chunk's
    first real subread). Vote expansion, ranking, thresholding, and entry
    compaction run here. Returns fixed-shape entry arrays + an overflow
    flag."""
    ln = jax.lax.dynamic_slice(lens, (s0m,), (NSc,))
    fs2 = jax.lax.dynamic_slice(fs_all, (s0m, 0), (NSc, SL))
    fc2 = jax.lax.dynamic_slice(fc_all, (s0m, 0), (NSc, SL))
    rs2 = jax.lax.dynamic_slice(rs_all, (s0m, 0), (NSc, SL))
    rcnt2 = jax.lax.dynamic_slice(rcnt_all, (s0m, 0), (NSc, SL))
    row = jnp.arange(NSc, dtype=jnp.int32)
    in_chunk = (row >= delta) & (row < delta + n_sub)
    fc2 = jnp.where(in_chunk[:, None], fc2, 0)
    rcnt2 = jnp.where(in_chunk[:, None], rcnt2, 0)

    # --- votes in reference order (emission-major, fwd before rev) -------
    # fwd/rev buckets interleave as even/odd slots of one doubled k-mer
    # table: the vote stream then needs only THREE NV-sized gathers
    # (slot starts, slot base offsets, positions) — the expansion gathers
    # were the chunk kernel's dominant cost (scripts/profile_search_stages)
    NK2 = 2 * NSc * SL
    base2 = jnp.stack([fs2, rs2], axis=-1).reshape(NK2)
    c2 = jnp.stack([fc2, rcnt2], axis=-1).reshape(NK2)
    cum2 = jnp.cumsum(c2)
    total_votes = cum2[NK2 - 1]
    kmer2 = jnp.repeat(jnp.arange(NK2, dtype=jnp.int32), c2,
                       total_repeat_length=NV)
    j = jnp.arange(NV, dtype=jnp.int32)
    v_valid = j < total_votes
    is_rev = kmer2 & 1
    flat_k = kmer2 >> 1
    # sub comes from the flat k-mer id arithmetically (a dense SL-slot
    # layout); the bucket position index folds the slot base and the
    # vote-stream start into a difference table, and the bin correction
    # is per-slot too — the two ride ONE row gather ([NV, 2] from
    # [NK2, 2] measured 2.7x cheaper than two single gathers;
    # scripts/profile_search.py / trace_search.py)
    sub = (flat_k // SL) - delta
    d2t = base2 - (cum2 - c2)
    posk2 = jnp.broadcast_to(
        jnp.arange(SL, dtype=jnp.int32)[None, :], (NSc, SL))
    ct_f = posk2
    ct_r = ln[:, None] - (posk2 + k)
    ct2 = jnp.stack([ct_f, ct_r], axis=-1).reshape(NK2)
    dt_ct = jnp.stack([d2t, ct2], axis=-1)            # [NK2, 2]
    gv = dt_ct[kmer2]                                 # [NV, 2] row gather
    pos_idx = jnp.clip(j + gv[:, 0], 0, positions.shape[0] - 1)
    loc = positions[pos_idx]
    corr = gv[:, 1]
    v_bin = ((loc - corr.astype(jnp.uint32)) >> bin_size).astype(jnp.int32)
    v_sub = jnp.where(v_valid, sub, jnp.int32(MAX_SUBS - 1))
    v_str = is_rev
    v_bin = jnp.where(v_valid, v_bin, BIN_SENTINEL)

    # --- per-(sub, bin, strand) occurrence rank: sort + inverse sort -----
    g2 = v_bin * 2 + v_str
    arange_v = jnp.arange(NV, dtype=jnp.int32)
    s_sub, s_g2, s_idx = jax.lax.sort((v_sub, g2, arange_v), num_keys=3)
    new_grp = jnp.concatenate([
        jnp.ones(1, bool),
        (s_sub[1:] != s_sub[:-1]) | (s_g2[1:] != s_g2[:-1])])
    grp_start = jax.lax.cummax(jnp.where(new_grp, arange_v, -1))
    rank_sorted = arange_v - grp_start              # 0-based within group
    # inverse permutation via a sort keyed by the permutation itself;
    # grp_start rides along so the crossing pass can scatter straight
    # from vote space (no sorted-space re-gather)
    _, count_after_m1, grp_of_vote = jax.lax.sort(
        (s_idx, rank_sorted, grp_start), num_keys=1)
    count_after = count_after_m1 + 1
    overflow = jnp.max(jnp.where(v_valid, count_after, 0)) \
        >= (1 << COUNT_BITS)

    # --- running threshold crossing (f32, AddLocationStd) ----------------
    ckey = (v_sub << COUNT_BITS) | jnp.minimum(count_after,
                                               (1 << COUNT_BITS) - 1)
    run_max = jax.lax.cummax(ckey) & ((1 << COUNT_BITS) - 1)
    thresh = run_max.astype(jnp.float32) * jnp.float32(sens)
    crossing = v_valid & (count_after.astype(jnp.float32) >= thresh)


    # --- group stats in group-sorted space (groups are contiguous) -------
    # first crossing VOTE INDEX per group: scatter-min of the crossing
    # votes' indices keyed by the group representative (the group's first
    # sorted row — unique per group; grp_of_vote maps it to vote space),
    # consumed at each group's LAST row where running min == full-group
    # min. A (flag, value) associative_scan here never finished compiling
    # on the chip backend (scripts/profile_search.py).
    candv = jnp.where(crossing, j, jnp.int32(NV))
    seg_min = jnp.full(NV, jnp.int32(NV)).at[grp_of_vote].min(candv,
                                                              mode="drop")
    first_cross_sorted = seg_min[grp_start]
    grp_size_sorted = rank_sorted + 1      # running size; last row = size

    # group boundary rows (last row of each group) carry the group's stats
    is_last = jnp.concatenate([new_grp[1:], jnp.ones(1, bool)])
    # per-row group stats valid at last rows:
    g_sub = s_sub
    g_bin = s_g2 >> 1
    g_str = s_g2 & 1

    # pair fwd/rev groups of one (sub, bin): their LAST rows are adjacent
    # in the boundary-row subsequence; compact boundary rows by sorting
    # non-boundary rows to the end, preserving group order
    brow_key = jnp.where(is_last, arange_v, jnp.int32(NV))
    bk, b_sub, b_bin, b_str, b_size, b_first = jax.lax.sort(
        (brow_key, g_sub, g_bin, g_str, grp_size_sorted,
         first_cross_sorted), num_keys=1)
    b_valid = bk < NV
    same_prev = jnp.concatenate([
        jnp.zeros(1, bool),
        (b_sub[1:] == b_sub[:-1]) & (b_bin[1:] == b_bin[:-1])])
    nxt_size = jnp.concatenate([b_size[1:], jnp.zeros(1, jnp.int32)])
    nxt_first = jnp.concatenate([b_first[1:],
                                 jnp.full(1, NV, jnp.int32)])
    has_next = jnp.concatenate([same_prev[1:], jnp.zeros(1, bool)])
    is_entry = b_valid & (~same_prev) & (b_bin < (BIN_SENTINEL >> 1))
    e_fwd = jnp.where(b_str == 0, b_size, 0)
    e_rev = jnp.where(b_str == 0, jnp.where(has_next, nxt_size, 0), b_size)
    e_first = jnp.minimum(b_first, jnp.where(has_next, nxt_first, NV))
    # final threshold ON DEVICE before compaction: pre-filter entries are
    # plentiful (every early vote crosses while run_max is still small —
    # millions per batch); kept candidates are the compact result.
    # Per-sub FINAL max group count via forward + reverse packed segmented
    # cummax over the (sub-sorted) boundary rows — the sub id in the high
    # bits resets the running max at each sub boundary, the reverse scan
    # uses the complemented sub id to stay non-decreasing. Replaces a
    # scatter-max + table gather, each ~30 ms at NV (trace_search.py).
    cmask = jnp.int32((1 << COUNT_BITS) - 1)
    bsub_m = jnp.where(b_valid, b_sub, jnp.int32(MAX_SUBS - 1))
    bsz_m = jnp.where(b_valid, jnp.minimum(b_size, cmask), 0)
    fwd_max = jax.lax.cummax((bsub_m << COUNT_BITS) | bsz_m) & cmask
    rev_max = jax.lax.cummax(
        ((jnp.int32(MAX_SUBS - 1) - bsub_m) << COUNT_BITS) | bsz_m,
        reverse=True) & cmask
    th = jnp.maximum(
        jnp.float32(min_kmer_hits),
        jnp.maximum(fwd_max, rev_max).astype(jnp.float32)
        * jnp.float32(sens))
    keep_f = e_fwd.astype(jnp.float32) >= th
    keep_r = e_rev.astype(jnp.float32) >= th
    entry_ok = is_entry & (e_first < NV) & (keep_f | keep_r)

    # --- order kept entries by (sub, first crossing vote); compact -------
    # payloads pack into two int32 columns (fewer sort operands, and the
    # host fetch drops from 6 to 3 NE_CAP-sized arrays): p1 = bin<<2 |
    # keep_f<<1 | keep_r, p2 = fwd<<16 | rev (counts < 2^16 whenever the
    # overflow flag is clear, which is the only case the host consumes)
    p1 = (b_bin << 2) | (keep_f.astype(jnp.int32) << 1) \
        | keep_r.astype(jnp.int32)
    p2 = (jnp.minimum(e_fwd, cmask) << COUNT_BITS) | jnp.minimum(e_rev,
                                                                 cmask)
    o_sub, o_first, o_p1, o_p2 = jax.lax.sort(
        (jnp.where(entry_ok, b_sub, jnp.int32(MAX_SUBS)),
         jnp.where(entry_ok, e_first, NV), p1, p2), num_keys=2)
    n_entries = jnp.sum(entry_ok.astype(jnp.int32))
    overflow = overflow | (n_entries > NE_CAP) | (total_votes > NV)

    return (o_sub[:NE_CAP], o_p1[:NE_CAP], o_p2[:NE_CAP],
            n_entries, overflow)


# --- v2 row-local chunk kernel ---------------------------------------------
# One subread per ROW of a [B, L] launch (L = vote-count size class).
# Motivation (scripts/bench_sort_strategies.py, measured on the chip):
# batched row sorts cost 2-6 ms at 2^22 total elements vs 8-14 ms for
# global sorts, and — decisively — row-LOCAL indices fit packed int32
# scan keys, so every segmented reduction (rank-in-group, segment
# broadcast, first-crossing min) becomes a ~2 ms cumsum/cummax instead of
# a ~60 ms NV-sized scatter/gather. The v1 global kernel (above) remains
# the fallback for outlier subreads (> L_V2_MAX votes) and overflow rows.
E_CAP = 256                  # entries kept per subread row (per-row
# overflow -> that row falls back); real subreads produce 1-50
NE2 = 1 << 14                # compacted entry rows fetched per launch
BL_MAX = 1 << 22             # B*L budget per launch (sort compile ceiling)
L_V2_MAX = 1 << 15           # max vote class: row-local l must fit 15 bits
# for the packed scan keys ((seg_rank << 16) | value etc.)


@functools.partial(
    jax.jit, static_argnames=("k", "bin_size", "B", "L", "sens",
                              "min_kmer_hits", "ec", "ne2", "expand"))
def _search_kernel_v2(positions, fs_all, fc_all, rs_all, rcnt_all, ln_all,
                      rows, n_real,
                      k: int, bin_size: int, B: int, L: int,
                      sens: float, min_kmer_hits: float,
                      ec: int = E_CAP, ne2: int = NE2,
                      expand: str = "xla"):
    """Row-local candidate search: row b = subread rows[b], L vote slots.

    Exact same semantics as _search_kernel / the host twin (CS.cpp
    emergence order): emission order within a row is (k-mer slot, fwd
    bucket then rev bucket, bucket position) = ascending l by
    construction; groups are (bin, strand); entries are bins ordered by
    first crossing vote. Returns per-launch compacted entries
    (o_row, o_p1, o_p2) exactly like the v1 kernel's fetch shape, plus
    per-row entry counts (the host re-splits and detects per-row
    overflow: n_ent > E_CAP or entry ranks beyond NE2 fall back)."""
    SL2 = 2 * SL
    f32j = jnp.float32
    ln = ln_all[rows]
    fs2 = fs_all[rows]
    fc2 = fc_all[rows]
    rs2 = rs_all[rows]
    rcnt2 = rcnt_all[rows]
    rowi = jnp.arange(B, dtype=jnp.int32)
    live = rowi < n_real
    fc2 = jnp.where(live[:, None], fc2, 0)
    rcnt2 = jnp.where(live[:, None], rcnt2, 0)

    # --- slot tables (even = fwd, odd = rev, one pad slot at the end) ----
    base2 = jnp.stack([fs2, rs2], axis=-1).reshape(B, SL2)
    c2 = jnp.stack([fc2, rcnt2], axis=-1).reshape(B, SL2)
    posk = jnp.broadcast_to(jnp.arange(SL, dtype=jnp.int32)[None, :],
                            (B, SL))
    ct2 = jnp.stack([posk, ln[:, None] - (posk + k)], axis=-1).reshape(
        B, SL2)
    cum2 = jnp.cumsum(c2, axis=1)
    nv = cum2[:, -1]                                   # votes per row (<= L)
    c2p = jnp.concatenate([c2, (L - nv)[:, None]], axis=1)
    d2tp = jnp.concatenate(
        [base2 - (cum2 - c2), jnp.zeros((B, 1), jnp.int32)], axis=1)
    ct2p = jnp.concatenate([ct2, jnp.zeros((B, 1), jnp.int32)], axis=1)

    # --- expansion: per-vote slot values -------------------------------
    cols = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None, :], (B, L))
    if expand == "pallas":
        # telescoping compare-accumulate kernel (pallas_kernels.expand_
        # votes): slot(l) = #{j: cum2[j] <= l}, values via diff sums —
        # replaces the repeat (binary-search gather) + packed row gather
        from ..ops.pallas_kernels import expand_votes
        SLP = ((SL2 + 1 + 127) // 128) * 128
        Bp = ((B + 127) // 128) * 128

        def tab(x, pad_val):
            x = jnp.pad(x, ((0, Bp - B), (0, SLP - x.shape[1])),
                        constant_values=pad_val)
            return x.T
        bnd = tab(cum2, np.int32(2 ** 30))            # j -> cum2[:, j]
        dd = tab(d2tp[:, 1:] - d2tp[:, :-1], 0)
        dc = tab(ct2p[:, 1:] - ct2p[:, :-1], 0)
        v0 = jnp.zeros((8, Bp), jnp.int32)
        v0 = v0.at[0, :B].set(d2tp[:, 0]).at[1, :B].set(ct2p[:, 0])
        slot_T, d2t_T, ct_T = expand_votes(bnd, dd, dc, v0, L)
        slot = slot_T.T[:B]
        pos_idx = jnp.clip(d2t_T.T[:B] + cols, 0, positions.shape[0] - 1)
        corr = ct_T.T[:B]
    else:
        # flat repeat + one packed row gather (v1's expansion layout)
        NKP = B * (SL2 + 1)
        kmer_f = jnp.repeat(jnp.arange(NKP, dtype=jnp.int32),
                            c2p.reshape(-1), total_repeat_length=B * L)
        dt_ct = jnp.stack([d2tp.reshape(-1), ct2p.reshape(-1)], axis=-1)
        gv = dt_ct[kmer_f].reshape(B, L, 2)
        slot = kmer_f.reshape(B, L) % (SL2 + 1)
        pos_idx = jnp.clip(gv[:, :, 0] + cols, 0, positions.shape[0] - 1)
        corr = gv[:, :, 1]
    loc = positions[pos_idx.reshape(-1)].reshape(B, L)
    strand = slot & 1
    valid = slot < SL2
    v_bin = jnp.where(
        valid,
        ((loc - corr.astype(jnp.uint32)) >> bin_size).astype(jnp.int32),
        BIN_SENTINEL)

    # --- sort1: group by bin per row (stable: emission order within) ----
    pay = (cols << 1) | strand
    s_bin, s_pay = jax.lax.sort((v_bin, pay), dimension=1, num_keys=1)
    st = s_pay & 1
    l_s = s_pay >> 1
    valid_s = s_bin < BIN_SENTINEL
    new_seg = jnp.concatenate(
        [jnp.ones((B, 1), bool), s_bin[:, 1:] != s_bin[:, :-1]], axis=1)
    seg_rank = jnp.cumsum(new_seg.astype(jnp.int32), axis=1) - 1  # < L

    # --- per-(bin, strand) emission ranks via packed segment broadcasts --
    CM = jnp.int32(0xFFFF)
    csum_r = jnp.cumsum(st, axis=1)                    # inclusive rev count
    csum_f = (cols + 1) - csum_r
    r_excl = csum_r - st
    f_excl = csum_f - (1 - st)

    def seg_bcast(x):
        # broadcast x's value at each segment's first column to the whole
        # segment: packed (col << 16 | x) cummax (x <= L <= 2^15 < 2^16)
        p = jnp.where(new_seg, (cols << 16) | x, -1)
        return jax.lax.cummax(p, axis=1) & CM

    rb = seg_bcast(r_excl)
    fb = seg_bcast(f_excl)
    count_after = jnp.where(st == 1, csum_r - rb, csum_f - fb)
    ca = jnp.where(valid_s, count_after, 0)

    # --- sort2: to emission space; running max + crossing ----------------
    _, ca_em, spos_em = jax.lax.sort((s_pay, ca, cols), dimension=1,
                                     num_keys=1)
    run_max = jax.lax.cummax(ca_em, axis=1)
    crossing_em = (ca_em.astype(f32j)
                   >= run_max.astype(f32j) * f32j(sens)) & (ca_em > 0)
    row_max = run_max[:, -1]
    th = jnp.maximum(f32j(min_kmer_hits),
                     row_max.astype(f32j) * f32j(sens))[:, None]

    # --- sort3: crossing back to bin-sorted space ------------------------
    _, cross_s = jax.lax.sort((spos_em, crossing_em.astype(jnp.int32)),
                              dimension=1, num_keys=1)

    # first crossing vote (min l) per segment: packed cummax with the
    # segment rank in the high bits (current segment dominates earlier
    # ones) and the complemented l in the low bits (max -> min l)
    BIGV = jnp.int32(0xFFFF)
    cl = jnp.where((cross_s == 1) & valid_s, l_s, BIGV)
    pm = jax.lax.cummax((seg_rank << 16) | (BIGV - cl), axis=1)
    fc_val = BIGV - (pm & CM)

    # --- entries at segment-last columns ---------------------------------
    is_last = jnp.concatenate(
        [new_seg[:, 1:], jnp.ones((B, 1), bool)], axis=1)
    nr_seg = csum_r - rb
    nf_seg = csum_f - fb
    keep_f = nf_seg.astype(f32j) >= th
    keep_r = nr_seg.astype(f32j) >= th
    entry_ok = (is_last & valid_s & (fc_val < BIGV) & (keep_f | keep_r))
    p1 = (s_bin << 2) | (keep_f.astype(jnp.int32) << 1) \
        | keep_r.astype(jnp.int32)
    p2 = (jnp.minimum(nf_seg, CM) << 16) | jnp.minimum(nr_seg, CM)

    # --- sort4: per-row entry order by first crossing vote ---------------
    key4 = jnp.where(entry_ok, fc_val, jnp.int32(2 ** 30))
    k4, o1, o2 = jax.lax.sort((key4, p1, p2), dimension=1, num_keys=1)
    n_ent = jnp.sum(entry_ok.astype(jnp.int32), axis=1)
    # a group of exactly 2^15 votes would overflow the p2 count packing
    # (nf << 16 wraps the sign bit) — flag the row for host retry
    n_ent = n_ent | ((row_max >= jnp.int32(1 << 15)).astype(jnp.int32)
                     << 20)

    # --- cross-row compaction to the v1 fetch shape ----------------------
    EC = min(ec, L)
    k4 = k4[:, :EC]
    flat_ok = (k4 < 2 ** 30).reshape(-1)
    flat_iota = jnp.arange(B * EC, dtype=jnp.int32)
    rowid = jnp.broadcast_to(rowi[:, None], (B, EC)).reshape(-1)
    ck, o_row, o_p1, o_p2 = jax.lax.sort(
        (jnp.where(flat_ok, flat_iota, jnp.int32(2 ** 30)), rowid,
         o1[:, :EC].reshape(-1), o2[:, :EC].reshape(-1)), num_keys=1)
    ne2 = min(ne2, B * EC)
    return (o_row[:ne2], o_p1[:ne2], o_p2[:ne2], n_ent)


class DeviceSearch:
    """Batched candidate search on the device; search_batch returns None
    (caller uses the host path) when unsupported or over capacity."""

    def __init__(self, index: KmerIndex):
        self.index = index
        self.available = True
        if len(index.positions) and index.positions.dtype == np.int64 \
                and int(index.positions[-1]) >= 2 ** 32:
            # cheap necessary check (positions are bucket-sorted, so the
            # last bucket's tail being >= 2^32 implies a multi-unit
            # genome); the Pipeline gates on ref.n_units before
            # constructing a DeviceSearch — this guards ad-hoc callers
            self.available = False
            from ..native import _warn_fallback
            _warn_fallback(
                "multi-unit genome: device candidate search needs per-unit "
                "uint32 tables — falling back to the host search path")
            return
        if index.uniq_prefix is None:
            bucket_start = index.bucket_start.astype(np.int32)
        else:
            # densify a sparse index (tiny genomes): positions are sorted
            # by prefix either way, so the dense starts index the same
            # position array
            n_prefix = 4 ** index.k
            counts = np.zeros(n_prefix, np.int32)
            counts[index.uniq_prefix] = np.diff(index.bucket_start)
            bucket_start = np.zeros(n_prefix + 1, np.int32)
            np.cumsum(counts, out=bucket_start[1:])
        # (start, count) pairs per prefix — the count kernel's row-gather
        # layout (see _count_kernel)
        pairs = np.empty((len(bucket_start) - 1, 2), dtype=np.int32)
        pairs[:, 0] = bucket_start[:-1]
        pairs[:, 1] = bucket_start[1:] - bucket_start[:-1]
        self.bucket_pairs = jax.device_put(pairs)
        self.positions = jax.device_put(index.positions.astype(np.uint32))

    def _stat(self, key: str, dt: float):
        """Accumulate a stage-timing stat on the active DeviceContext (the
        bench/progress observability channel)."""
        from ..ops import device_engine
        ctx = device_engine.current()
        if ctx is not None:
            with ctx._stats_lock:
                ctx.stats[key] = ctx.stats.get(key, 0.0) + dt

    _warned_len = False

    def _fallback(self, reason: str):
        """Record (and, for the length cliff, loudly warn about) a whole-
        slice fall-back to the host search path — a large hidden perf
        cliff otherwise (advisor r4: silent SL rejection / 2^16 rank cap
        reversion were invisible in bench output)."""
        self._stat("search_fallback_" + reason, 1)
        if reason == "len" and not DeviceSearch._warned_len:
            DeviceSearch._warned_len = True
            from ..native import _warn_fallback
            _warn_fallback(
                "device candidate search rejected a batch with subread "
                "length > %d (non-default --subread-length?) — the whole "
                "search stage falls back to the host path, which is much "
                "slower at large genome scales" % SL)
        return None

    def _run_v2(self, fs_dev, fc_dev, rs_dev, rcnt_dev, ln_dev,
                votes_per_sub, k_counts, lens, n_seqs,
                sensitivity, min_kmer_hits
                ) -> Optional[List[SubreadCandidates]]:
        """Row-local launch orchestration: bucket subreads into vote-count
        size classes, one [B, L] launch per class slice; outlier subreads
        (> L_V2_MAX votes) and overflow rows go through v1 single-subread
        chunks. Returns None only for a whole-batch host fallback (v1
        count overflow on an outlier)."""
        import time
        index = self.index
        k = index.k
        bin_size = index.bin_size
        t0 = time.perf_counter()
        nvs = votes_per_sub.astype(np.int64)
        NSp = int(fs_dev.shape[0])
        classes = {}
        outliers = []
        for si in range(n_seqs):
            if nvs[si] > L_V2_MAX:
                outliers.append(si)
            else:
                classes.setdefault(
                    _size_class(max(int(nvs[si]), 1), 512), []).append(si)
        sens_f = float(f32(sensitivity))
        mink_f = float(f32(min_kmer_hits))
        expand = os.environ.get("NGMLR_TPU_SEARCH_EXPAND") or (
            "pallas" if jax.default_backend() == "tpu" else "xla")

        def v1_single(si):
            NSc = min(256, NSp)
            s0m = min(si, NSp - NSc)
            NV = _size_class(max(int(nvs[si]), 1 << 20), 1 << 20)
            return _search_kernel(
                self.positions, fs_dev, fc_dev, rs_dev, rcnt_dev, ln_dev,
                np.int32(s0m), np.int32(si - s0m), np.int32(1),
                k=k, bin_size=bin_size, NSc=NSc, NV=NV,
                sens=sens_f, min_kmer_hits=mink_f)

        pending = []
        for Lc in sorted(classes):
            ids = classes[Lc]
            # power-of-two row budget so padded B always lands on a size
            # class (bounded compile-shape count)
            Bmax = 8
            while Bmax * 2 * Lc <= BL_MAX:
                Bmax *= 2
            for i in range(0, len(ids), Bmax):
                grp = np.asarray(ids[i:i + Bmax], dtype=np.int32)
                # pow2 row padding with a floor: fewer distinct (B, L)
                # compile shapes across batches (the {2^n, 1.5*2^n}
                # classes would double the shape count for little waste
                # reduction — dead rows cost far less than a compile)
                Bp = min(_pow2(len(grp), min(64, Bmax)), Bmax)
                rows = np.zeros(Bp, np.int32)
                rows[:len(grp)] = grp
                out = _search_kernel_v2(
                    self.positions, fs_dev, fc_dev, rs_dev, rcnt_dev,
                    ln_dev, jnp.asarray(rows), np.int32(len(grp)),
                    k=k, bin_size=bin_size, B=Bp, L=Lc,
                    sens=sens_f, min_kmer_hits=mink_f,
                    ec=E_CAP, ne2=NE2, expand=expand)
                pending.append((grp, Lc, out))
        v1_pending = [(si, v1_single(si)) for si in outliers]
        self._stat("search_dispatch_s", time.perf_counter() - t0)

        t0 = time.perf_counter()
        fetched = jax.device_get([o for _, _, o in pending])
        v1_fetched = jax.device_get([o for _, o in v1_pending])
        self._stat("search_fetch_s", time.perf_counter() - t0)

        t0 = time.perf_counter()
        retry = []
        gsub_parts = []
        p1_parts = []
        p2_parts = []
        for (grp, Lc, _), vals in zip(pending, fetched):
            o_row, o_p1, o_p2, n_ent = [np.asarray(v) for v in vals]
            over_row = (n_ent[:len(grp)] >> 20) != 0
            n_ent = n_ent[:len(grp)] & ((1 << 20) - 1)
            ECl = min(E_CAP, Lc)
            ne2l = len(o_row)          # launch's effective fetch cap
            cum = np.cumsum(np.minimum(n_ent, ECl))
            fit = int(min(cum[-1], ne2l)) if len(cum) else 0
            bad = over_row | (n_ent > ECl) | (cum > ne2l)
            if bad.any():
                retry.extend(int(s) for s in grp[bad])
            o_row = o_row[:fit]
            keep = ~bad[o_row]
            gsub_parts.append(grp[o_row[keep]].astype(np.int64))
            p1_parts.append(o_p1[:fit][keep])
            p2_parts.append(o_p2[:fit][keep])
        if retry:
            self._stat("search_v2_retry", len(retry))
            r_pend = [(si, v1_single(si)) for si in retry]
            v1_fetched = v1_fetched + jax.device_get(
                [o for _, o in r_pend])
            v1_pending = v1_pending + r_pend
        for (si, _), vals in zip(v1_pending, v1_fetched):
            o_sub, o_p1, o_p2, n_entries, overflow = [
                np.asarray(v) for v in vals]
            if bool(overflow):
                return self._fallback("overflow")
            n_e = int(n_entries)
            gsub_parts.append(np.full(n_e, si, dtype=np.int64))
            p1_parts.append(o_p1[:n_e])
            p2_parts.append(o_p2[:n_e])

        # vectorized unpack over ALL entries at once (stable sub-major
        # order: launches emit row-major, per-row entries pre-sorted)
        gsub = np.concatenate(gsub_parts) if gsub_parts else \
            np.zeros(0, np.int64)
        p1 = np.concatenate(p1_parts) if p1_parts else np.zeros(0, np.int32)
        p2 = np.concatenate(p2_parts) if p2_parts else np.zeros(0, np.int32)
        order = np.argsort(gsub, kind="stable")
        gsub, p1, p2 = gsub[order], p1[order], p2[order]
        cmask = (1 << COUNT_BITS) - 1
        resolve_off = (1 << (bin_size - 1)) if bin_size > 0 else 0
        n_e = len(p1)
        e_loc = ((p1 >> 2).astype(np.int64) << bin_size) + resolve_off
        out_sub = np.repeat(gsub, 2)
        out_loc = np.repeat(e_loc, 2)
        out_rev = np.tile(np.array([False, True]), n_e)
        out_cnt = np.empty(2 * n_e, np.float32)
        out_cnt[0::2] = (p2 >> COUNT_BITS) & cmask
        out_cnt[1::2] = p2 & cmask
        keep2 = np.empty(2 * n_e, bool)
        keep2[0::2] = (p1 & 2) != 0
        keep2[1::2] = (p1 & 1) != 0
        out_sub = out_sub[keep2]
        out_loc = out_loc[keep2]
        out_rev = out_rev[keep2]
        out_cnt = out_cnt[keep2]

        lens64 = np.asarray(lens, dtype=np.int64)
        mq_zero = k_counts > ((lens64 - k + 1) * 0.9).astype(np.int64)
        res_bounds = np.searchsorted(out_sub, np.arange(n_seqs + 1))
        res: List[SubreadCandidates] = []
        for si in range(n_seqs):
            lo, hi = int(res_bounds[si]), int(res_bounds[si + 1])
            res.append(SubreadCandidates(out_loc[lo:hi], out_rev[lo:hi],
                                         out_cnt[lo:hi], bool(mq_zero[si])))
        self._stat("search_post_s", time.perf_counter() - t0)
        return res

    def search_batch(self, seqs: List[bytes], sensitivity: float = 0.8,
                     min_kmer_hits: int = 0
                     ) -> Optional[List[SubreadCandidates]]:
        """Bytes-based entry point (tests, ad-hoc callers): encodes the
        sequences into a temporary device code buffer, then runs the
        descriptor path (search_views)."""
        if any(len(s) > SL for s in seqs):
            return self._fallback("len")
        from ..io.reference import _CHAR2CODE
        import time
        t0 = time.perf_counter()
        total = sum(len(s) for s in seqs)
        concat = np.full(_pow2(total + 8, 4096), 4, dtype=np.uint8)
        starts = np.empty(len(seqs), dtype=np.int32)
        lens = np.empty(len(seqs), dtype=np.int32)
        pos = 0
        for si, s in enumerate(seqs):
            starts[si] = pos
            lens[si] = len(s)
            concat[pos:pos + len(s)] = _CHAR2CODE[
                np.frombuffer(s, dtype=np.uint8)]
            pos += len(s)
        codes_dev = jnp.asarray(concat)
        self._stat("search_host_s", time.perf_counter() - t0)
        return self.search_views(codes_dev, starts, lens, sensitivity,
                                 min_kmer_hits)

    def search_views(self, codes_dev, starts: np.ndarray, lens: np.ndarray,
                     sensitivity: float = 0.8, min_kmer_hits: int = 0
                     ) -> Optional[List[SubreadCandidates]]:
        """Descriptor-based entry point: subread si = codes_dev[starts[si]:
        starts[si] + lens[si]] (device code space). codes_dev is typically
        the batch read buffer already resident for scoring/alignment."""
        import time
        index = self.index
        k = index.k
        n_seqs = len(starts)
        if not self.available:
            return None
        if n_seqs == 0:
            return []
        if n_seqs >= MAX_SUBS - 1:
            # subreads are independent: big batches run as consecutive
            # slices (the per-slice cost is one tiny descriptor upload +
            # one counts fetch + the chunk kernels either way)
            res: List[SubreadCandidates] = []
            step = MAX_SUBS - 2
            for lo in range(0, n_seqs, step):
                part = self.search_views(codes_dev, starts[lo:lo + step],
                                         lens[lo:lo + step], sensitivity,
                                         min_kmer_hits)
                if part is None:
                    return None
                res.extend(part)
            return res
        if int(np.max(lens)) > SL:
            return self._fallback("len")

        t0 = time.perf_counter()
        NSp = _size_class(n_seqs, 256)
        st_pad = np.zeros(NSp, dtype=np.int32)
        ln_pad = np.zeros(NSp, dtype=np.int32)
        st_pad[:n_seqs] = starts
        ln_pad[:n_seqs] = lens
        st_dev = jnp.asarray(st_pad)
        ln_dev = jnp.asarray(ln_pad)
        self._stat("search_host_s", time.perf_counter() - t0)
        t0 = time.perf_counter()
        (votes_dev, kcnt_dev, fs_dev, fc_dev, rs_dev,
         rcnt_dev) = _count_kernel(self.bucket_pairs, codes_dev,
                                   st_dev, ln_dev, k=k)
        votes_per_sub, k_counts = jax.device_get((votes_dev, kcnt_dev))
        votes_per_sub = np.asarray(votes_per_sub)[:n_seqs]
        k_counts = np.asarray(k_counts)[:n_seqs].astype(np.int64)
        self._stat("search_count_s", time.perf_counter() - t0)
        t0 = time.perf_counter()
        if votes_per_sub.max(initial=0) > NV_MAX:
            return self._fallback("votes")

        if os.environ.get("NGMLR_TPU_SEARCH_V2", "1") != "0":
            return self._run_v2(fs_dev, fc_dev, rs_dev, rcnt_dev, ln_dev,
                                votes_per_sub, k_counts, lens, n_seqs,
                                sensitivity, min_kmer_hits)

        # split into contiguous subread chunks whose votes fit NV_MAX
        # (subreads are independent)
        cums = np.cumsum(votes_per_sub)
        chunk_bounds = [0]
        base = 0
        for si in range(n_seqs):
            if cums[si] - base > NV_MAX:
                chunk_bounds.append(si)
                base = cums[si - 1] if si > 0 else 0
                if cums[si] - base > NV_MAX:
                    return self._fallback("votes")
        chunk_bounds.append(n_seqs)

        bin_size = index.bin_size
        resolve_off = (1 << (bin_size - 1)) if bin_size > 0 else 0
        parts = []
        # dispatch every chunk's kernel before the first fetch (dispatch is
        # async; each fetch costs a ~25 ms tunnel round trip)
        pending = []
        for ci in range(len(chunk_bounds) - 1):
            s0, s1 = chunk_bounds[ci], chunk_bounds[ci + 1]
            if s1 == s0:
                continue
            NSc = min(_size_class(s1 - s0, 256), NSp)
            s0m = min(s0, NSp - NSc)   # clamp so the slice fits; delta
            # re-bases row ids inside the kernel
            n_votes = int(cums[s1 - 1] - (cums[s0 - 1] if s0 else 0))
            NV = _size_class(max(n_votes, 1 << 20), 1 << 20)
            out = _search_kernel(self.positions, fs_dev, fc_dev, rs_dev,
                                 rcnt_dev, ln_dev,
                                 np.int32(s0m), np.int32(s0 - s0m),
                                 np.int32(s1 - s0),
                                 k=k, bin_size=bin_size, NSc=NSc, NV=NV,
                                 sens=float(f32(sensitivity)),
                                 min_kmer_hits=float(f32(min_kmer_hits)))
            pending.append((s0, s1, out))
        self._stat("search_dispatch_s", time.perf_counter() - t0)
        t0 = time.perf_counter()
        fetched = jax.device_get([out for _, _, out in pending])
        self._stat("search_fetch_s", time.perf_counter() - t0)
        t0 = time.perf_counter()
        cmask = (1 << COUNT_BITS) - 1
        for (s0, s1, _), vals in zip(pending, fetched):
            (o_sub, o_p1, o_p2, n_entries, overflow) = vals
            if bool(overflow):
                return self._fallback("overflow")
            n_e = int(n_entries)

            e_sub = o_sub[:n_e].astype(np.int64) + s0
            p1 = o_p1[:n_e]
            p2 = o_p2[:n_e]
            e_loc = ((p1 >> 2).astype(np.int64) << bin_size) + resolve_off
            out_sub = np.repeat(e_sub, 2)
            out_loc = np.repeat(e_loc, 2)
            out_rev = np.tile(np.array([False, True]), n_e)
            out_cnt = np.empty(2 * n_e, np.float32)
            out_cnt[0::2] = (p2 >> COUNT_BITS) & cmask
            out_cnt[1::2] = p2 & cmask
            keep = np.empty(2 * n_e, bool)
            keep[0::2] = (p1 & 2) != 0
            keep[1::2] = (p1 & 1) != 0
            parts.append((out_sub[keep], out_loc[keep], out_rev[keep],
                          out_cnt[keep]))

        if parts:
            out_sub = np.concatenate([p[0] for p in parts])
            out_loc = np.concatenate([p[1] for p in parts])
            out_rev = np.concatenate([p[2] for p in parts])
            out_cnt = np.concatenate([p[3] for p in parts])
        else:
            out_sub = np.zeros(0, np.int64)
            out_loc = np.zeros(0, np.int64)
            out_rev = np.zeros(0, bool)
            out_cnt = np.zeros(0, np.float32)

        lens64 = np.asarray(lens, dtype=np.int64)
        mq_zero = k_counts > ((lens64 - k + 1) * 0.9).astype(np.int64)

        res_bounds = np.searchsorted(out_sub, np.arange(n_seqs + 1))
        res: List[SubreadCandidates] = []
        for si in range(n_seqs):
            lo, hi = int(res_bounds[si]), int(res_bounds[si + 1])
            res.append(SubreadCandidates(out_loc[lo:hi], out_rev[lo:hi],
                                         out_cnt[lo:hi], bool(mq_zero[si])))
        self._stat("search_post_s", time.perf_counter() - t0)
        return res
