"""Candidate search: diagonal-bin voting over k-mer index hits.

Rebuild of the CS stage (/root/reference/src/CS.cpp) without the
open-addressed hash table: the reference's rTable + overflow/fallback
machinery (CS.cpp:98-149, 357-393) exists to bound memory of a per-read
scatter; a vectorized sort/segment-reduce over all (bin, strand) votes of a
whole subread batch computes the same counts with no overflow path at all.

Semantics preserved:

  * one vote per (k-mer occurrence in index) per read k-mer; read-side k-mer
    stream has stride 1 and N-run splitting (CS.cpp:36, CSstatic.cpp:23-73),
  * fwd vote bin   = (loc - pos) >> bin_size,
    rev vote bin   = (loc - (read_len - (pos + k))) >> bin_size
    (PrefixSearch, CS.cpp:57-96),
  * candidate location = ResolveBin(bin) = (bin << bin_size) + 2^(bin_size-1)
    (CS.h:175-186),
  * keep (bin, strand) with count >= max(min_kmer_hits, 0.8 * max_count)
    (AddLocationStd + CollectResultsStd, CS.cpp:136-148, 217-269),
  * a subread whose zero-hit k-mer count exceeds 90% of its k-mer positions
    gets mapping quality 0 (CS.cpp:221-225).
"""

from dataclasses import dataclass
from typing import List

import numpy as np

from ..index.kmer_index import KmerIndex, kmer_stream, revcomp_prefix


@dataclass
class SubreadCandidates:
    """Candidates for one subread, in vote-table emergence order."""
    locations: np.ndarray   # int64 — ResolveBin'ed concat positions
    reverse: np.ndarray     # bool
    counts: np.ndarray      # float32 k-mer vote counts
    mq_zero: bool           # >90% of k-mers had zero index hits


def search_batch(index: KmerIndex, seqs: List[bytes], sensitivity: float = 0.8,
                 min_kmer_hits: int = 0) -> List[SubreadCandidates]:
    """Vectorized candidate search over a batch of subread sequences."""
    k = index.k
    bin_size = index.bin_size

    # --- per-subread k-mer streams, concatenated --------------------------
    sub_idx_parts, prefix_parts, pos_parts = [], [], []
    n_kmer_positions = np.zeros(len(seqs), dtype=np.int64)
    for si, seq in enumerate(seqs):
        chars = np.frombuffer(seq, dtype=np.uint8)
        prefixes, starts = kmer_stream(chars, k, stride=1)
        n_kmer_positions[si] = len(starts)
        if len(starts):
            sub_idx_parts.append(np.full(len(starts), si, dtype=np.int64))
            prefix_parts.append(prefixes)
            pos_parts.append(starts)

    empty = SubreadCandidates(np.zeros(0, np.int64), np.zeros(0, bool),
                              np.zeros(0, np.float32), False)
    if not prefix_parts:
        return [empty] * len(seqs)

    sub_idx = np.concatenate(sub_idx_parts)
    prefixes = np.concatenate(prefix_parts)
    positions = np.concatenate(pos_parts)
    read_lens = np.asarray([len(s) for s in seqs], dtype=np.int64)

    rc = revcomp_prefix(prefixes, k)
    fwd_cnt = index.counts_for(prefixes)
    rev_cnt = index.counts_for(rc)

    # kCount: emitted k-mers with zero total hits (CS.cpp:67-69)
    zero_hits = (fwd_cnt + rev_cnt) == 0
    k_count = np.bincount(sub_idx[zero_hits], minlength=len(seqs))
    mq_zero = k_count > ((read_lens - k + 1) * 0.9).astype(np.int64)

    # --- expand hits -------------------------------------------------------
    def expand(cnt: np.ndarray, pref: np.ndarray, corr: np.ndarray):
        total = int(cnt.sum())
        if total == 0:
            return (np.zeros(0, np.int64),) * 3
        rep_sub = np.repeat(sub_idx, cnt)
        rep_corr = np.repeat(corr, cnt)
        # gather location lists: base + within-bucket offset
        starts = index.bucket_start[pref]
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt)
        locs = index.positions[np.repeat(starts, cnt) + offs]
        bins = (locs - rep_corr) >> bin_size
        return rep_sub, bins, rep_corr

    fwd_sub, fwd_bins, _ = expand(fwd_cnt, prefixes, positions)
    rev_corr = read_lens[sub_idx] - (positions + k)
    rev_sub, rev_bins, _ = expand(rev_cnt, rc, rev_corr)

    # order index to recover "first emergence" ordering of vote-table entries
    fwd_order = np.arange(len(fwd_sub), dtype=np.int64)
    rev_order = np.arange(len(rev_sub), dtype=np.int64) + len(fwd_sub)

    sub_all = np.concatenate([fwd_sub, rev_sub])
    bins_all = np.concatenate([fwd_bins, rev_bins])
    strand = np.concatenate([np.zeros(len(fwd_sub), np.int8), np.ones(len(rev_sub), np.int8)])
    order_all = np.concatenate([fwd_order, rev_order])

    # --- segment reduce per (subread, bin, strand) --------------------------
    sort_idx = np.lexsort((order_all, strand, bins_all, sub_all))
    s_sub = sub_all[sort_idx]
    s_bin = bins_all[sort_idx]
    s_str = strand[sort_idx]
    s_ord = order_all[sort_idx]

    new_grp = np.ones(len(s_sub), dtype=bool)
    new_grp[1:] = ((s_sub[1:] != s_sub[:-1]) | (s_bin[1:] != s_bin[:-1])
                   | (s_str[1:] != s_str[:-1]))
    grp_starts = np.nonzero(new_grp)[0]
    grp_counts = np.diff(np.append(grp_starts, len(s_sub)))

    g_sub = s_sub[grp_starts]
    g_bin = s_bin[grp_starts]
    g_str = s_str[grp_starts]
    g_first = s_ord[grp_starts]      # first-vote order within (bin,strand)
    g_cnt = grp_counts.astype(np.float32)

    resolve_off = (1 << (bin_size - 1)) if bin_size > 0 else 0
    g_loc = (g_bin << bin_size) + resolve_off

    # --- threshold per subread ----------------------------------------------
    out: List[SubreadCandidates] = []
    # group rows are sorted by subread already
    row_split = np.searchsorted(g_sub, np.arange(len(seqs) + 1))
    for si in range(len(seqs)):
        lo, hi = row_split[si], row_split[si + 1]
        if lo == hi:
            out.append(SubreadCandidates(np.zeros(0, np.int64), np.zeros(0, bool),
                                         np.zeros(0, np.float32), bool(mq_zero[si])))
            continue
        cnt = g_cnt[lo:hi]
        thresh = max(float(min_kmer_hits), float(cnt.max()) * sensitivity)
        keep = cnt >= thresh
        # emergence order: first-vote order of the (bin,strand) entry
        order = np.argsort(g_first[lo:hi][keep], kind="stable")
        out.append(SubreadCandidates(
            g_loc[lo:hi][keep][order],
            g_str[lo:hi][keep][order].astype(bool),
            cnt[keep][order],
            bool(mq_zero[si]),
        ))
    return out
