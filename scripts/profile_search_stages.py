"""On-chip stage decomposition of the device-search chunk kernel.

Builds one bench-like chunk (real 300 Mbp index + reads from the bench
cache) and times jitted PREFIXES of the chunk pipeline; consecutive
differences attribute device time to each stage. Fetches are tiny
probes (dependent values), so the numbers are device wall, not D2H.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax
import jax.numpy as jnp

from ngmlr_tpu.config import Config
from ngmlr_tpu.io.reference import ReferenceGenome, _CHAR2CODE
from ngmlr_tpu.io.reads import read_batches
from ngmlr_tpu.index.kmer_index import KmerIndex
from ngmlr_tpu.seed import device_search as dsm


def probe(x):
    if isinstance(x, (tuple, list)):
        x = x[0]
    return np.asarray(jax.device_get(jnp.sum(x.astype(jnp.float32).ravel()[:4])))


def main():
    bdir = os.environ.get("BENCH_DIR", "/tmp/ngmlr_bench_g300.0_r9000_n576_w16")
    cfg = Config()
    ref = ReferenceGenome.from_fasta(os.path.join(bdir, "ref.fa"))
    index = KmerIndex.load_or_build(ref, os.path.join(bdir, "ref.fa"),
                                    k=cfg.kmer_length, kmer_skip=cfg.kmer_skip,
                                    bin_size=cfg.bin_size,
                                    max_prefix_freq=cfg.max_prefix_freq)
    ds = dsm.DeviceSearch(index)
    k = index.k

    batch = next(read_batches(os.path.join(bdir, "reads.fa"), 192))
    rpl = cfg.read_part_length
    seqs = []
    for read in batch:
        if read.empty:
            continue
        n = read.subread_count(rpl)
        if n == 0:
            seqs.append(read.seq)
        else:
            seqs.extend(read.subread_seq(j, rpl) for j in range(n))
    total = sum(len(s) for s in seqs)
    concat = np.full(dsm._pow2(total + 8, 4096), 4, dtype=np.uint8)
    starts = np.empty(len(seqs), dtype=np.int32)
    lens = np.empty(len(seqs), dtype=np.int32)
    pos = 0
    for si, s in enumerate(seqs):
        starts[si] = pos
        lens[si] = len(s)
        concat[pos:pos + len(s)] = _CHAR2CODE[np.frombuffer(s, np.uint8)]
        pos += len(s)
    codes_dev = jnp.asarray(concat)
    n_seqs = len(seqs)
    NSp = dsm._pow2(n_seqs, 256)
    st = np.zeros(NSp, np.int32)
    ln = np.zeros(NSp, np.int32)
    st[:n_seqs] = starts
    ln[:n_seqs] = lens
    st_dev = jnp.asarray(st)
    ln_dev = jnp.asarray(ln)

    outs = dsm._count_kernel(ds.bucket_pairs, codes_dev, st_dev, ln_dev, k=k)
    votes_dev, kcnt_dev, fs_dev, fc_dev, rs_dev, rcnt_dev = outs
    votes = np.asarray(jax.device_get(votes_dev))[:n_seqs]
    print("subreads=%d votes_total=%d max_per_sub=%d"
          % (n_seqs, votes.sum(), votes.max()))

    # one chunk = the largest prefix fitting NV_MAX
    cums = np.cumsum(votes)
    s1 = int(np.searchsorted(cums, dsm.NV_MAX))
    NSc = dsm._pow2(s1, 256)
    NV = dsm._pow2(max(int(cums[s1 - 1]), 1 << 20), 1 << 20)
    print("chunk: subs=%d NSc=%d NV=%d (2^%d)" % (s1, NSc, NV,
                                                  int(np.log2(NV))))
    SL = dsm.SL
    MAX_SUBS = dsm.MAX_SUBS
    BIN_SENTINEL = dsm.BIN_SENTINEL
    sens = float(np.float32(cfg.sensitivity))
    positions = ds.positions
    bs = index.bin_size

    def build(stage):
        def fn(positions, fs_all, fc_all, rs_all, rcnt_all, lens):
            ln = jax.lax.dynamic_slice(lens, (0,), (NSc,))
            fs2 = jax.lax.dynamic_slice(fs_all, (0, 0), (NSc, SL))
            fc2 = jax.lax.dynamic_slice(fc_all, (0, 0), (NSc, SL))
            rs2 = jax.lax.dynamic_slice(rs_all, (0, 0), (NSc, SL))
            rcnt2 = jax.lax.dynamic_slice(rcnt_all, (0, 0), (NSc, SL))
            row = jnp.arange(NSc, dtype=jnp.int32)
            in_chunk = row < s1
            fc2 = jnp.where(in_chunk[:, None], fc2, 0)
            rcnt2 = jnp.where(in_chunk[:, None], rcnt2, 0)
            NK = NSc * SL
            fs = fs2.reshape(NK)
            fc = fc2.reshape(NK)
            rs = rs2.reshape(NK)
            rcnt = rcnt2.reshape(NK)
            c = fc + rcnt
            cum = jnp.cumsum(c)
            total_votes = cum[NK - 1]
            kmer_of = jnp.repeat(jnp.arange(NK, dtype=jnp.int32), c,
                                 total_repeat_length=NV)
            if stage == "repeat":
                return kmer_of
            kstart = cum - c
            j = jnp.arange(NV, dtype=jnp.int32)
            v_valid = j < total_votes
            within = j - kstart[kmer_of]
            sub = kmer_of // SL
            posk_v = kmer_of - sub * SL
            fc_v = fc[kmer_of]
            is_rev = within >= fc_v
            boff = jnp.where(is_rev, within - fc_v, within)
            pos_idx = jnp.clip(
                jnp.where(is_rev, rs[kmer_of], fs[kmer_of]) + boff,
                0, positions.shape[0] - 1)
            loc = positions[pos_idx]
            corr = jnp.where(is_rev,
                             ln[jnp.clip(sub, 0, NSc - 1)] - (posk_v + k),
                             posk_v)
            v_bin = ((loc - corr.astype(jnp.uint32)) >> bs).astype(jnp.int32)
            v_sub = jnp.where(v_valid, sub, jnp.int32(MAX_SUBS - 1))
            v_str = is_rev.astype(jnp.int32)
            v_bin = jnp.where(v_valid, v_bin, BIN_SENTINEL)
            if stage == "expand":
                return v_bin + v_sub + v_str
            g2 = v_bin * 2 + v_str
            arange_v = jnp.arange(NV, dtype=jnp.int32)
            s_sub, s_g2, s_idx = jax.lax.sort((v_sub, g2, arange_v),
                                              num_keys=3)
            if stage == "sort1":
                return s_idx
            new_grp = jnp.concatenate([
                jnp.ones(1, bool),
                (s_sub[1:] != s_sub[:-1]) | (s_g2[1:] != s_g2[:-1])])
            grp_start = jax.lax.cummax(jnp.where(new_grp, arange_v, -1))
            rank_sorted = arange_v - grp_start
            _, count_after_m1 = jax.lax.sort((s_idx, rank_sorted), num_keys=1)
            count_after = count_after_m1 + 1
            if stage == "sort2":
                return count_after
            ckey = (v_sub << 16) | jnp.minimum(count_after, (1 << 16) - 1)
            run_max = jax.lax.cummax(ckey) & ((1 << 16) - 1)
            thresh = run_max.astype(jnp.float32) * jnp.float32(sens)
            crossing = v_valid & (count_after.astype(jnp.float32) >= thresh)
            sub_last = jnp.zeros(MAX_SUBS, jnp.int32).at[v_sub].max(
                jnp.where(v_valid, run_max, 0), mode="drop")
            cross_s = jnp.take(crossing, s_idx)
            cand = jnp.where(cross_s, s_idx, jnp.int32(NV))
            seg_min = jnp.full(NV, jnp.int32(NV)).at[grp_start].min(
                cand, mode="drop")
            first_cross_sorted = seg_min[grp_start]
            if stage == "crossing":
                return first_cross_sorted + sub_last[0]
            is_last = jnp.concatenate([new_grp[1:], jnp.ones(1, bool)])
            brow_key = jnp.where(is_last, arange_v, jnp.int32(NV))
            bk, b_sub, b_bin, b_str, b_size, b_first = jax.lax.sort(
                (brow_key, s_sub, s_g2 >> 1, s_g2 & 1, rank_sorted + 1,
                 first_cross_sorted), num_keys=1)
            if stage == "sort3":
                return bk
            final_thresh = jnp.maximum(
                jnp.float32(0.0),
                sub_last.astype(jnp.float32) * jnp.float32(sens))
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
            e_rev = jnp.where(b_str == 0,
                              jnp.where(has_next, nxt_size, 0), b_size)
            e_first = jnp.minimum(b_first,
                                  jnp.where(has_next, nxt_first, NV))
            th = final_thresh[jnp.clip(b_sub, 0, MAX_SUBS - 1)]
            keep_f = e_fwd.astype(jnp.float32) >= th
            keep_r = e_rev.astype(jnp.float32) >= th
            entry_ok = is_entry & (e_first < NV) & (keep_f | keep_r)
            o = jax.lax.sort(
                (jnp.where(entry_ok, b_sub, jnp.int32(MAX_SUBS)),
                 jnp.where(entry_ok, e_first, NV),
                 b_bin, e_fwd, e_rev,
                 keep_f.astype(jnp.int32), keep_r.astype(jnp.int32)),
                num_keys=2)
            return o[0][:dsm.NE_CAP]
        return jax.jit(fn)

    stages = ["repeat", "expand", "sort1", "sort2", "crossing", "sort3",
              "full"]
    prev = 0.0
    args = (positions, fs_dev, fc_dev, rs_dev, rcnt_dev, ln_dev)
    for stage in stages:
        fn = build(stage)
        probe(fn(*args))           # compile
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            probe(fn(*args))
            best = min(best, time.perf_counter() - t0)
        print("  upto %-10s %7.1f ms  (+%.1f)" % (stage, best * 1e3,
                                                  (best - prev) * 1e3))
        prev = best


if __name__ == "__main__":
    main()
