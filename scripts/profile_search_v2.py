"""On-chip stage decomposition of the v2 row-local search kernel.

Builds one representative [B, L] launch from the bench cache (BENCH_DIR)
and times jitted PREFIXES of the v2 pipeline; consecutive differences
attribute device time to each stage (fetches are tiny dependent probes).
Stages: expand (pallas or xla), posgather, bins, sort1, scans, sort2,
crossing, sort3, entries, sort4+compact.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax
import jax.numpy as jnp
import numpy as np

from ngmlr_tpu.config import Config
from ngmlr_tpu.io.reference import ReferenceGenome, _CHAR2CODE
from ngmlr_tpu.io.reads import read_batches
from ngmlr_tpu.index.kmer_index import KmerIndex
from ngmlr_tpu.seed import device_search as dsm


def probe(x):
    if isinstance(x, (tuple, list)):
        x = x[0]
    return np.asarray(jax.device_get(
        jnp.sum(x.astype(jnp.float32).ravel()[:4])))


def main():
    probe(jnp.arange(8))
    bdir = os.environ.get("BENCH_DIR",
                          "/tmp/ngmlr_bench_g1000.0_r9000_n576_w16")
    cfg = Config()
    ref = ReferenceGenome.from_fasta(os.path.join(bdir, "ref.fa"))
    index = KmerIndex.load_or_build(
        ref, os.path.join(bdir, "ref.fa"), k=cfg.kmer_length,
        kmer_skip=cfg.kmer_skip, bin_size=cfg.bin_size,
        max_prefix_freq=cfg.max_prefix_freq)
    ds = dsm.DeviceSearch(index)
    k = index.k
    bs = index.bin_size

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
    NSp = dsm._size_class(n_seqs, 256)
    st = np.zeros(NSp, np.int32)
    ln = np.zeros(NSp, np.int32)
    st[:n_seqs] = starts
    ln[:n_seqs] = lens
    st_dev = jnp.asarray(st)
    ln_dev = jnp.asarray(ln)

    outs = dsm._count_kernel(ds.bucket_pairs, codes_dev, st_dev, ln_dev, k=k)
    votes_dev, kcnt_dev, fs_dev, fc_dev, rs_dev, rcnt_dev = outs
    votes = np.asarray(jax.device_get(votes_dev))[:n_seqs]
    print("subreads=%d votes_total=%d max=%d mean=%d"
          % (n_seqs, votes.sum(), votes.max(), votes.mean()))

    # the modal class: most-voted L class by membership
    Ls = {}
    for si in range(n_seqs):
        if votes[si] <= dsm.L_V2_MAX:
            Ls.setdefault(dsm._size_class(max(int(votes[si]), 1), 512),
                          []).append(si)
    Lc = max(Ls, key=lambda L: L * len(Ls[L]))
    ids = Ls[Lc]
    Bmax = 8
    while Bmax * 2 * Lc <= dsm.BL_MAX:
        Bmax *= 2
    grp = np.asarray(ids[:Bmax], dtype=np.int32)
    B = min(dsm._pow2(len(grp), min(64, Bmax)), Bmax)
    rows_np = np.zeros(B, np.int32)
    rows_np[:len(grp)] = grp
    rows = jnp.asarray(rows_np)
    n_real = np.int32(len(grp))
    L = Lc
    print("launch: B=%d L=%d (class members %d, votes %d)"
          % (B, L, len(grp), votes[grp].sum()))

    SL = dsm.SL
    sens = float(np.float32(cfg.sensitivity))
    mink = float(np.float32(cfg.min_kmer_hits))
    positions = ds.positions
    f32j = jnp.float32

    def build(stage, expand):
        def fn(positions, fs_all, fc_all, rs_all, rcnt_all, ln_all, rows):
            SL2 = 2 * SL
            lnr = ln_all[rows]
            fs2 = fs_all[rows]
            fc2 = fc_all[rows]
            rs2 = rs_all[rows]
            rcnt2 = rcnt_all[rows]
            rowi = jnp.arange(B, dtype=jnp.int32)
            live = rowi < n_real
            fc2 = jnp.where(live[:, None], fc2, 0)
            rcnt2 = jnp.where(live[:, None], rcnt2, 0)
            base2 = jnp.stack([fs2, rs2], axis=-1).reshape(B, SL2)
            c2 = jnp.stack([fc2, rcnt2], axis=-1).reshape(B, SL2)
            posk = jnp.broadcast_to(
                jnp.arange(SL, dtype=jnp.int32)[None, :], (B, SL))
            ct2 = jnp.stack([posk, lnr[:, None] - (posk + k)],
                            axis=-1).reshape(B, SL2)
            cum2 = jnp.cumsum(c2, axis=1)
            nv = cum2[:, -1]
            c2p = jnp.concatenate([c2, (L - nv)[:, None]], axis=1)
            d2tp = jnp.concatenate(
                [base2 - (cum2 - c2), jnp.zeros((B, 1), jnp.int32)], axis=1)
            ct2p = jnp.concatenate([ct2, jnp.zeros((B, 1), jnp.int32)],
                                   axis=1)
            cols = jnp.broadcast_to(
                jnp.arange(L, dtype=jnp.int32)[None, :], (B, L))
            if expand == "pallas":
                from ngmlr_tpu.ops.pallas_kernels import expand_votes
                SLP = ((SL2 + 1 + 127) // 128) * 128
                Bp = ((B + 127) // 128) * 128

                def tab(x, pad_val):
                    x = jnp.pad(x, ((0, Bp - B), (0, SLP - x.shape[1])),
                                constant_values=pad_val)
                    return x.T
                bnd = tab(cum2, np.int32(2 ** 30))
                dd = tab(d2tp[:, 1:] - d2tp[:, :-1], 0)
                dc = tab(ct2p[:, 1:] - ct2p[:, :-1], 0)
                v0 = jnp.zeros((8, Bp), jnp.int32)
                v0 = v0.at[0, :B].set(d2tp[:, 0]).at[1, :B].set(ct2p[:, 0])
                slot_T, d2t_T, ct_T = expand_votes(bnd, dd, dc, v0, L)
                slot = slot_T.T[:B]
                d2t_l = d2t_T.T[:B]
                corr = ct_T.T[:B]
            else:
                NKP = B * (SL2 + 1)
                kmer_f = jnp.repeat(jnp.arange(NKP, dtype=jnp.int32),
                                    c2p.reshape(-1),
                                    total_repeat_length=B * L)
                dt_ct = jnp.stack([d2tp.reshape(-1), ct2p.reshape(-1)],
                                  axis=-1)
                gv = dt_ct[kmer_f].reshape(B, L, 2)
                slot = kmer_f.reshape(B, L) % (SL2 + 1)
                d2t_l = gv[:, :, 0]
                corr = gv[:, :, 1]
            if stage == "expand":
                return slot + d2t_l + corr
            pos_idx = jnp.clip(d2t_l + cols, 0, positions.shape[0] - 1)
            loc = positions[pos_idx.reshape(-1)].reshape(B, L)
            if stage == "posgather":
                return loc
            strand = slot & 1
            valid = slot < SL2
            v_bin = jnp.where(
                valid,
                ((loc - corr.astype(jnp.uint32)) >> bs).astype(jnp.int32),
                dsm.BIN_SENTINEL)
            pay = (cols << 1) | strand
            s_bin, s_pay = jax.lax.sort((v_bin, pay), dimension=1,
                                        num_keys=1)
            if stage == "sort1":
                return s_bin + s_pay
            st_ = s_pay & 1
            l_s = s_pay >> 1
            valid_s = s_bin < dsm.BIN_SENTINEL
            new_seg = jnp.concatenate(
                [jnp.ones((B, 1), bool), s_bin[:, 1:] != s_bin[:, :-1]],
                axis=1)
            seg_rank = jnp.cumsum(new_seg.astype(jnp.int32), axis=1) - 1
            CM = jnp.int32(0xFFFF)
            csum_r = jnp.cumsum(st_, axis=1)
            csum_f = (cols + 1) - csum_r
            r_excl = csum_r - st_
            f_excl = csum_f - (1 - st_)

            def seg_bcast(x):
                p = jnp.where(new_seg, (cols << 16) | x, -1)
                return jax.lax.cummax(p, axis=1) & CM
            rb = seg_bcast(r_excl)
            fb = seg_bcast(f_excl)
            count_after = jnp.where(st_ == 1, csum_r - rb, csum_f - fb)
            ca = jnp.where(valid_s, count_after, 0)
            if stage == "scans":
                return ca + seg_rank
            _, ca_em, spos_em = jax.lax.sort((s_pay, ca, cols),
                                             dimension=1, num_keys=1)
            if stage == "sort2":
                return ca_em + spos_em
            run_max = jax.lax.cummax(ca_em, axis=1)
            crossing_em = (ca_em.astype(f32j)
                           >= run_max.astype(f32j) * f32j(sens)) \
                & (ca_em > 0)
            row_max = run_max[:, -1]
            th = jnp.maximum(f32j(mink),
                             row_max.astype(f32j) * f32j(sens))[:, None]
            _, cross_s = jax.lax.sort(
                (spos_em, crossing_em.astype(jnp.int32)), dimension=1,
                num_keys=1)
            if stage == "sort3":
                return cross_s
            BIGV = jnp.int32(0xFFFF)
            cl = jnp.where((cross_s == 1) & valid_s, l_s, BIGV)
            pm = jax.lax.cummax((seg_rank << 16) | (BIGV - cl), axis=1)
            fc_val = BIGV - (pm & CM)
            is_last = jnp.concatenate(
                [new_seg[:, 1:], jnp.ones((B, 1), bool)], axis=1)
            nr_seg = csum_r - rb
            nf_seg = csum_f - fb
            keep_f = nf_seg.astype(f32j) >= th
            keep_r = nr_seg.astype(f32j) >= th
            entry_ok = (is_last & valid_s & (fc_val < BIGV)
                        & (keep_f | keep_r))
            p1 = (s_bin << 2) | (keep_f.astype(jnp.int32) << 1) \
                | keep_r.astype(jnp.int32)
            p2 = (jnp.minimum(nf_seg, CM) << 16) | jnp.minimum(nr_seg, CM)
            if stage == "entries":
                return p1 + p2 + entry_ok
            key4 = jnp.where(entry_ok, fc_val, jnp.int32(2 ** 30))
            k4, o1, o2 = jax.lax.sort((key4, p1, p2), dimension=1,
                                      num_keys=1)
            EC = min(dsm.E_CAP, L)
            k4 = k4[:, :EC]
            flat_ok = (k4 < 2 ** 30).reshape(-1)
            flat_iota = jnp.arange(B * EC, dtype=jnp.int32)
            rowid = jnp.broadcast_to(rowi[:, None], (B, EC)).reshape(-1)
            ck, o_row, o_p1, o_p2 = jax.lax.sort(
                (jnp.where(flat_ok, flat_iota, jnp.int32(2 ** 30)), rowid,
                 o1[:, :EC].reshape(-1), o2[:, :EC].reshape(-1)),
                num_keys=1)
            return o_row + o_p1
        return jax.jit(fn)

    expand = os.environ.get("NGMLR_TPU_SEARCH_EXPAND") or (
        "pallas" if jax.default_backend() == "tpu" else "xla")
    args = (positions, fs_dev, fc_dev, rs_dev, rcnt_dev, ln_dev, rows)
    stages = ["expand", "posgather", "sort1", "scans", "sort2", "sort3",
              "entries", "full"]
    prev = 0.0
    for stage in stages:
        fn = build(stage, expand)
        probe(fn(*args))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            probe(fn(*args))
            best = min(best, time.perf_counter() - t0)
        print("  upto %-10s %7.1f ms  (+%.1f)"
              % (stage, best * 1e3, (best - prev) * 1e3))
        prev = best


if __name__ == "__main__":
    main()
