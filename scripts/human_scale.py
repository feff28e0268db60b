"""Human-scale (>= 1 Gbp) capacity proof: build the index against a
synthetic multi-chromosome genome and record wall time + memory.

The reference's capacity story is SequenceProvider.cpp:299-319 (4 GB x
2^binSize) and PrefixTable's 4-GB TableUnit split (PrefixTable.h:58-75);
ngmlr_tpu replaces both with flat uint32-position arrays (DIVERGENCES #5),
which this script exercises at scale.

Usage:  python scripts/human_scale.py [GBP] [--map N_READS]

Writes a JSON line to stdout and a human-readable section suitable for
docs/HUMAN_SCALE.md to stderr. With --map (requires a live TPU) also maps
PacBio-like reads end-to-end and reports reads/s.
"""

import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def peak_rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def make_genome_fa(path: str, gbp: float, seed: int = 7):
    """Chromosomes of ~125 Mbp with N-run telomere/centromere gaps, human
    GC-ish base composition, and tandem-repeat patches (so the index sees
    realistic same-bin dedup and frequency-cutoff pressure)."""
    rng = np.random.default_rng(seed)
    total = int(gbp * 1e9)
    chrom_len = 125_000_000
    n_chrom = max(1, (total + chrom_len - 1) // chrom_len)
    t0 = time.time()
    with open(path, "wb") as f:
        remaining = total
        for ci in range(n_chrom):
            clen = min(chrom_len, remaining)
            remaining -= clen
            if clen <= 0:
                break
            f.write(b">chr%d\n" % (ci + 1))
            # build in 16 Mbp blocks to bound temporaries on the 1-core host
            written = 0
            while written < clen:
                blk = min(1 << 24, clen - written)
                seq = BASES[rng.integers(0, 4, size=blk)]
                # N gaps: one ~100 kb run per ~8 Mbp
                for _ in range(max(1, blk >> 23)):
                    s = int(rng.integers(0, max(1, blk - 100_000)))
                    seq[s:s + int(rng.integers(20_000, 100_000))] = ord("N")
                # tandem repeat patch: ~50 kb of a 171-bp alpha-satellite-like
                # monomer per block (stresses bin dedup + freq cutoff),
                # clamped for blocks shorter than the patch
                mono = BASES[rng.integers(0, 4, size=171)]
                patch = min(50_000, blk)
                s = int(rng.integers(0, max(1, blk - patch)))
                reps = patch // 171
                seq[s:s + reps * 171] = np.tile(mono, reps)
                buf = seq.tobytes()
                # 80-col FASTA
                out = b"\n".join(buf[i:i + 80] for i in range(0, len(buf), 80))
                f.write(out + b"\n")
                written += blk
    return time.time() - t0


def main():
    gbp = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    n_map = 0
    if "--map" in sys.argv:
        n_map = int(sys.argv[sys.argv.index("--map") + 1])

    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    workdir = os.environ.get("HUMAN_SCALE_DIR", "/tmp/ngmlr_human_scale")
    os.makedirs(workdir, exist_ok=True)
    fa = os.path.join(workdir, "genome_%.1fgbp.fa" % gbp)

    if not os.path.exists(fa):
        sys.stderr.write("generating %.1f Gbp genome...\n" % gbp)
        gen_s = make_genome_fa(fa, gbp)
        sys.stderr.write("  wrote %s in %.0f s\n" % (fa, gen_s))
    else:
        gen_s = 0.0

    from ngmlr_tpu.io.reference import ReferenceGenome
    from ngmlr_tpu.index.kmer_index import KmerIndex

    t0 = time.time()
    ref = ReferenceGenome.from_fasta(fa, use_cache=True)
    enc_s = time.time() - t0
    sys.stderr.write("encode: %.1f s (len=%d, peak RSS %.1f GB)\n"
                     % (enc_s, len(ref.codes), peak_rss_gb()))

    t0 = time.time()
    # cache the index next to the FASTA so a later --map run (on the
    # chip) skips the rebuild; build_s is only meaningful on a cold cache
    idx = KmerIndex.load_or_build(ref, fa, use_cache=True)
    build_s = time.time() - t0
    n_pos = len(idx.positions)
    idx_gb = (idx.bucket_start.nbytes + idx.positions.nbytes) / 1e9
    sys.stderr.write(
        "index build: %.1f s, %d positions, %.2f GB tables, peak RSS %.1f GB\n"
        % (build_s, n_pos, idx_gb, peak_rss_gb()))

    result = {
        "metric": "human_scale_index",
        "genome_gbp": gbp,
        "encode_s": round(enc_s, 1),
        "index_build_s": round(build_s, 1),
        "index_positions": int(n_pos),
        "index_gb": round(idx_gb, 2),
        "peak_rss_gb": round(peak_rss_gb(), 1),
    }

    if n_map:
        import io as _io
        from ngmlr_tpu.config import Config
        from ngmlr_tpu.pipeline.runner import Pipeline
        rng = np.random.default_rng(99)
        reads = os.path.join(workdir, "reads.fa")
        glen = len(ref.codes)
        # sample read windows from the encoded genome via decode
        with open(reads, "wb") as f:
            for i in range(n_map):
                L = int(rng.integers(5000, 14000))
                # retry until the window decodes to mostly ACGT
                for _ in range(10):
                    pos = int(rng.integers(1000, glen - L - 1000))
                    frag = ref.decode_window(pos, L)
                    if frag.count(b"N") < L // 4:
                        break
                r = np.frombuffer(frag, dtype=np.uint8).copy()
                # PacBio-CLR-like ~15% error (10% ins / 4% del / 1% sub) —
                # the reference's headline workload class (same profile as
                # bench.py mutate_pacbio)
                e = rng.random(len(r))
                ins = e < 0.10
                dele = (e >= 0.10) & (e < 0.14)
                sub = (e >= 0.14) & (e < 0.15)
                rand_ins = BASES[rng.integers(0, 4, len(r))]
                rand_sub = BASES[rng.integers(0, 4, len(r))]
                counts = np.where(dele, 0, 1 + ins.astype(np.int64))
                ends = np.cumsum(counts)
                out = np.empty(int(ends[-1]) if len(r) else 0, dtype=np.uint8)
                keep = ~dele
                out[ends[keep] - 1] = np.where(sub, rand_sub, r)[keep]
                ins_k = ins & keep
                out[ends[ins_k] - 2] = rand_ins[ins_k]
                f.write(b">r%d_%d\n" % (i, pos))
                f.write(out.tobytes() + b"\n")
        cfg = Config()
        pipe = Pipeline(cfg, fa, use_cache=True)
        # pass 1 pays the one-time costs (genome + index device upload over
        # the ~50 MB/s tunnel is minutes at 3 Gbp; fresh-shape kernel
        # compiles likewise); pass 2 is the steady-state number
        t0 = time.time()
        stats = pipe.run(reads, _io.BytesIO())
        warm_s = time.time() - t0
        t0 = time.time()
        stats = pipe.run(reads, _io.BytesIO())
        map_s = time.time() - t0
        result["map_reads"] = n_map
        result["map_warm_s"] = round(warm_s, 1)
        result["map_s"] = round(map_s, 1)
        result["reads_per_s"] = round(n_map / map_s, 2)
        result["mapped"] = stats["mapped"]

    print(json.dumps(result))


if __name__ == "__main__":
    main()
