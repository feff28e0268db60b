"""Chip A/B: v1 global-chunk search kernel vs v2 row-local kernel on the
bench workload (BENCH_DIR, default the 300 Mbp cache). Also cross-checks
result equality between the two paths on the first batch.

Usage: python scripts/compare_search_v2.py [n_reads]
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


def main():
    jax.device_get(jnp.arange(8).sum())     # tunnel wedge guard
    bdir = os.environ.get("BENCH_DIR", "/tmp/ngmlr_bench_g300.0_r9000_n576_w16")
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    from ngmlr_tpu.config import Config
    from ngmlr_tpu.io.reference import ReferenceGenome
    from ngmlr_tpu.io.reads import read_batches
    from ngmlr_tpu.index.kmer_index import KmerIndex
    from ngmlr_tpu.seed.device_search import DeviceSearch
    from ngmlr_tpu.ops import device_engine

    cfg = Config()
    t0 = time.perf_counter()
    ref = ReferenceGenome.from_fasta(os.path.join(bdir, "ref.fa"))
    index = KmerIndex.load_or_build(ref, os.path.join(bdir, "ref.fa"),
                                    k=cfg.kmer_length,
                                    kmer_skip=cfg.kmer_skip,
                                    bin_size=cfg.bin_size,
                                    max_prefix_freq=cfg.max_prefix_freq)
    print("ref+index load: %.1f s" % (time.perf_counter() - t0))
    ctx = device_engine.DeviceContext(ref.codes)
    device_engine.set_current(ctx)
    ds = DeviceSearch(index)

    batch = next(read_batches(os.path.join(bdir, "reads.fa"), n_reads))
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
    print("subreads: %d" % len(seqs))

    results = {}
    modes = ("0", "1")
    envvar = "NGMLR_TPU_SEARCH_V2"
    if os.environ.get("COMPARE_EXPAND"):
        # A/B the v2 expansion implementations instead of v1-vs-v2
        os.environ["NGMLR_TPU_SEARCH_V2"] = "1"
        envvar = "NGMLR_TPU_SEARCH_EXPAND"
        modes = ("xla", "pallas")
    for ver in modes:
        os.environ[envvar] = ver
        best = None
        for it in range(3):
            for k in list(ctx.stats):
                if k.startswith("search_"):
                    ctx.stats[k] = 0.0
            t0 = time.perf_counter()
            out = ds.search_batch(seqs, cfg.sensitivity, cfg.min_kmer_hits)
            el = time.perf_counter() - t0
            split = {k: round(v, 3) for k, v in sorted(ctx.stats.items())
                     if k.startswith("search_")}
            label = ver if envvar.endswith("EXPAND") else \
                ("v2" if ver == "1" else "v1")
            print("%s search_batch[%d]: %.2f s  (%s)  none=%s"
                  % (label, it, el, split, out is None))
            if best is None or el < best:
                best = el
        results[ver] = (best, out)
    r1, r2 = results[modes[0]][1], results[modes[1]][1]
    if r1 is not None and r2 is not None:
        mism = 0
        for i, (a, b) in enumerate(zip(r1, r2)):
            if (not np.array_equal(a.locations, b.locations)
                    or not np.array_equal(a.reverse, b.reverse)
                    or not np.array_equal(a.counts, b.counts)
                    or a.mq_zero != b.mq_zero):
                mism += 1
                if mism < 4:
                    print("MISMATCH sub %d" % i)
        print("cross-check: %d/%d subreads mismatch" % (mism, len(r1)))
    print("best: %s %.2f s, %s %.2f s  (%.2fx)"
          % (modes[0], results[modes[0]][0], modes[1], results[modes[1]][0],
             results[modes[0]][0] / max(results[modes[1]][0], 1e-9)))


if __name__ == "__main__":
    main()
