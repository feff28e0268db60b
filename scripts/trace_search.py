"""Capture a device trace of one search chunk kernel + count kernel and
print the top XLA ops by self time (reads the perfetto trace proto the
jax profiler writes). Run on the chip."""

import glob
import gzip
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


def main():
    bdir = os.environ.get("BENCH_DIR", "/tmp/ngmlr_bench_g300.0_r9000_n576_w16")
    cfg = Config()
    ref = ReferenceGenome.from_fasta(os.path.join(bdir, "ref.fa"))
    index = KmerIndex.load_or_build(ref, os.path.join(bdir, "ref.fa"),
                                    k=cfg.kmer_length, kmer_skip=cfg.kmer_skip,
                                    bin_size=cfg.bin_size,
                                    max_prefix_freq=cfg.max_prefix_freq)
    ds = dsm.DeviceSearch(index)

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

    # warm (compile) once
    out = ds.search_batch(seqs, cfg.sensitivity, cfg.min_kmer_hits)
    assert out is not None

    tdir = "/tmp/jax_trace_search"
    os.system("rm -rf " + tdir)
    jax.profiler.start_trace(tdir)
    t0 = time.perf_counter()
    ds.search_batch(seqs, cfg.sensitivity, cfg.min_kmer_hits)
    el = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print("traced search_batch: %.2f s" % el)

    # parse the trace proto for XLA op durations
    paths = glob.glob(tdir + "/**/*.trace.json.gz", recursive=True)
    if not paths:
        paths = glob.glob(tdir + "/**/*trace*", recursive=True)
        print("trace files:", paths[:8])
        return
    import json
    from collections import defaultdict
    tot = defaultdict(float)
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            name = ev.get("name", "")
            dur = ev.get("dur", 0) / 1e3   # ms
            tot[name] += dur
    for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:40]:
        print("  %9.1f ms  %s" % (ms, name[:110]))


if __name__ == "__main__":
    main()
