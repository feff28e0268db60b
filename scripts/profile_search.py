"""On-chip microbenchmarks for the device candidate-search primitives.

The search kernel (seed/device_search.py) is sorts + scans + gathers over
NV-sized vote arrays; this script times each primitive shape on the real
chip so kernel-design decisions use measured numbers, not guesses. Also
times the full search_batch on the committed bench workload when the
bench caches exist (BENCH_DIR or /tmp/ngmlr_bench_g300.0_*).

Every timing fetches a dependent value (block_until_ready does not block
over the axon tunnel).
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


def probe(x):
    if isinstance(x, (tuple, list)):
        x = x[0]
    return np.asarray(jax.device_get(x.ravel()[:4]))


def bench(name, fn, *args, n=3):
    fn_j = jax.jit(fn)
    probe(fn_j(*args))          # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        probe(fn_j(*args))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print("  %-46s %8.1f ms" % (name, best * 1e3))
    return best


def main():
    NV = 1 << 22
    rng = np.random.default_rng(7)
    sub = jnp.asarray(np.sort(rng.integers(0, 4000, NV)).astype(np.int32))
    g2 = jnp.asarray(rng.integers(0, 1 << 26, NV).astype(np.int32))
    idx = jnp.arange(NV, dtype=jnp.int32)
    perm = jnp.asarray(rng.permutation(NV).astype(np.int32))
    vals = jnp.asarray(rng.integers(0, 1 << 18, NV).astype(np.int32))
    positions = jnp.asarray(
        rng.integers(0, 100_000_000, 100_000_000).astype(np.uint32))
    gidx = jnp.asarray(rng.integers(0, 100_000_000, NV).astype(np.int32))
    flags = jnp.asarray((rng.random(NV) < 0.01))

    if os.environ.get("PROF_SKIP_PRIM"):
        return e2e()
    print("primitives @ NV = 2^22:")
    bench("sort 1 key (i32)", lambda a: jax.lax.sort((a,), num_keys=1), g2)
    bench("sort 1 key + 1 payload",
          lambda a, b: jax.lax.sort((a, b), num_keys=1), g2, idx)
    bench("sort 1 key + 2 payload",
          lambda a, b, c: jax.lax.sort((a, b, c), num_keys=1), g2, idx, vals)
    bench("sort 2 keys + 1 payload",
          lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2), sub, g2, idx)
    bench("sort 3 keys (the grouping sort)",
          lambda a, b, c: jax.lax.sort((a, b, c), num_keys=3), sub, g2, idx)
    bench("sort 2 keys + 5 payload",
          lambda *a: jax.lax.sort(a, num_keys=2),
          sub, g2, idx, vals, vals, vals, vals)
    bench("scatter-set NV (inverse permutation)",
          lambda p, v: jnp.zeros(NV, jnp.int32).at[p].set(v), perm, vals)
    bench("gather NV from 100M (positions)",
          lambda pos, i: pos[i], positions, gidx)
    bench("cummax NV", lambda a: jax.lax.cummax(a), vals)
    # NOTE: a custom (flag, value) associative_scan at NV=2^22 never
    # finished compiling within 35 min on this backend — measured twice,
    # killed both times. Segmented reductions must use scatter/sort.
    bench("scatter-min NV (segment_min)",
          lambda s, v: jnp.full(NV, jnp.int32(NV)).at[s].min(v, mode="drop"),
          jnp.asarray(np.sort(rng.integers(0, NV, NV)).astype(np.int32)),
          vals)
    bench("cumsum NV i32", lambda a: jnp.cumsum(a), vals)
    bench("repeat NK->NV (vote expansion)",
          lambda c: jnp.repeat(jnp.arange(1 << 19, dtype=jnp.int32),
                               c, total_repeat_length=NV),
          jnp.asarray(np.full(1 << 19, 8, np.int32)))
    b = bench("histogram scatter-add [B,Tp] (count_leq shape)",
              lambda kc: jnp.zeros((16, 32768 + 1), jnp.int32).at[
                  jnp.arange(16, dtype=jnp.int32)[:, None],
                  kc].add(1),
              jnp.asarray(rng.integers(0, 32768, (16, 16384)).astype(np.int32)))
    # row-wise sorts: same total elements as the flat NV sort, but the
    # bitonic stage count scales with the SORT-DIM size (log^2), so short
    # rows should be several x cheaper per element
    g2r = jnp.asarray(rng.integers(0, 1 << 26, (4096, 1024)).astype(np.int32))
    idxr = jnp.broadcast_to(jnp.arange(1024, dtype=jnp.int32)[None],
                            (4096, 1024))
    bench("row sort [4096,1024] 1 key + 1 payload",
          lambda a, b2: jax.lax.sort((a, b2), dimension=1, num_keys=1),
          g2r, idxr)
    g2s = jnp.asarray(rng.integers(0, 1 << 26, (16384, 256)).astype(np.int32))
    idxs_s = jnp.broadcast_to(jnp.arange(256, dtype=jnp.int32)[None],
                              (16384, 256))
    bench("row sort [16384,256] 1 key + 1 payload",
          lambda a, b2: jax.lax.sort((a, b2), dimension=1, num_keys=1),
          g2s, idxs_s)
    bench("row cummax [4096,1024]",
          lambda a: jax.lax.cummax(a, axis=1), g2r)
    # does one 2-column row gather beat two 1-column gathers?
    tab1 = jnp.asarray(rng.integers(0, 1 << 28, 1 << 22).astype(np.int32))
    tab2 = jnp.asarray(rng.integers(0, 1 << 28, 1 << 22).astype(np.int32))
    tabr = jnp.stack([tab1, tab2], axis=-1)
    kidx = jnp.asarray(rng.integers(0, 1 << 22, NV).astype(np.int32))
    bench("2x single gather NV from 4M",
          lambda a, b2, i: a[i] + b2[i], tab1, tab2, kidx)
    bench("1x row gather [NV,2] from [4M,2]",
          lambda t, i: t[i].sum(axis=-1), tabr, kidx)

    e2e()


def e2e():
    # ---- full search_batch on the bench workload -------------------------
    bdir = os.environ.get("BENCH_DIR", "/tmp/ngmlr_bench_g300.0_r9000_n576_w16")
    if not os.path.isdir(bdir):
        print("no bench cache dir (%s); skipping end-to-end" % bdir)
        return
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
                                    k=cfg.kmer_length, kmer_skip=cfg.kmer_skip,
                                    bin_size=cfg.bin_size,
                                    max_prefix_freq=cfg.max_prefix_freq)
    print("ref+index load: %.1f s" % (time.perf_counter() - t0))
    ctx = device_engine.DeviceContext(ref.codes)
    device_engine.set_current(ctx)
    ds = DeviceSearch(index)

    batch = next(read_batches(os.path.join(bdir, "reads.fa"),
                              int(os.environ.get("PROF_READS", "192"))))
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

    for it in range(3):
        for k in list(ctx.stats):
            if k.startswith("search_"):
                ctx.stats[k] = 0.0
        t0 = time.perf_counter()
        out = ds.search_batch(seqs, cfg.sensitivity, cfg.min_kmer_hits)
        el = time.perf_counter() - t0
        split = {k: round(v, 3) for k, v in sorted(ctx.stats.items())
                 if k.startswith("search_")}
        print("search_batch[%d]: %.2f s  (%s)  none=%s"
              % (it, el, split, out is None))


if __name__ == "__main__":
    main()
