"""Chip microbench: positions-gather formulations at vote scale.

The v2 search kernel's dominant stage is the random gather into the
GB-scale positions table (~77 ms per 3.7M votes at 3 Gbp = 75% of
search device time). This measures whether locality-aware formulations
(pre-sorted indices, octet row gathers, index dtypes) beat the naive
flat gather, using a REAL index's positions table and realistic
bucket-run access patterns.
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


def probe(x):
    if isinstance(x, (tuple, list)):
        x = x[0]
    return np.asarray(jax.device_get(
        jnp.sum(x.astype(jnp.float32).ravel()[:4])))


def timeit(name, fn, *args, reps=3):
    f = jax.jit(fn)
    probe(f(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        probe(f(*args))
        best = min(best, time.perf_counter() - t0)
    print("  %-52s %8.2f ms" % (name, best * 1e3))
    return best


def main():
    probe(jnp.arange(8))
    N = 1 << 30                       # 1G-entry table (4 GB, 3 Gbp-like)
    NV = 1 << 22
    rng = np.random.default_rng(3)
    table = jnp.asarray(
        rng.integers(0, 1 << 30, N, dtype=np.int32).view(np.uint32))

    # realistic run-structured indices: ~280k runs, mean length 15
    n_runs = NV // 15
    bases = rng.integers(0, N - 64, n_runs, dtype=np.int64)
    lens = np.clip(rng.geometric(1.0 / 15.0, n_runs), 1, 64)
    tot = int(lens.sum())
    idx_np = np.empty(tot, dtype=np.int64)
    off = np.cumsum(lens) - lens
    for i in range(n_runs):
        idx_np[off[i]:off[i] + lens[i]] = np.arange(
            bases[i], bases[i] + lens[i])
    idx_np = idx_np[:NV] if tot >= NV else np.pad(idx_np, (0, NV - tot))
    idx = jnp.asarray(idx_np.astype(np.uint32))
    idx_sorted = jnp.asarray(np.sort(idx_np.astype(np.uint32)))
    idx_rand = jnp.asarray(
        rng.integers(0, N, NV, dtype=np.int64).astype(np.uint32))

    print("gather 2^22 from 2^30 uint32 table:")
    timeit("flat take, run-structured idx", lambda t, i: jnp.take(
        t, i, mode="clip"), table, idx)
    timeit("flat take, SORTED idx", lambda t, i: jnp.take(
        t, i, mode="clip"), table, idx_sorted)
    timeit("flat take, uniform random idx", lambda t, i: jnp.take(
        t, i, mode="clip"), table, idx_rand)
    timeit("flat take, int32 idx", lambda t, i: jnp.take(
        t, i, mode="clip"), table, idx.astype(jnp.int32))
    timeit("2D [B,L] take (clip)", lambda t, i: jnp.take(
        t, i, mode="clip"), table, idx.reshape(4096, 1024))
    # octet rows: one index per 8 consecutive elements
    t8 = table.reshape(-1, 8)
    i8 = (idx_sorted[::8] >> 3).astype(jnp.int32)
    timeit("octet row gather (NV/8 rows of 8)",
           lambda t, i: t[i], t8, i8)
    # sort + gather + unsort round trip (what a locality rewrite costs)
    iota = jnp.arange(NV, dtype=jnp.int32)

    def sorted_roundtrip(t, i):
        si, inv = jax.lax.sort((i, iota), num_keys=1)
        g = jnp.take(t, si, mode="clip")
        _, out = jax.lax.sort((inv, g), num_keys=1)
        return out
    timeit("sort idx + take + unsort (full roundtrip)",
           sorted_roundtrip, table, idx)


if __name__ == "__main__":
    main()
