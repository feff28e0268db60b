"""Chip microbench: candidate-search primitive strategies at vote scale.

The chunk kernel's cost at human-genome scale is the NV-sized sort/scan
chain (4 global lax.sorts today). The vote stream is subread-major, so a
row-local formulation ([n_sub, L] batched sorts along axis 1) is
semantically available — this script measures whether it is faster, plus
the scatter/gather alternatives for the inverse-permutation step, so the
v2 kernel design is driven by measured numbers, not folklore.

Run on the chip (no env var) or CPU (JAX_PLATFORMS=cpu).
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
    try:
        t0 = time.perf_counter()
        probe(f(*args))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            probe(f(*args))
            best = min(best, time.perf_counter() - t0)
        print("  %-44s %8.2f ms   (compile %.1fs)"
              % (name, best * 1e3, compile_s))
        return best
    except Exception as e:
        print("  %-44s FAILED: %r" % (name, str(e)[:120]))
        return None


def main():
    # tiny op first (tunnel wedge guard, CLAUDE.md)
    probe(jnp.arange(8))
    NV = 1 << 22
    rng = np.random.default_rng(0)
    # bin-like keys: mostly-random 28-bit values
    bins = jnp.asarray(rng.integers(0, 1 << 28, NV, dtype=np.int32))
    subs = jnp.asarray(np.sort(rng.integers(0, 6000, NV, dtype=np.int32)))
    iota = jnp.arange(NV, dtype=jnp.int32)
    perm = jnp.asarray(rng.permutation(NV).astype(np.int32))
    vals = jnp.asarray(rng.integers(0, 1 << 30, NV, dtype=np.int32))

    print("global sorts at NV=2^22:")
    timeit("sort (bin,iota) 1key", lambda b, i: jax.lax.sort(
        (b, i), num_keys=1), bins, iota)
    timeit("sort (sub,bin,iota) 3key", lambda s, b, i: jax.lax.sort(
        (s, b, i), num_keys=3), subs, bins, iota)
    timeit("sort (sub,bin,iota) 2key", lambda s, b, i: jax.lax.sort(
        (s, b, i), num_keys=2), subs, bins, iota)
    timeit("sort (bin,iota,val,val2) 1key 4ops",
           lambda b, i, v: jax.lax.sort((b, i, v, v + 1), num_keys=1),
           bins, iota, vals)

    print("batched row sorts (same 2^22 total):")
    for B, L in ((512, 8192), (4096, 1024), (64, 65536), (2048, 2048)):
        bb = bins.reshape(B, L)
        ii = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None], (B, L))
        timeit("sort rows [%d,%d] (bin,iota)" % (B, L),
               lambda b, i: jax.lax.sort((b, i), dimension=1, num_keys=1),
               bb, ii)

    print("scatter/gather/scan at NV=2^22:")
    timeit("gather NV<-NV random", lambda v, p: v[p], vals, perm)
    timeit("scatter NV set", lambda v, p: jnp.zeros(NV, jnp.int32)
           .at[p].set(v, mode="drop"), vals, perm)
    timeit("scatter NV min", lambda v, p: jnp.full(NV, 2**30, jnp.int32)
           .at[p].min(v, mode="drop"), vals, perm)
    timeit("cumsum NV", lambda v: jnp.cumsum(v), vals)
    timeit("cummax NV", lambda v: jax.lax.cummax(v), vals)

    print("batched row scatter/gather [4096,1024]:")
    B, L = 4096, 1024
    vr = vals.reshape(B, L)
    pr = jnp.asarray(
        np.stack([rng.permutation(L) for _ in range(B)]).astype(np.int32))
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    timeit("row gather take_along_axis",
           lambda v, p: jnp.take_along_axis(v, p, axis=1), vr, pr)
    timeit("row scatter .at[rows,p].set",
           lambda v, p: jnp.zeros((B, L), jnp.int32)
           .at[rows, p].set(v, mode="drop"), vr, pr)
    timeit("row sort-as-scatter (p,v) 1key",
           lambda v, p: jax.lax.sort((p, v), dimension=1, num_keys=1),
           vr, pr)
    print("batched cumsum/cummax [4096,1024] axis1:")
    timeit("row cumsum", lambda v: jnp.cumsum(v, axis=1), vr)
    timeit("row cummax", lambda v: jax.lax.cummax(v, axis=1), vr)


if __name__ == "__main__":
    main()
