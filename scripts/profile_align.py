"""Decompose align-wave time on the real chip.

Times, for a bench-like wave of B alignment problems (9 kb reads, ~380
corridor):

  * dispatch (host packing + XLA launch, async)
  * device wall (fetch of a 1-element probe that depends on the result)
  * fetch of the packed op stream + scalars (the real D2H cost)
  * the _convex_kernel sub-stages, isolated: ref/qry gathers, the
    count_leq histograms, the Pallas fill, the backtrack

Every stage is timed by fetching a small result that depends on it
(block_until_ready does not block over the axon tunnel).
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

from ngmlr_tpu.ops import device_engine as de


def fetch_probe(x):
    """Force + time a dependency via a tiny D2H fetch."""
    return np.asarray(jax.device_get(jnp.sum(x.astype(jnp.float32).ravel()[:8])))


def main():
    B = int(os.environ.get("PROF_B", "192"))
    W = int(os.environ.get("PROF_W", "9600"))
    H = int(os.environ.get("PROF_H", "9000"))
    width = int(os.environ.get("PROF_WIDTH", "380"))
    rng = np.random.default_rng(3)

    genome = np.asarray(rng.integers(0, 4, size=64 << 20), dtype=np.uint8)
    ctx = de.DeviceContext(genome)
    readbuf = ctx.upload_reads(
        np.asarray(rng.integers(0, 4, size=B * H + 64), dtype=np.uint8))

    problems = []
    for b in range(B):
        ds = int(rng.integers(1000, len(genome) - W - 1000))
        problems.append(de.AlignProblem(
            de.RefDesc(ds, 0, ds + W, W), de.QryDesc(b * H, H, b & 1),
            de.CORRIDOR_ANCHORS,
            (float(np.float32(H) / np.float32(W)), float(width // 2)),
            0, width))
    params = (2.0, -5.0, -5.0, -5.0, -1.0, 0.15)

    # --- end-to-end wave, twice (first pays compiles) ---------------------
    for it in range(3):
        t0 = time.perf_counter()
        pend = ctx.align_dispatch(problems, params)
        t1 = time.perf_counter()
        ctx.align_finalize(pend)
        t2 = time.perf_counter()
        print("it%d: dispatch %.3fs finalize(incl device+fetch) %.3fs "
              "align_s_total %.3fs" % (it, t1 - t0, t2 - t1, t2 - t0))

    # --- sub-stage isolation ---------------------------------------------
    p0 = problems[0]
    pk = np.zeros((B, 12), dtype=np.int32)
    pku = pk.view(np.uint32)
    pkf = pk.view(np.float32)
    for bi, p in enumerate(problems):
        pku[bi, 0], pku[bi, 1] = p.ref.ds, p.ref.hi
        pk[bi, 2:10] = (p.ref.diff, p.ref.W, p.qry.start, p.qry.length,
                        1 if p.qry.rev else 0, p.corridor_mode,
                        p.corridor_i, p.width)
        pkf[bi, 10:12] = p.corridor_f
    Wp = de._size_class(W, 256)
    Hp = de._size_class(H, 256)
    L = ((de.DeviceContext._lane_bound(p0) + 127) // 128 * 128)
    impl, K, BT = de.DeviceContext._convex_impl(Wp, Hp, L, B)
    print("shape: Wp=%d Hp=%d L=%d impl=%s K=%d BT=%d" % (Wp, Hp, L, impl, K, BT))

    pkj = jax.device_put(jnp.asarray(pk))
    pvec = jax.device_put(jnp.asarray(params, dtype=jnp.float32))

    Tp = Wp + Hp

    @jax.jit
    def stage_gather(pkx):
        pu = jax.lax.bitcast_convert_type(pkx[:, 0:2], jnp.uint32)
        pi = pkx[:, 2:10]
        ref = de._gather_ref(ctx.genome, pu[:, 0], pi[:, 0], pu[:, 1],
                             pi[:, 1], Wp)
        qry = de._gather_qry(readbuf, pi[:, 2], pi[:, 3], pi[:, 4], Hp)
        return ref, qry

    @jax.jit
    def stage_hist(pkx):
        pi = pkx[:, 2:10]
        pf = jax.lax.bitcast_convert_type(pkx[:, 10:12], jnp.float32)
        Wv, Hv = pi[:, 1], pi[:, 3]
        hrow_i = jnp.arange(Hp, dtype=jnp.int32)[None, :]
        offs = de._corridor_offs(pi[:, 5], pi[:, 6], pf,
                                 hrow_i.astype(jnp.float32), hrow_i)
        lo = jnp.clip(offs, 0, Wv[:, None])
        hi = jnp.maximum(jnp.clip(offs + pi[:, 7][:, None], 0, Wv[:, None]), lo)
        row_ok = hrow_i < Hv[:, None]
        BIG = jnp.int32(2 ** 30)
        key_lo = jnp.where(row_ok, hrow_i + lo, BIG)
        key_hi = jnp.where(row_ok, hrow_i + hi, BIG)
        rows = jnp.arange(pkx.shape[0], dtype=jnp.int32)[:, None]

        def count_leq(key):
            kc = jnp.minimum(key, jnp.int32(Tp)).astype(jnp.int32)
            hist = jnp.zeros((pkx.shape[0], Tp + 1), jnp.int32).at[rows, kc].add(1)
            return jnp.cumsum(hist[:, :Tp], axis=1)

        return count_leq(key_hi), count_leq(key_lo) - 1

    def timed(name, fn, *args, reps=3):
        outs = fn(*args)
        fetch_probe(outs[0] if isinstance(outs, tuple) else outs)  # compile
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = fn(*args)
            fetch_probe(outs[0] if isinstance(outs, tuple) else outs)
            best = min(best, time.perf_counter() - t0)
        print("  %-22s %.3f s" % (name, best))
        return outs

    timed("gathers(ref+qry)", stage_gather, pkj)
    timed("corridor hist+cumsum", stage_hist, pkj)
    full = timed("full _convex_kernel",
                 lambda x: de._convex_kernel(ctx.genome, readbuf, x, pvec,
                                             Wp=Wp, Hp=Hp, L=L, impl=impl,
                                             K=K, BT=BT), pkj)
    packed, scalars = full

    # fetch cost of the packed op stream (flat [B * ceil(Tp/4)] u8)
    t0 = time.perf_counter()
    got = jax.device_get([packed, scalars])
    print("  %-22s %.3f s (%.1f KB)" % (
        "fetch ops+scalars", time.perf_counter() - t0,
        (got[0].nbytes + got[1].nbytes) / 1e3))


if __name__ == "__main__":
    main()
