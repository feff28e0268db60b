"""On-chip sweep of the convex fill/backtrack kernel tile parameters.

Times `_convex_kernel` end-to-end on a bench-like problem population for
a grid of (BT, K, GU) choices and prints a ranked table + useful-cell
GCUPS. Run on the real chip; results feed `_convex_impl`'s defaults.

Every timing fetches a value that depends on the kernel output
(block_until_ready does not block over the axon tunnel).
"""

import itertools
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


def main():
    B = int(os.environ.get("TUNE_B", "64"))
    W = int(os.environ.get("TUNE_W", "9600"))
    H = int(os.environ.get("TUNE_H", "9000"))
    width = int(os.environ.get("TUNE_WIDTH", "380"))
    rng = np.random.default_rng(3)

    genome = jnp.asarray(
        np.asarray(rng.integers(0, 4, size=16 << 20), dtype=np.uint8))
    readbuf = jnp.asarray(
        np.asarray(rng.integers(0, 4, size=B * H + 64), dtype=np.uint8))
    params = jnp.asarray([2.0, -5.0, -5.0, -5.0, -1.0, 0.15], np.float32)

    pk = np.zeros((B, 12), dtype=np.int32)
    pku = pk.view(np.uint32)
    pkf = pk.view(np.float32)
    for b in range(B):
        ds = int(rng.integers(1000, (16 << 20) - W - 1000))
        k_align = float(np.float32(H) / np.float32(W))
        pku[b, 0], pku[b, 1] = ds, ds + W
        pk[b, 2:10] = (0, W, b * H, H, b & 1, de.CORRIDOR_ANCHORS, 0, width)
        pkf[b, 10:12] = (k_align, float(width // 2))
    pkj = jax.device_put(jnp.asarray(pk))

    Wp = de._size_class(W, 256)
    Hp = de._size_class(H, 256)
    hb = int(width * (float(pkf[0, 10]) / (float(pkf[0, 10]) + 1.0))) + 6
    L = (hb + 127) // 128 * 128
    useful = B * H * min(width, W)
    print("shape: B=%d Wp=%d Hp=%d L=%d useful=%.2fG cells"
          % (B, Wp, Hp, L, useful / 1e9))

    results = []
    for BT, K, GU in itertools.product((8, 16, 32, 64), (64, 128, 256), (8,)):
        if GU > K:
            continue
        vmem = BT * K * L * 4 + 3 * BT * K * L + 10 * BT * L * 4
        if vmem > 14 << 20:
            continue
        try:
            fn = lambda: de._convex_kernel(genome, readbuf, pkj, params,
                                           Wp=Wp, Hp=Hp, L=L,
                                           impl="pallas", K=K, BT=BT)
            # GU is currently derived inside _convex_kernel (min(32, K));
            # sweep left in place for when it becomes a parameter
            out = fn()
            np.asarray(jax.device_get(out[1][:1]))   # compile + sync
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn()
                np.asarray(jax.device_get(out[1][:1]))
                best = min(best, time.perf_counter() - t0)
            g = useful / best / 1e9
            results.append((best, g, BT, K, GU))
            print("BT=%-3d K=%-4d GU=%-3d  %.3f s  %.2f useful-GCUPS"
                  % (BT, K, GU, best, g))
        except Exception as e:
            print("BT=%-3d K=%-4d GU=%-3d  FAILED %r" % (BT, K, GU, e))
    if results:
        results.sort()
        b = results[0]
        print("best: BT=%d K=%d GU=%d -> %.3f s (%.2f useful-GCUPS)"
              % (b[2], b[3], b[4], b[0], b[1]))


if __name__ == "__main__":
    main()
