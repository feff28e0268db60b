"""On-chip timing of the candidate-scoring kernel (score_fill) at the
bench's hot shape: ~10k problems of 320x256 per intake batch. Every
timing fetches a dependent value (block_until_ready does not block over
the axon tunnel)."""

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
    P = int(os.environ.get("PROF_P", "9664"))      # problems per batch
    W = int(os.environ.get("PROF_W", "306"))
    Q = int(os.environ.get("PROF_Q", "256"))
    rng = np.random.default_rng(5)
    genome = np.asarray(rng.integers(0, 4, size=64 << 20), dtype=np.uint8)
    ctx = de.DeviceContext(genome)
    readbuf = ctx.upload_reads(
        np.asarray(rng.integers(0, 4, size=4 << 20), dtype=np.uint8))

    pk = np.zeros((P, 7), dtype=np.int32)
    pku = pk.view(np.uint32)
    for i in range(P):
        ds = int(rng.integers(1000, (64 << 20) - W - 1000))
        pku[i, 0], pku[i, 1] = ds, ds + W
        pk[i, 3] = W
        pk[i, 4] = int(rng.integers(0, (4 << 20) - Q))
        pk[i, 5] = Q
        pk[i, 6] = i & 1

    for it in range(3):
        t0 = time.perf_counter()
        out = ctx.score_wave_np(pk)
        el = time.perf_counter() - t0
        cells = P * 320 * 256
        print("it%d: %.3f s  (%d problems, %.1f GCUPS padded)"
              % (it, el, P, cells / el / 1e9))
    s = {k: round(v, 3) for k, v in ctx.stats.items()
         if isinstance(v, float) and v}
    print("stats:", s)


if __name__ == "__main__":
    main()
