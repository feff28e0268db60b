#!/usr/bin/env python3
"""Kernel parity check: the Pallas TPU kernels must produce bit-identical
results to the pure-XLA scan formulation (the reference twin), which is
itself validated against the scalar Python oracle by the test suite.

This is the reference's own TEST_ALIGNER dual-implementation pattern
(AlignmentBuffer.h:26, AlignmentBuffer.cpp:364-401) applied to the TPU
build. Run on a machine with a real TPU; exits nonzero on any mismatch.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ngmlr_tpu.ops import device_engine as de


def main():
    if os.environ.get("JAX_PLATFORMS"):
        # honor the env var under the host's platform latch (see cli.py)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    if jax.default_backend() != "tpu":
        # no chip: run the Mosaic kernels in Pallas TPU *interpret* mode on
        # the CPU backend — slower, but the same kernel source, so logic
        # changes are still verified bit-for-bit against the scan twin
        from contextlib import ExitStack
        from jax.experimental.pallas import tpu as pltpu
        if not hasattr(pltpu, "force_tpu_interpret_mode"):
            print("SKIP: no TPU backend and no pallas interpret mode")
            return 0
        print("no TPU backend -> pallas TPU interpret mode on CPU")
        stack = ExitStack()
        stack.enter_context(pltpu.force_tpu_interpret_mode())
    rng = np.random.default_rng(int(os.environ.get("SEED", "7")))
    G = 200_000
    genome = jnp.asarray(rng.integers(0, 5, size=G).astype(np.uint8))
    readbuf = jnp.asarray(rng.integers(0, 5, size=1 << 15).astype(np.uint8))
    params = jnp.asarray([2.0, -5.0, -5.0, -5.0, -1.0, 0.15], np.float32)

    failures = 0
    for trial in range(int(os.environ.get("TRIALS", "4"))):
        B, Wp, Hp, L = 32, 1024, 1024, 128
        pk = np.zeros((B, 12), np.int32)
        pku = pk.view(np.uint32)
        pkf = pk.view(np.float32)
        for b in range(B):
            W = int(rng.integers(200, 1000))
            H = int(rng.integers(100, 1000))
            ds = int(rng.integers(0, G - W - 1))
            qs = int(rng.integers(0, (1 << 15) - H - 1))
            mode = int(rng.integers(0, 4))
            width = int(rng.integers(24, 120))
            if mode == de.CORRIDOR_FULL:
                w = W + 1
                ci = int(np.float32(w) * np.float32(-0.2))
                width = w + int(np.float32(w) * np.float32(0.2))
                cf = (1.0, 0.0)
            elif mode == de.CORRIDOR_LINEAR:
                ci = width // 2
                cf = (1.0, 0.0)
            else:
                ci = 0
                cf = (float(np.float32(H) / np.float32(W)),
                      float(np.float32(width) / np.float32(2.0)))
            pku[b, 0], pku[b, 1] = ds, ds + W
            pk[b, 2:10] = (0, W, qs, H, b & 1, mode, ci, width)
            pkf[b, 10:12] = cf
        args = (genome, readbuf, jnp.asarray(pk), params)
        o_scan = de._convex_kernel(*args, Wp=Wp, Hp=Hp, L=L, impl="scan")
        for BT in (8, 16, 32):
            K = 256
            o_pal = de._convex_kernel(*args, Wp=Wp, Hp=Hp, L=L,
                                      impl="pallas", K=K, BT=BT)
            ss, sp = np.asarray(o_scan[1]), np.asarray(o_pal[1])
            ok_scalars = bool((ss == sp).all())
            pks_, pkp = np.asarray(o_scan[0]), np.asarray(o_pal[0])
            n = min(pks_.shape[1], pkp.shape[1])
            ok_ops = bool((pks_[:, :n] == pkp[:, :n]).all()
                          and (pkp[:, n:] == 0).all())
            status = "OK" if (ok_scalars and ok_ops) else "MISMATCH"
            print(f"trial {trial} BT={BT}: scalars={ok_scalars} "
                  f"ops={ok_ops} -> {status}")
            failures += not (ok_scalars and ok_ops)

        # scoring kernel
        P, Rp, Qp = 512, 320, 256
        spk = np.zeros((P, 7), np.int32)
        spku = spk.view(np.uint32)
        for p in range(P):
            ds = int(rng.integers(0, G - 400))
            spku[p, 0], spku[p, 1] = ds, ds + 306
            spk[p, 2:7] = (0, 306, int(rng.integers(0, (1 << 15) - 300)),
                           256, p & 1)
        sargs = (genome, readbuf, jnp.asarray(spk))
        s1 = np.asarray(de._score_kernel(*sargs, Rp=Rp, Qp=Qp, impl="pallas"))
        s2 = np.asarray(de._score_kernel(*sargs, Rp=Rp, Qp=Qp, impl="scan"))
        ok = bool((s1 == s2).all())
        print(f"trial {trial} score: {'OK' if ok else 'MISMATCH'}")
        failures += not ok

    # wide-corridor shapes: fill runs shrunken K (3D blocks), backtrack
    # K=128 — the retry-multiplier / realign path
    for L, K in ((1536, 128), (2560, 64)):
        B, Wp, Hp = 8, 4096, 3072
        pk = np.zeros((B, 12), np.int32)
        pku = pk.view(np.uint32)
        pkf = pk.view(np.float32)
        for b in range(B):
            W = int(rng.integers(2000, 4000))
            H = int(rng.integers(1000, 3000))
            ds = int(rng.integers(0, G - W - 1))
            qs = int(rng.integers(0, (1 << 15) - H - 1))
            width = int(rng.integers(L - 200, L - 3))
            pku[b, 0], pku[b, 1] = ds, ds + W
            pk[b, 2:10] = (0, W, qs, H, b & 1, de.CORRIDOR_ENDPOINTS, 0, width)
            pkf[b, 10:12] = (float(np.float32(H) / np.float32(W)),
                             float(np.float32(width) / np.float32(2.0)))
        args = (genome, readbuf, jnp.asarray(pk), params)
        o_scan = de._convex_kernel(*args, Wp=Wp, Hp=Hp, L=L, impl="scan")
        o_pal = de._convex_kernel(*args, Wp=Wp, Hp=Hp, L=L,
                                  impl="pallas", K=K, BT=8)
        ss, sp = np.asarray(o_scan[1]), np.asarray(o_pal[1])
        ok_scalars = bool((ss == sp).all())
        pks_, pkp = np.asarray(o_scan[0]), np.asarray(o_pal[0])
        n = min(pks_.shape[1], pkp.shape[1])
        ok_ops = bool((pks_[:, :n] == pkp[:, :n]).all()
                      and (pkp[:, n:] == 0).all())
        status = "OK" if (ok_scalars and ok_ops) else "MISMATCH"
        print(f"wide L={L} K={K}: scalars={ok_scalars} ops={ok_ops} "
              f"-> {status}")
        failures += not (ok_scalars and ok_ops)

    print(f"failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
