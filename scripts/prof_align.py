"""Micro-profile the convex align path on the live chip: host pack,
dispatch, device compute, and fetch for a bench-like bucket."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from ngmlr_tpu.ops import device_engine as de

B = int(os.environ.get("PROF_B", "64"))
RLEN = int(os.environ.get("PROF_RLEN", "9000"))
WIDTH = int(os.environ.get("PROF_WIDTH", "500"))

rng = np.random.default_rng(0)
genome = rng.integers(0, 4, size=2_000_000, dtype=np.uint8)
ctx = de.DeviceContext(genome)

reads = rng.integers(0, 4, size=B * RLEN, dtype=np.uint8)
readbuf = ctx.upload_reads(reads)

W = int(RLEN * 1.1)
problems = []
for i in range(B):
    ds = int(rng.integers(0, len(genome) - W - 1))
    problems.append(de.AlignProblem(
        de.RefDesc(ds, 0, ds + W, W), de.QryDesc(i * RLEN, RLEN, False),
        de.CORRIDOR_ENDPOINTS, (RLEN / W, WIDTH / 2.0), 0, WIDTH))

params = (2.0, -5.0, -5.0, -5.0, -1.0, 0.15)

# warm up compile
ctx.align_wave(problems[:8], params)
ctx.align_wave(problems, params)

for trial in range(3):
    t0 = time.perf_counter()
    pend = ctx.align_dispatch(problems, params)
    t1 = time.perf_counter()
    _, pending = pend
    # force device completion + fetch
    fetched = jax.device_get([(p, s) for _, p, s in pending])
    t2 = time.perf_counter()
    ctx.align_finalize(pend, fetched=fetched)
    t3 = time.perf_counter()
    cells = sum((p.T + 1) * WIDTH for p in problems)
    print(f"trial {trial}: dispatch(pack+launch)={1e3*(t1-t0):.1f}ms "
          f"compute+fetch={1e3*(t2-t1):.1f}ms unpack={1e3*(t3-t2):.1f}ms "
          f"total={1e3*(t3-t0):.1f}ms "
          f"gcups(corridor cells)={cells/(t3-t0)/1e9:.1f}")

# isolate fetch cost: dispatch again, wait for compute via tiny scalar fetch,
# then time the ops fetch alone
pend = ctx.align_dispatch(problems, params)
_, pending = pend
_ = jax.device_get([s for _, _, s in pending])   # scalars only (compute done)
t0 = time.perf_counter()
_ = jax.device_get([p for _, p, _ in pending])   # packed ops
t1 = time.perf_counter()
nbytes = sum(int(np.prod(p.shape)) for _, p, _ in pending)
print(f"ops fetch alone: {1e3*(t1-t0):.1f}ms for {nbytes/1e3:.0f} KB "
      f"({nbytes/(t1-t0)/1e6:.1f} MB/s)")

# --- sweep (BT, K) configs via monkeypatch --------------------------------
if os.environ.get("PROF_SWEEP"):
    from ngmlr_tpu.ops.device_engine import DeviceContext as _DC
    for bt, kk in ((16, 128), (32, 64), (16, 64), (32, 128)):
        _DC._convex_impl = staticmethod(
            lambda Wp, Hp, L, n, _b=bt, _k=kk: ("pallas", _k, _b))
        try:
            ctx.align_wave(problems, params)   # warm/compile
            t0 = time.perf_counter()
            for _ in range(2):
                pend = ctx.align_dispatch(problems, params)
                _, pending = pend
                fetched = jax.device_get([(p, s) for _, p, s in pending])
                ctx.align_finalize(pend, fetched=fetched)
            dt = (time.perf_counter() - t0) / 2
            cells = sum((p.T + 1) * WIDTH for p in problems)
            print(f"BT={bt} K={kk}: {1e3*dt:.1f}ms "
                  f"gcups={cells/dt/1e9:.1f}")
        except Exception as e:
            print(f"BT={bt} K={kk}: FAILED {type(e).__name__}: {str(e)[:200]}")
