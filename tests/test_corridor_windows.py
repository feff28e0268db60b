"""corridor_windows (Pallas pointer-advance kernel) vs the histogram
count_leq formulation: exact equality of per-wavefront row windows.

The kernel replaces the two scatter histograms in
device_engine._convex_kernel; correctness is byte-identity-critical
(ymin defines which lane holds which DP row). Runs in pallas interpret
mode on the CPU backend.
"""

import numpy as np
import jax.numpy as jnp

from ngmlr_tpu.ops.device_engine import (
    CORRIDOR_FULL, CORRIDOR_LINEAR, CORRIDOR_ENDPOINTS, CORRIDOR_ANCHORS)
from ngmlr_tpu.ops.pallas_kernels import corridor_windows

f32 = np.float32


def hist_windows(mode, ci, width, W, H, k, d, Tp):
    """The count_leq identity, straight numpy (the XLA formulation's
    twin): ymin[t] = #{y < H: y + hi(y) <= t}, ymax = #{key_lo <= t}-1."""
    B = len(mode)
    ymin = np.zeros((B, Tp), np.int32)
    ymax = np.zeros((B, Tp), np.int32)
    for b in range(B):
        y = np.arange(max(H[b], 1), dtype=np.int32)[: H[b]]
        yf = y.astype(f32)
        if mode[b] == CORRIDOR_FULL:
            offs = np.full_like(y, ci[b])
        elif mode[b] == CORRIDOR_LINEAR:
            offs = y - ci[b]
        elif mode[b] == CORRIDOR_ENDPOINTS:
            offs = np.trunc((yf - f32(d[b])) / f32(k[b])).astype(np.int32)
        else:
            offs = np.trunc(yf / f32(k[b]) - f32(d[b])).astype(np.int32)
        lo = np.clip(offs, 0, W[b])
        hi = np.maximum(np.clip(offs + width[b], 0, W[b]), lo)
        key_lo = y + lo
        key_hi = y + hi
        t = np.arange(Tp, dtype=np.int32)[:, None]
        ymin[b] = (key_hi[None, :] <= t).sum(axis=1)
        ymax[b] = (key_lo[None, :] <= t).sum(axis=1) - 1
    return ymin, ymax


def test_cw_matches_hist():
    rng = np.random.default_rng(11)
    B = 128
    Tp = 1024
    mode = rng.integers(0, 4, B).astype(np.int32)
    W = rng.integers(1, 400, B).astype(np.int32)
    H = rng.integers(0, 400, B).astype(np.int32)     # includes empty rows
    width = rng.integers(1, 300, B).astype(np.int32)
    # width <= 0 rows (empty windows — the hi = max(clip, lo) clamp)
    width[64:80] = 0
    width[80:88] = -rng.integers(1, 50, 8).astype(np.int32)
    ci = rng.integers(-50, 200, B).astype(np.int32)
    k = rng.uniform(0.05, 3.0, B).astype(np.float32)
    d = rng.uniform(-100.0, 100.0, B).astype(np.float32)
    # a few exact bench-like rows
    mode[:2] = (CORRIDOR_ANCHORS, CORRIDOR_ENDPOINTS)
    W[:2], H[:2], width[:2] = (380, 380), (350, 350), (190, 95)
    k[:2] = (f32(350) / f32(380), f32(350) / f32(380))
    d[:2] = (95.0, -10.0)

    scal = np.zeros((8, B), np.int32)
    scal[0], scal[1], scal[2], scal[3], scal[4] = mode, ci, width, W, H
    scal[5] = k.view(np.int32)
    scal[6] = d.view(np.int32)
    ymin_T, ymax_T = corridor_windows(jnp.asarray(scal), Tp, K=128, GU=8,
                                      interpret=True)
    got_min = np.asarray(ymin_T).T
    got_max = np.asarray(ymax_T).T
    exp_min, exp_max = hist_windows(mode, ci, width, W, H, k, d, Tp)
    np.testing.assert_array_equal(got_min, exp_min)
    np.testing.assert_array_equal(got_max, exp_max)
