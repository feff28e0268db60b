"""_lane_bound (device_engine) must upper-bound the realized max
anti-diagonal window height for every corridor mode — brute-forced here
with the host corridor materializer over random geometries. A violation
is not a correctness bug (align_finalize re-runs conservatively on the
hmax scalar) but it would silently cost a second kernel launch."""

import numpy as np
import pytest

from ngmlr_tpu.align.aligner import (Corridor, corridor_full,
                                     corridor_linear, corridor_endpoints,
                                     corridor_with_anchors,
                                     materialize_offsets)
from ngmlr_tpu.ops.device_engine import (AlignProblem, DeviceContext,
                                         QryDesc, RefDesc)


def realized_hmax(c: Corridor, W: int, H: int) -> int:
    """Host twin of the kernel's ymin/ymax window computation."""
    offs = materialize_offsets(c, H)
    lo = np.clip(offs, 0, W)
    hi = np.maximum(np.clip(offs + c.width, 0, W), lo)
    y = np.arange(H, dtype=np.int64)
    key_lo = y + lo
    key_hi = y + hi
    Tp = W + H
    t = np.arange(Tp)
    ymin = np.searchsorted(np.sort(key_hi), t, side="right")
    ymax = np.searchsorted(np.sort(key_lo), t, side="right") - 1
    return int(np.max(ymax - ymin + 1))


def bound_of(c: Corridor, W: int, H: int) -> int:
    p = AlignProblem(RefDesc(0, 0, W, W), QryDesc(0, H, False),
                     c.mode, c.cf, c.ci, c.width)
    return DeviceContext._lane_bound(p)


@pytest.mark.parametrize("seed", range(5))
def test_bound_covers_random_geometries(seed):
    rng = np.random.default_rng(seed)
    for _ in range(40):
        W = int(rng.integers(50, 4000))
        H = int(rng.integers(30, 4000))
        width = int(rng.integers(8, 1200))
        kind = rng.integers(0, 4)
        if kind == 0:
            c = corridor_full(W + 1)
        elif kind == 1:
            c = corridor_linear(width)
        elif kind == 2:
            c = corridor_endpoints(width, W, H, bool(rng.integers(0, 2)))
        else:
            class A:
                pass

            class IV:
                anchors = []
                on_ref_start = 0
            iv = IV()
            for _ in range(int(rng.integers(1, 6))):
                a = A()
                a.is_reverse = False
                a.on_ref = int(rng.integers(0, W))
                a.on_read = int(rng.integers(0, max(1, H - 256)))
                iv.anchors.append(a)
            c = corridor_with_anchors(iv, int(rng.integers(1, 4)), W, H,
                                      0, 256, H)
        got = realized_hmax(c, W, H)
        bnd = bound_of(c, W, H)
        assert got <= bnd, (c, W, H, got, bnd)
