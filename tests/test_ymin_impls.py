"""NGMLR_TPU_YMIN_IMPL=sort must be bit-equal to the default histogram
formulation through the full convex kernel (subprocess-isolated: the
switch is read at trace time)."""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

SNIPPET = """
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
sys.path.insert(0, %r)
from ngmlr_tpu.ops import device_engine as de

rng = np.random.default_rng(4)
G = 30_000
genome = jnp.asarray(rng.integers(0, 5, size=G).astype(np.uint8))
readbuf = jnp.asarray(rng.integers(0, 5, size=1 << 13).astype(np.uint8))
params = jnp.asarray([2.0, -5.0, -5.0, -5.0, -1.0, 0.15], np.float32)
B, Wp, Hp, L = 8, 512, 512, 128
pk = np.zeros((B, 12), np.int32)
pku = pk.view(np.uint32); pkf = pk.view(np.float32)
for b in range(B):
    W = int(rng.integers(200, 500)); H = int(rng.integers(100, 500))
    ds = int(rng.integers(0, G - W - 1)); qs = int(rng.integers(0, (1<<13) - H - 1))
    mode = int(rng.integers(0, 4)); width = int(rng.integers(24, 120))
    if mode == 0:
        w = W + 1; ci = int(np.float32(w) * np.float32(-0.2))
        width = min(w + int(np.float32(w) * np.float32(0.2)), 500); cf = (1.0, 0.0)
    elif mode == 1: ci, cf = width // 2, (1.0, 0.0)
    else: ci, cf = 0, (float(np.float32(H)/np.float32(W)),
                       float(np.float32(width)/np.float32(2.0)))
    pku[b,0], pku[b,1] = ds, ds+W
    pk[b,2:10] = (0, W, qs, H, b & 1, mode, ci, width)
    pkf[b,10:12] = cf
o = jax.device_get(de._convex_kernel(genome, readbuf, jnp.asarray(pk),
                                     params, Wp=Wp, Hp=Hp, L=L, impl="scan"))
np.save(sys.argv[1], o[0]); np.save(sys.argv[2], o[1])
"""


def _run(impl, tmp_path, tag):
    import numpy as np
    env = dict(os.environ, JAX_PLATFORMS="cpu", NGMLR_TPU_YMIN_IMPL=impl)
    env.pop("XLA_FLAGS", None)
    a = str(tmp_path / f"{tag}_ops.npy")
    b = str(tmp_path / f"{tag}_sc.npy")
    r = subprocess.run([sys.executable, "-c", SNIPPET % ROOT, a, b],
                       capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-1500:]
    return np.load(a), np.load(b)


def test_sort_impl_matches_hist(tmp_path):
    import numpy as np
    ops_h, sc_h = _run("hist", tmp_path, "h")
    ops_s, sc_s = _run("sort", tmp_path, "s")
    assert np.array_equal(ops_h, ops_s)
    assert np.array_equal(sc_h, sc_s)
