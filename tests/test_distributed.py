"""Multi-host bootstrap tests (SURVEY 4(d)): the jax.distributed init
path with a real (single-process) coordinator, isolated in a subprocess
so the distributed service can't leak into other tests."""

import os
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def test_init_distributed_noop_without_coordinator():
    from ngmlr_tpu.parallel.mesh import init_distributed
    env_backup = os.environ.pop("NGMLR_TPU_COORDINATOR", None)
    try:
        assert init_distributed() == (0, 1)
    finally:
        if env_backup is not None:
            os.environ["NGMLR_TPU_COORDINATOR"] = env_backup


def test_init_distributed_single_process_coordinator():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    code = f"""
import os
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, {ROOT!r})
from ngmlr_tpu.parallel.mesh import init_distributed
pid, n = init_distributed("127.0.0.1:{port}", num_processes=1, process_id=0)
assert (pid, n) == (0, 1), (pid, n)
assert jax.process_count() == 1
import jax.numpy as jnp
assert float(jnp.sum(jnp.ones(8))) == 8.0
print("DIST_OK")
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "DIST_OK" in r.stdout


def test_env_driven_shard_assignment():
    """The CLI's auto-shard mapping: process i of n maps every n-th read
    (merge_sams reconstructs reference order) — here just the env
    plumbing contract of init_distributed."""
    from ngmlr_tpu.parallel.mesh import shard_read_ids
    ids = [list(shard_read_ids(10, h, 3)) for h in range(3)]
    flat = sorted(x for part in ids for x in part if x < 10)
    assert flat == list(range(10))
