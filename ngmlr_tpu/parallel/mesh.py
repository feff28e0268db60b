"""Multi-device scale-out: data parallelism over reads.

TPU-native replacement for the reference's pthread worker pool
(NGM.cpp:334-348; see SURVEY §2.11 for the full mapping):

  * reads are sharded across a 1-D `jax.sharding.Mesh` ("reads" axis),
  * the compute-heavy kernels (candidate scoring, wavefront DP) run under
    batch shardings so each chip processes its slab,
  * global counters ride the mesh as psums; SAM records are emitted
    per-host and merged deterministically by read id (the host owns IO,
    exactly like the reference's mutex-guarded writer — but ordered).

On a single host this shards over local devices; multi-host runs use
jax.distributed with per-host read shards (each host maps its slice of the
input file — reads are embarrassingly parallel).
"""

from typing import List, Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), axis_names=("reads",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("reads"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_devices(n: int, n_devices: int) -> int:
    return ((n + n_devices - 1) // n_devices) * n_devices


def shard_read_ids(n_reads: int, host_id: int, n_hosts: int) -> range:
    """Static per-host input shard (round-robin blocks by intake order)."""
    per = (n_reads + n_hosts - 1) // n_hosts
    return range(host_id * per, min(n_reads, (host_id + 1) * per))


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host runtime init — the reference's single-binary pthread pool
    (NGM.cpp:334-348) generalized across hosts: one ngmlr-tpu process per
    host, jax.distributed for device/mesh bootstrap, reads data-parallel
    across processes (each maps every Nth read; outputs merge
    deterministically with scripts/merge_sams.py).

    Coordination comes from explicit args or the environment:
    NGMLR_TPU_COORDINATOR=host:port, NGMLR_TPU_NUM_PROCS,
    NGMLR_TPU_PROC_ID — or any cluster env jax.distributed auto-detects
    (GKE/TPU-VM metadata). No coordinator configured => single-process
    no-op, returns (0, 1).

    Returns (process_index, process_count)."""
    import os
    coordinator = coordinator or os.environ.get("NGMLR_TPU_COORDINATOR")
    if coordinator is None:
        return 0, 1
    if num_processes is None and os.environ.get("NGMLR_TPU_NUM_PROCS"):
        num_processes = int(os.environ["NGMLR_TPU_NUM_PROCS"])
    if process_id is None and os.environ.get("NGMLR_TPU_PROC_ID"):
        process_id = int(os.environ["NGMLR_TPU_PROC_ID"])
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index(), jax.process_count()
