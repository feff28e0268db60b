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
