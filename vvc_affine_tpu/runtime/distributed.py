"""Multi-host execution: jax.distributed init + process-0 result gather.

The reference is strictly single-process/single-device (main.cpp:229-242);
this layer is the TPU-native scaling story demanded by the blueprint
(SURVEY.md section 2.4 frame-level row / section 5 distributed backend):

  * every host runs the same GOP loop; frames are staged replicated (they
    are small — 4 MB at 1080p — and the CTU-sharded stages read them as
    replicated operands, so staging rides DCN once per frame);
  * the CTU axis of every stage shards over the GLOBAL mesh (all chips of
    all hosts, parallel.mesh) — scaling multi-host is the same code path as
    multi-chip, with XLA routing the (nonexistent in-loop) collectives;
  * decision-log readback gathers the sharded result arrays to every host
    (`gather_to_host`) and only process 0 writes the CSV logs — the
    analogue of the reference's single-host readback+report
    (main_aux_functions.h:335-383, 387-525).

Usage (one command per host):

    python -m vvc_affine_tpu.cli ... \
        --Coordinator host0:9876 --NumProcesses 4 --ProcessId $RANK
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def initialize(coordinator: str, num_processes: int, process_id: int,
               local_device_ids: Optional[Sequence[int]] = None) -> None:
    """Join the jax.distributed cluster (idempotent per process)."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0


def global_mesh():
    """1-D 'ctu' mesh over every chip of every host."""
    from vvc_affine_tpu.parallel import mesh as pmesh

    import jax

    return pmesh.make_mesh(jax.devices())


def replicate_to_mesh(x, mesh):
    """Host-local array -> global array replicated over ``mesh``.

    Every process must pass the same value (frames are read identically on
    each host from the shared CSV inputs).
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.device_put(x, NamedSharding(mesh, P()))


def broadcast_scalar(value: int) -> int:
    """Process 0's ``value`` on every process (collective; all must call)."""
    import jax

    if jax.process_count() == 1:
        return int(value)
    from jax.experimental import multihost_utils

    return int(multihost_utils.broadcast_one_to_all(np.int64(value)))


def gather_to_host(x) -> np.ndarray:
    """Full value of a (possibly cross-process sharded) array on this host.

    Single-process: a plain device fetch.  Multi-process: an allgather of
    the addressable shards (every host gets the full array; only process 0
    writes logs, but symmetric gather keeps the control flow identical).
    """
    import jax

    if jax.process_count() == 1:
        return np.asarray(x)
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
