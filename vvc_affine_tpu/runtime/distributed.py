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

import sys
from typing import Optional, Sequence

import numpy as np


def initialize(coordinator: str, num_processes: int, process_id: int,
               local_device_ids: Optional[Sequence[int]] = None) -> None:
    """Join the jax.distributed cluster (idempotent per process).

    The coordination service's shutdown barrier defaults to 300 s; process
    skew at exit can exceed that when processes compile their programs
    independently (each stage compiles minutes of XLA), so the barrier is
    widened to 30 min.  finalize() additionally syncs all processes BEFORE
    the barrier, so the widened timeout is a backstop, not the mechanism.
    """
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
        initialization_timeout=600,
        shutdown_timeout_seconds=1800,
    )


_ALIGN_SEQ = [0]


def _align(tag: str, timeout_s: int = 600) -> None:
    """Coordination-service barrier (pure gRPC, no device collective).

    XLA:CPU's Gloo backend creates its communicator contexts lazily at the
    first dispatch of each collective clique with a hard-coded ~30 s
    rendezvous window; cross-process COMPILE skew (each process compiles
    its stage executables independently, minutes apiece) easily exceeds
    that and kills the cluster with "Gloo context initialization failed:
    DEADLINE_EXCEEDED".  Aligning processes through the coordination
    service (whose barriers take an explicit long timeout) immediately
    before every cross-process collective keeps the Gloo rendezvous window
    at ~0 skew.  Cost when already aligned: one gRPC round-trip (~ms).
    Call sequence is identical on every process by construction (the
    collectives themselves are), so the monotonically increasing barrier
    ids match up.  If one process diverges anyway (e.g. it errored between
    aligned collectives), the mismatched barrier names cannot rendezvous;
    the bounded per-barrier timeout (default 10 min — wide enough for
    cross-process compile skew, far below the 30-min shutdown backstop)
    turns that from a silent hang into a prompt error naming the barrier.
    """
    import time as _time

    from jax._src import distributed as _dist

    client = _dist.global_state.client
    if client is None:
        return
    _ALIGN_SEQ[0] += 1
    name = f"vvc-align-{tag}-{_ALIGN_SEQ[0]}"
    t0 = _time.time()
    try:
        client.wait_at_barrier(name, timeout_in_ms=timeout_s * 1000)
    except Exception as e:
        raise RuntimeError(
            f"alignment barrier {name!r} failed after "
            f"{_time.time() - t0:.0f}s — a peer process likely diverged "
            f"from the aligned call sequence (crashed or skipped a "
            f"collective)") from e
    waited = _time.time() - t0
    if waited > 60:
        print(f"[vvc.distributed] barrier {name} waited {waited:.0f}s "
              f"(cross-process skew)", file=sys.stderr, flush=True)


def align_processes(tag: str = "dispatch") -> None:
    """Public alignment point: no-op single-process, barrier otherwise.

    Call before dispatching any program that contains cross-process
    collectives (the sharded stages' telemetry psums, result gathers) so
    its first execution — which creates the Gloo communicator contexts —
    never happens under cross-process compile skew.
    """
    import jax

    if jax.process_count() > 1:
        _align(tag)


def finalize() -> None:
    """Synchronized cluster teardown (all processes must call).

    Brings every process to the same point before the coordination
    service's shutdown barrier, so the barrier never waits on
    cross-process compile/log skew.
    """
    import jax

    if jax.process_count() > 1:
        _align("exit")
    jax.distributed.shutdown()


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

    _align("bcast")
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

    _align("gather")
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
