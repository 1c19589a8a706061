"""Multi-chip scaling: CTU-axis data parallelism over a device mesh.

The reference is strictly single-device (five in-order OpenCL queues,
main.cpp:229-242); its only scaling axis is the per-launch work-group count.
The TPU engine scales the same axis — CTUs — across chips instead:

  * every stage tensor leads with the CTU dimension and is sharded over a 1-D
    ``jax.sharding.Mesh`` axis 'ctu';
  * reference/original planes are small (4 MB at 1080p) and replicated, so
    the clamped window gathers never cross shards and XLA inserts **no**
    collectives in the iteration loop — linear scaling by construction;
  * the CTU axis is padded with deterministic out-of-frame CTUs to a multiple
    of the mesh size; the pads are sliced off after the run.

Multi-host: the same mesh spans hosts (jax.distributed), frames are
replicated per host over DCN once per GOP, and decision-log readback is a
process-0 gather of the sharded result arrays.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vvc_affine_tpu.models import affine_me


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), axis_names=("ctu",))


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


def build_stage_sharded(spec: affine_me.StageSpec, mesh: Mesh):
    """Compile a stage with CTU-sharded state on ``mesh``.

    Returns fn(ref_flat, orig_flat, lam, prev_cpmvs[nCtu,...]) with the same
    contract as affine_me.build_stage; inputs/outputs use the true
    (unpadded) CTU count.
    """
    n_dev = mesh.devices.size
    n_ctus = affine_me.build_tables(spec).n_ctus
    n_pad = _pad_to(n_ctus, n_dev)
    tables = affine_me.build_tables(spec, n_ctu_pad=n_pad)

    repl = NamedSharding(mesh, P())
    ctu_sharded = NamedSharding(mesh, P("ctu"))

    @jax.jit
    def run_padded(ref_flat, orig_flat, lam, prev_padded):
        ref_flat = jax.lax.with_sharding_constraint(ref_flat, repl)
        orig_flat = jax.lax.with_sharding_constraint(orig_flat, repl)
        prev_padded = jax.lax.with_sharding_constraint(prev_padded, ctu_sharded)
        cost, cp = affine_me._stage_run(
            spec, tables, ref_flat, orig_flat, lam, prev_padded
        )
        return (
            jax.lax.with_sharding_constraint(cost, ctu_sharded),
            jax.lax.with_sharding_constraint(cp, ctu_sharded),
        )

    def run(ref_flat, orig_flat, lam, prev_cpmvs):
        if prev_cpmvs.shape[0] < n_pad:
            pad = n_pad - prev_cpmvs.shape[0]
            prev_cpmvs = jnp.pad(prev_cpmvs, ((0, pad), (0, 0), (0, 0), (0, 0)))
        cost, cp = run_padded(ref_flat, orig_flat, lam, prev_cpmvs)
        return cost[:n_ctus], cp[:n_ctus]

    return run
