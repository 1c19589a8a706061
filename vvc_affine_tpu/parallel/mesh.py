"""Multi-chip scaling: CTU-axis data parallelism over a device mesh.

The reference is strictly single-device (five in-order OpenCL queues,
main.cpp:229-242); its only scaling axis is the per-launch work-group count
(one WG per (CTU, size), main.cpp:757,890).  The TPU engine scales the same
axis — CTUs — across chips instead:

  * every stage tensor leads with the CTU dimension and is sharded over a 1-D
    ``jax.sharding.Mesh`` axis 'ctu';
  * reference/original planes are small (4 MB at 1080p) and replicated, so
    per-shard reference tiles / clamped window gathers never cross shards and
    XLA inserts **no** collectives in the iteration loop — linear scaling by
    construction;
  * the CTU axis is padded with deterministic out-of-frame CTUs to a multiple
    of the mesh size; the pads are sliced off after the run.

Both engines shard this way: ``build_plane_stage_sharded`` (the shipping
dense/Pallas engine — frame-global prep runs replicated, then the whole
iteration loop runs under ``jax.shard_map`` on per-shard CTU tiles) and
``build_stage_sharded`` (the gather engine, plain GSPMD constraints).

Multi-host: the same mesh spans hosts (jax.distributed), frames are
replicated per host over DCN once per GOP, and decision-log readback is a
process-0 gather of the sharded result arrays (runtime.distributed).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vvc_affine_tpu import geometry as G
from vvc_affine_tpu.models import affine_me, affine_plane


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

    def _pad_prev(prev):
        if prev.shape[0] < n_pad:
            pad = n_pad - prev.shape[0]
            prev = jnp.pad(prev, ((0, pad), (0, 0), (0, 0), (0, 0)))
        return prev

    _exe = {}

    def precompile(ref_flat, orig_flat, lam, prev_cpmvs):
        """AOT-compile and pin the executable (multi-process lockstep:
        see pipeline._callable — first DISPATCH must not happen under
        cross-process compile skew, and jit fuses compile into it)."""
        _exe["x"] = run_padded.lower(
            ref_flat, orig_flat, lam, _pad_prev(prev_cpmvs)).compile()

    def _inner(*a):
        return _exe["x"](*a) if "x" in _exe else run_padded(*a)

    def run(ref_flat, orig_flat, lam, prev_cpmvs):
        cost, cp = _inner(ref_flat, orig_flat, lam, _pad_prev(prev_cpmvs))
        return cost[:n_ctus], cp[:n_ctus]

    run.precompile = precompile
    return run


def _padded_dyn_tables(spec: affine_plane.PlaneSpec, t, n_pad: int):
    """DynTables (numpy) padded to ``n_pad`` CTUs.

    Padding CTUs sit at (frame_w, frame_h): every padded CU fails the
    in-frame test and takes the deterministic zero-motion/zero-system path
    (same convention as affine_me.build_tables(n_ctu_pad)).
    """
    lay = G.layout(spec.mode)
    pad = n_pad - t.n_ctus
    ctu_x = np.concatenate(
        [t.ctu_x, np.full(pad, spec.frame_w, np.int32)])
    ctu_y = np.concatenate(
        [t.ctu_y, np.full(pad, spec.frame_h, np.int32)])
    abs_x = ctu_x[:, None] + lay.cu_x[None, :].astype(np.int32)
    abs_y = ctu_y[:, None] + lay.cu_y[None, :].astype(np.int32)
    within = (abs_x + lay.cu_w[None, :] <= spec.frame_w) & (
        abs_y + lay.cu_h[None, :] <= spec.frame_h)
    return affine_plane.DynTables(
        abs_x=jnp.asarray(abs_x.astype(np.int32)),
        abs_y=jnp.asarray(abs_y.astype(np.int32)),
        within=jnp.asarray(within),
        ctu_x=jnp.asarray(ctu_x), ctu_y=jnp.asarray(ctu_y),
        slab_act=jnp.asarray(affine_plane.slab_activity(spec.mode, within)))


def build_plane_pair_sharded(spec2: affine_plane.PlaneSpec,
                             spec3: affine_plane.PlaneSpec, mesh: Mesh,
                             telemetry: bool = False):
    """CTU-sharded fused 2CP->3CP chain (affine_plane.build_pair_stage):
    one executable per (mode, resolution), prep replicated, both stage
    cores under one shard_map, the CPMV handoff staying shard-local.

    fn(ref_flat, orig_flat, lam, prev2[nCtu,...]) ->
      (cost2, cpmvs2, cost3, cpmvs3[, telem2, telem3]) unpadded."""
    assert spec2.mode == spec3.mode and spec2.n_cp == 2 and spec3.n_cp == 3
    n_dev = mesh.devices.size
    t = affine_plane.build_tables(spec2)
    n_ctus = t.n_ctus
    n_pad = _pad_to(n_ctus, n_dev)
    pad = n_pad - n_ctus
    dyn_padded = _padded_dyn_tables(spec2, t, n_pad)

    ctu = P("ctu")
    repl = P()

    def _psum_telem(telem):
        return affine_plane.EvalTelemetry(
            jax.lax.psum(telem.n_escapes, "ctu"),
            jax.lax.pmax(telem.max_groups, "ctu"),
            jax.lax.psum(telem.n_fallbacks, "ctu"),
            jax.lax.psum(telem.rung_hist, "ctu"))

    def local_fn(dyn_l, tiles_l, orig_pl_l, ref_pl_l, prev_l, ref_flat, lam):
        c2, p2, tm2 = affine_plane._stage_core(
            spec2, t, dyn_l, ref_flat, tiles_l, orig_pl_l, ref_pl_l, lam,
            prev_l)
        c3, p3, tm3 = affine_plane._stage_core(
            spec3, t, dyn_l, ref_flat, tiles_l, orig_pl_l, ref_pl_l, lam, p2)
        return c2, p2, c3, p3, _psum_telem(tm2), _psum_telem(tm3)

    # check_vma off: same replicated-constant-to-varying scan carries as
    # build_plane_stage_sharded
    sharded = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(ctu, ctu, ctu, ctu, ctu, repl, repl),
        out_specs=(ctu, ctu, ctu, ctu, repl, repl),
        check_vma=False,
    )

    @jax.jit
    def run_padded(ref_flat, orig_flat, lam, prev_padded):
        tiles, orig_pl, ref_pl = affine_plane.prep_inputs(
            spec2, t, ref_flat, orig_flat)
        if pad:
            tiles = jnp.pad(tiles, ((0, pad), (0, 0), (0, 0)))
            orig_pl = jnp.pad(orig_pl, ((0, pad), (0, 0), (0, 0)))
            ref_pl = jnp.pad(ref_pl, ((0, pad), (0, 0), (0, 0)))
        return sharded(dyn_padded, tiles, orig_pl, ref_pl, prev_padded,
                       ref_flat, lam)

    def _pad_prev(prev):
        if prev.shape[0] < n_pad:
            p_ = n_pad - prev.shape[0]
            prev = jnp.pad(prev, ((0, p_), (0, 0), (0, 0), (0, 0)))
        return prev

    _exe = {}

    def precompile(ref_flat, orig_flat, lam, prev2):
        """AOT-compile and pin the executable (multi-process lockstep:
        see pipeline._callable)."""
        _exe["x"] = run_padded.lower(
            ref_flat, orig_flat, lam, _pad_prev(prev2)).compile()

    def _inner(*a):
        return _exe["x"](*a) if "x" in _exe else run_padded(*a)

    def run(ref_flat, orig_flat, lam, prev2):
        c2, p2, c3, p3, tm2, tm3 = _inner(ref_flat, orig_flat, lam,
                                          _pad_prev(prev2))
        outs = (c2[:n_ctus], p2[:n_ctus], c3[:n_ctus], p3[:n_ctus])
        if telemetry:
            return outs + (tm2, tm3)
        return outs

    run.precompile = precompile
    return run


def build_plane_stage_sharded(spec: affine_plane.PlaneSpec, mesh: Mesh,
                              telemetry: bool = False):
    """Compile a dense-engine (plane/Pallas) stage sharded over ``mesh``.

    Same contract as affine_plane.build_stage: fn(ref_flat, orig_flat, lam,
    prev_cpmvs[nCtu,...]) -> (cost, cpmvs) in true (unpadded) CTU counts,
    bit-identical to the single-device stage.  Frame-global prep (refpad ->
    per-CTU tiles, orig block planes) runs replicated; the whole iteration
    loop runs under shard_map with each device owning a contiguous block of
    the flat CTU axis — no collectives anywhere in the loop.
    """
    n_dev = mesh.devices.size
    t = affine_plane.build_tables(spec)
    n_ctus = t.n_ctus
    n_pad = _pad_to(n_ctus, n_dev)
    pad = n_pad - n_ctus
    dyn_padded = _padded_dyn_tables(spec, t, n_pad)

    ctu = P("ctu")
    repl = P()

    def local_fn(dyn_l, tiles_l, orig_pl_l, ref_pl_l, prev_l, ref_flat, lam):
        cost, cp, telem = affine_plane._stage_core(
            spec, t, dyn_l, ref_flat, tiles_l, orig_pl_l, ref_pl_l, lam,
            prev_l)
        telem = affine_plane.EvalTelemetry(
            jax.lax.psum(telem.n_escapes, "ctu"),
            jax.lax.pmax(telem.max_groups, "ctu"),
            jax.lax.psum(telem.n_fallbacks, "ctu"),
            jax.lax.psum(telem.rung_hist, "ctu"))
        return cost, cp, telem

    # check_vma off: the scan carry inits (best_cost full, telem zeros) are
    # replicated-typed constants that become CTU-varying through the body;
    # that is the intended dataflow, not a replication bug.
    sharded = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(ctu, ctu, ctu, ctu, ctu, repl, repl),
        out_specs=(ctu, ctu, repl),
        check_vma=False,
    )

    @jax.jit
    def run_padded(ref_flat, orig_flat, lam, prev_padded):
        tiles, orig_pl, ref_pl = affine_plane.prep_inputs(
            spec, t, ref_flat, orig_flat)
        if pad:
            tiles = jnp.pad(tiles, ((0, pad), (0, 0), (0, 0)))
            orig_pl = jnp.pad(orig_pl, ((0, pad), (0, 0), (0, 0)))
            ref_pl = jnp.pad(ref_pl, ((0, pad), (0, 0), (0, 0)))
        return sharded(dyn_padded, tiles, orig_pl, ref_pl, prev_padded,
                       ref_flat, lam)

    def _pad_prev(prev):
        if prev.shape[0] < n_pad:
            p_ = n_pad - prev.shape[0]
            prev = jnp.pad(prev, ((0, p_), (0, 0), (0, 0), (0, 0)))
        return prev

    _exe = {}

    def precompile(ref_flat, orig_flat, lam, prev_cpmvs):
        """AOT-compile and pin the executable (multi-process lockstep:
        see pipeline._callable)."""
        _exe["x"] = run_padded.lower(
            ref_flat, orig_flat, lam, _pad_prev(prev_cpmvs)).compile()

    def _inner(*a):
        return _exe["x"](*a) if "x" in _exe else run_padded(*a)

    def run(ref_flat, orig_flat, lam, prev_cpmvs):
        cost, cp, telem = _inner(ref_flat, orig_flat, lam,
                                 _pad_prev(prev_cpmvs))
        if telemetry:
            return cost[:n_ctus], cp[:n_ctus], telem
        return cost[:n_ctus], cp[:n_ctus]

    run.precompile = precompile
    return run
