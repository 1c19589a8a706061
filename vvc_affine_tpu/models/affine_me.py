"""The Affine-ME engine: one jitted stage per (alignment mode, nCP).

A stage evaluates, for every CU of every size class in every CTU of a frame,
`numGradientIter+1` rounds of: affine MC prediction of all 4x4 sub-blocks ->
SATD -> RD cost -> best-CPMV update, interleaved with gradient/optical-flow
CPMV refinement (Sobel -> normal equations -> VTM LS solve -> delta CPMVs).
Behavioural spec: the affine_gradient_mult_sizes(_HA) kernels
(affine.cl:11-958, 960-1950) and their dispatch contract (main.cpp:746-1010).

TPU-native structure (not a port):
  * CU geometry is static; CUs of equal size across all classes are merged
    into compute groups (geometry.ComputeClass) so the jitted graph loops
    over 12 (aligned) / 8 (half-aligned) static-shape groups.
  * State lives as dense arrays [nCtu, nCU, ...] in merged-group order; the
    CTU axis is the data-parallel/sharding axis.
  * The per-iteration loop is a lax.scan over `numGradientIter` rounds of
    (evaluate + refine) followed by one final evaluate.
  * Out-of-frame CUs (partial bottom CTU rows) contribute zero SATD and a
    zeroed equation system, reproducing the reference's "no passes +
    zero-delta solve" path deterministically (affine.cl:192-208; the
    reference reads uninitialised memory there, which host reporting treats
    as zero-motion results).

PROF is computed-but-disabled in the reference (enablePROF=0, affine.cl:168);
it is therefore omitted from the prediction path here (bit-identical output).
A standalone PROF implementation lives in ops/prof.py for API completeness.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vvc_affine_tpu import constants as C
from vvc_affine_tpu import geometry as G
from vvc_affine_tpu.ops import cost as cost_ops
from vvc_affine_tpu.ops import equations as eq_ops
from vvc_affine_tpu.ops import gradient as grad_ops
from vvc_affine_tpu.ops import interp as interp_ops
from vvc_affine_tpu.ops import mv as mv_ops
from vvc_affine_tpu.ops import satd as satd_ops
from vvc_affine_tpu.ops import solver as solver_ops
from vvc_affine_tpu.utils.bitmath import clamp


@dataclass(frozen=True)
class StageSpec:
    mode: str          # 'full' (aligned CUs) | 'half' (half-aligned CUs)
    n_cp: int          # 2 or 3 control points
    frame_w: int
    frame_h: int
    extra_iters: int = 0

    @property
    def num_gradient_iters(self) -> int:
        # affine.cl:172-177
        return (5 if self.n_cp == 2 else 4) + self.extra_iters


class GroupTables(NamedTuple):
    """Static tables for one compute group (all CUs of one (w, h))."""

    offset: int          # column offset of this group in merged order
    n_cus: int
    w: int
    h: int
    log2w: int
    log2h: int
    sub_x: np.ndarray    # int32 [S] sub-block corners, CU-relative raster
    sub_y: np.ndarray
    factors: eq_ops.SubblockFactors


class StageTables(NamedTuple):
    n_ctus: int
    n_cus: int                     # CUs per CTU (201 / 284)
    groups: Tuple[GroupTables, ...]
    merged_order: np.ndarray       # canonical idx of each merged column
    to_canonical: np.ndarray       # merged idx of each canonical column
    cu_w: np.ndarray               # int32 [nCU] (merged order)
    cu_h: np.ndarray
    abs_x: np.ndarray              # int32 [nCtu, nCU] absolute CU corners
    abs_y: np.ndarray
    within: np.ndarray             # bool  [nCtu, nCU]


def build_tables(spec: StageSpec, n_ctu_pad: int = 0) -> StageTables:
    """Static tables; optionally pad the CTU axis to ``n_ctu_pad`` entries.

    Padding CTUs sit at (frame_w, frame_h), so every padded CU fails the
    in-frame test and takes the deterministic zero-SATD/zero-system path —
    the sharding layer uses this to make nCtu divisible by the mesh.
    """
    lay = G.layout(spec.mode)
    grid = G.frame_grid(spec.frame_w, spec.frame_h)
    ctu_x, ctu_y = grid.ctu_origin()
    if n_ctu_pad > grid.num_ctus:
        extra = n_ctu_pad - grid.num_ctus
        ctu_x = np.concatenate([ctu_x, np.full(extra, spec.frame_w, np.int32)])
        ctu_y = np.concatenate([ctu_y, np.full(extra, spec.frame_h, np.int32)])

    groups: List[GroupTables] = []
    merged_order: List[int] = []
    off = 0
    for g in lay.compute_classes:
        sw, sh = g.sb_cols, g.sb_rows
        sub_x = np.tile(np.arange(sw, dtype=np.int32) * 4, sh)
        sub_y = np.repeat(np.arange(sh, dtype=np.int32) * 4, sw)
        groups.append(
            GroupTables(
                offset=off,
                n_cus=g.num_cus,
                w=g.width,
                h=g.height,
                log2w=int(np.log2(g.width)),
                log2h=int(np.log2(g.height)),
                sub_x=sub_x,
                sub_y=sub_y,
                factors=eq_ops.subblock_factors(sh, sw, spec.n_cp),
            )
        )
        merged_order.extend(g.cu_flat_idx)
        off += g.num_cus
    merged_order_arr = np.asarray(merged_order, np.int32)
    to_canonical = np.empty_like(merged_order_arr)
    to_canonical[merged_order_arr] = np.arange(len(merged_order_arr), dtype=np.int32)

    cu_w = lay.cu_w[merged_order_arr]
    cu_h = lay.cu_h[merged_order_arr]
    cu_x = lay.cu_x[merged_order_arr]
    cu_y = lay.cu_y[merged_order_arr]
    abs_x = ctu_x[:, None] + cu_x[None, :]
    abs_y = ctu_y[:, None] + cu_y[None, :]
    within = (abs_x + cu_w[None, :] <= spec.frame_w) & (
        abs_y + cu_h[None, :] <= spec.frame_h
    )
    return StageTables(
        n_ctus=max(grid.num_ctus, n_ctu_pad),
        n_cus=lay.cus_per_ctu,
        groups=tuple(groups),
        merged_order=merged_order_arr,
        to_canonical=to_canonical,
        cu_w=cu_w.astype(np.int32),
        cu_h=cu_h.astype(np.int32),
        abs_x=abs_x.astype(np.int32),
        abs_y=abs_y.astype(np.int32),
        within=within,
    )


def _init_cpmvs(spec: StageSpec, t: StageTables, prev_canonical, abs_x, abs_y):
    """Initial CPMVs in merged order.

    2CP: zeros (affine.cl:53-59).  3CP: LT/RT inherited from the 2CP best,
    LB derived by the rotation model (affine.cl:62-106).
    """
    shape = (t.n_ctus, t.n_cus, 3, 2)
    if spec.n_cp == 2:
        return jnp.zeros(shape, jnp.int32)
    prev = prev_canonical[:, jnp.asarray(t.merged_order)]
    parts = []
    for g in t.groups:
        sl = slice(g.offset, g.offset + g.n_cus)
        cp = prev[:, sl]
        lb = mv_ops.derive_lb_from_2cp(
            cp, g.log2w, g.log2h, abs_x[:, sl], abs_y[:, sl],
            spec.frame_w, spec.frame_h,
        )
        parts.append(jnp.concatenate([cp[..., 0:2, :], lb[..., None, :]], axis=-2))
    return jnp.concatenate(parts, axis=1)


def _evaluate(spec: StageSpec, t: StageTables, ref_flat, orig_flat, cpmvs,
              abs_x, abs_y, within, refine: bool):
    """One prediction pass over every CU; optionally build the LS systems.

    Returns (satd [nCtu,nCU] int64, M [nCtu,nCU,P,P] | None, rhs | None).
    """
    fw, fh = spec.frame_w, spec.frame_h
    satds, Ms, rhss = [], [], []
    for g in t.groups:
        sl = slice(g.offset, g.offset + g.n_cus)
        cp = cpmvs[:, sl]
        sub_x = jnp.asarray(g.sub_x)
        sub_y = jnp.asarray(g.sub_y)
        mvx, mvy, _ = mv_ops.derive_sub_mvs(
            cp, g.log2w, g.log2h, spec.n_cp, sub_x, sub_y
        )
        gx_cu = abs_x[:, sl]
        gy_cu = abs_y[:, sl]
        mvx, mvy = mv_ops.round_and_clip_mv(
            mvx, mvy, gx_cu[..., None], gy_cu[..., None], fw, fh
        )
        bx = gx_cu[..., None] + sub_x
        by = gy_cu[..., None] + sub_y
        pred = interp_ops.predict_subblocks(ref_flat, fw, fh, bx, by, mvx, mvy)
        orig = interp_ops.gather_blocks(orig_flat, fw, fh, bx, by)
        sb_satd = satd_ops.satd_4x4(orig, pred)  # [nCtu, nCuG, S]
        w_g = within[:, sl]
        satd = jnp.where(w_g, sb_satd.astype(jnp.int64).sum(axis=-1), 0)
        satds.append(satd)
        if refine:
            sh, sw = g.h // 4, g.w // 4

            def planes(blocks):
                x = blocks.reshape(blocks.shape[:2] + (sh, sw, 4, 4))
                x = x.transpose(0, 1, 2, 4, 3, 5)
                return x.reshape(x.shape[:2] + (g.h, g.w))

            pred_pl = planes(pred)
            err_pl = planes(orig) - pred_pl
            gx, gy = grad_ops.sobel_cu(pred_pl)
            mom = eq_ops.gradient_moments(gx, gy, err_pl)
            M, rhs = eq_ops.assemble_system(*mom, g.factors)
            M = jnp.where(w_g[..., None, None], M, 0)
            rhs = jnp.where(w_g[..., None], rhs, 0)
            Ms.append(M)
            rhss.append(rhs)
    satd_all = jnp.concatenate(satds, axis=1)
    if refine:
        return satd_all, jnp.concatenate(Ms, axis=1), jnp.concatenate(rhss, axis=1)
    return satd_all, None, None


def _cost(spec: StageSpec, cpmvs, satd, lam):
    bits = cost_ops.affine_bits_zero_pred(cpmvs, spec.n_cp)
    return cost_ops.rd_cost(satd, bits, lam)


def _refine_cpmvs(spec, t, cpmvs, M, rhs, cu_w, cu_h, abs_x, abs_y):
    params = solver_ops.solve_affine(M, rhs, spec.n_cp)
    deltas = solver_ops.scale_delta_mvs(params, spec.n_cp, cu_w, cu_h)
    new = cpmvs + deltas
    new = clamp(new, C.MV_MIN, C.MV_MAX)  # clampCpmvs (affine.cl:891)
    nx, ny = mv_ops.clip_mv(  # clipCpmvs (affine.cl:893)
        new[..., 0], new[..., 1], abs_x[..., None], abs_y[..., None],
        spec.frame_w, spec.frame_h,
    )
    return jnp.stack([nx, ny], axis=-1)


def _stage_run(spec: StageSpec, t: StageTables, ref_flat, orig_flat, lam,
               prev_canonical):
    abs_x = jnp.asarray(t.abs_x)
    abs_y = jnp.asarray(t.abs_y)
    within = jnp.asarray(t.within)
    cu_w = jnp.asarray(t.cu_w)
    cu_h = jnp.asarray(t.cu_h)

    curr = _init_cpmvs(spec, t, prev_canonical, abs_x, abs_y)
    best_cost = jnp.full((t.n_ctus, t.n_cus), C.MAX_LONG, jnp.int64)
    best_cp = jnp.zeros_like(curr)

    def update_best(curr, cost, best_cost, best_cp):
        better = cost < best_cost
        return (
            jnp.where(better, cost, best_cost),
            jnp.where(better[..., None, None], curr, best_cp),
        )

    def body(carry, _):
        curr, best_cost, best_cp = carry
        satd, M, rhs = _evaluate(
            spec, t, ref_flat, orig_flat, curr, abs_x, abs_y, within, True
        )
        cost = _cost(spec, curr, satd, lam)
        best_cost, best_cp = update_best(curr, cost, best_cost, best_cp)
        curr = _refine_cpmvs(spec, t, curr, M, rhs, cu_w, cu_h, abs_x, abs_y)
        return (curr, best_cost, best_cp), None

    (curr, best_cost, best_cp), _ = jax.lax.scan(
        body, (curr, best_cost, best_cp), None, length=spec.num_gradient_iters
    )
    # final evaluation of the last refined CPMVs (no refinement after)
    satd, _, _ = _evaluate(
        spec, t, ref_flat, orig_flat, curr, abs_x, abs_y, within, False
    )
    cost = _cost(spec, curr, satd, lam)
    best_cost, best_cp = update_best(curr, cost, best_cost, best_cp)

    # merged order -> canonical class order (the output contract)
    perm = jnp.asarray(t.to_canonical)
    return best_cost[:, perm], best_cp[:, perm]


@functools.lru_cache(maxsize=None)
def build_stage(spec: StageSpec):
    """Compile a stage.

    Returns fn(ref_flat_i32, orig_flat_i32, lam_f32, prev_cpmvs) ->
    (best_cost int64 [nCtu, nCU], best_cpmvs int32 [nCtu, nCU, 3, 2]),
    both in canonical class order.  For 2CP stages `prev_cpmvs` is ignored
    (pass zeros of the same shape).
    """
    tables = build_tables(spec)

    @jax.jit
    def run(ref_flat, orig_flat, lam, prev_cpmvs):
        return _stage_run(spec, tables, ref_flat, orig_flat, lam, prev_cpmvs)

    return run


def zero_cpmvs(spec: StageSpec) -> jnp.ndarray:
    t = G.layout(spec.mode)
    n = G.frame_grid(spec.frame_w, spec.frame_h).num_ctus
    return jnp.zeros((n, t.cus_per_ctu, 3, 2), jnp.int32)
