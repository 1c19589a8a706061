"""Dense (gather-free) Affine-ME engine operating on per-class CTU planes.

Same stage contract as models.affine_me.build_stage — for every CU of every
canonical size class, numGradientIter+1 rounds of prediction -> SATD -> RD
cost -> best update interleaved with gradient refinement (the
affine_gradient_mult_sizes(_HA) kernels, affine.cl:11-958/960-1950) — but
restructured for TPU:

* Every class is evaluated as a full 128x128 CTU plane.  Per-block motion
  (integer displacement dy/dx) and per-block filter taps (hc/vc) are DATA
  planes, so prediction, SATD, Sobel gradients, and the normal-equation
  moments are all dense vector ops — no gathers in the hot path.
* The prediction itself runs in the `ops.warp` Pallas kernel when every
  block displacement fits |d| <= R (the overwhelmingly common case; CPMVs
  start at zero, affine.cl:53-59, and refinement steps are small), and
  falls back to the exact gather path via lax.cond otherwise — results are
  bit-identical either way.
* Per-CU quantities (SATD sums, equation systems, CPMV updates) move
  between CU arrays (canonical class order — the reference's return-array
  contract) and slot planes through static strided reshapes only
  (vvc_affine_tpu.planes).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from vvc_affine_tpu import constants as C
from vvc_affine_tpu import geometry as G
from vvc_affine_tpu import planes as P
from vvc_affine_tpu.ops import blockreduce as blockreduce_ops
from vvc_affine_tpu.ops import blockstat as blockstat_ops
from vvc_affine_tpu.ops import cost as cost_ops
from vvc_affine_tpu.ops import mv as mv_ops
from vvc_affine_tpu.ops import satd as satd_ops
from vvc_affine_tpu.ops import solver as solver_ops
from vvc_affine_tpu.ops import warp as warp_ops
from vvc_affine_tpu.utils.bitmath import clamp

NB = P.NB


@dataclass(frozen=True)
class PlaneSpec:
    mode: str          # 'full' | 'half'
    n_cp: int          # 2 | 3
    frame_w: int
    frame_h: int
    extra_iters: int = 0
    R: int = 8         # fast-path displacement bound (ops/warp)
    # per-block exact fix-up slots; escapes beyond this fall back to the
    # whole-frame exact gather (seconds).  None (default) scales with the
    # frame: max(4096, 30 * nCTUs) — a FIXED 4096 was measured to overflow
    # on affine-true 4K content (510 CTUs, 34k escapes/frame-ref), sending
    # two passes per frame to the multi-second fallback (BENCH r05 interim;
    # the same failure class as round 4's group-table cap, docs/ab_r04.md
    # section 3).  The fix-up cost is O(E) gathers only on evaluates that
    # actually have escapes.  30/CTU keeps 1080p (135 CTUs) at exactly the
    # validated 4096 while 4K gets 15,300.
    escape_budget: Optional[int] = None
    use_pallas: Optional[bool] = None   # None -> auto (TPU only)
    interpret: bool = False             # pallas interpret mode (tests)
    # per-evaluate adaptive displacement bound: dispatch to a cheaper
    # kernel (smaller select support) whenever the blocks beyond its bound
    # fit the escape fix-up budget; exactness-neutral (every rung is exact
    # for the inputs it is chosen for), so this is purely a perf knob
    adaptive: bool = True
    # explicit dispatcher ladder override (ascending, capped by R); None ->
    # the default (1, 2, 4, R).  Perf knob only — any ladder is exact.
    ladder: Optional[Tuple[int, ...]] = None
    # per-block reductions (SATD / moments) through ops.blockstat (MXU
    # matmul forms, no plane transposes) instead of the sample-major VPU
    # path; bit-exact either way (blockstat docstring) — a perf knob
    mxu_reduce: bool = False
    # int16 tap planes (halves the largest per-evaluate tensors; the warp
    # kernel widens at load).  Exactness-neutral; default ON — measured
    # +7.6% end-to-end on the TPU with rebase (docs/ab_r03.md).
    i16_taps: bool = True
    # plane-space normal-equation moments: gradient/error products stay in
    # plane space and reduce to per-block sums through strided reshape sums
    # (_block_sums) instead of the sample-major _blocks16 form.  Bit-exact
    # (same products, same sums, different iteration order of an integer
    # sum) but measured SLOWER on hardware — XLA's strided lane reduction
    # relayouts cost more than the _blocks16 transposes it avoids (full
    # stage 174 vs 155 ms, docs/ab_r04.md) — so default OFF; the shipped
    # sample-major path reuses the SATD pass's pred16 transpose for the
    # error term instead of re-transposing the plane.
    plane_moments: bool = False
    # fused SATD/Sobel/moment reduction in ONE Mosaic pass
    # (ops.blockreduce): the prediction planes never round-trip through
    # the sample-major _blocks16 relayouts that the round-4 device profile
    # put at 56% of an evaluate (docs/ab_r04.md).  Bit-exact (per-CU sums
    # of identical integer quantities); runs on the Pallas warp path (pred
    # planes arrive int16 from it).  The unfused XLA path remains the A/B
    # and the exactness oracle.  None (default) = auto by frame size:
    # the kernel scales linearly with CTU count but XLA's relayout path
    # scales SUBlinearly (its fixed latencies amortize at larger shapes),
    # so fused wins at 1080p (reduce 7.0 vs 13.0 ms, e2e 0.832 vs 0.889)
    # and loses at 4K (35.1 vs 27.8 ms, e2e 2.80 vs 2.64) — both measured
    # same-session, docs/ab_r05.md.  Crossover placed at 240 CTUs (~1440p).
    fused_reduce: Optional[bool] = None
    # float32 MAC fields inside the warp kernel: the VPU has no native
    # int32 multiply, so the select/filter fields run faster in f32.
    # Bit-exact (all intermediates are integers < 2^24; proof at
    # ops/warp._warp_kernel) — a perf knob.
    f32_warp: bool = False
    # base-relative dispatch: subtract a base displacement (the kernel
    # slides its window by the base instead of widening the select field),
    # so rung choice / escapes key on the displacement RANGE around the
    # base rather than its magnitude — coherent motion of any size rides
    # the narrowest rung, and fast-path coverage extends to the tile
    # margins (~±20 rows / ±54 lanes).  Exactness-neutral: every block
    # beyond the rebased kernel's reach still goes through the exact
    # fix-up / fallback.  Values: False/None = off; True or "slab" =
    # per-(CTU, class, 8-row slab) bases (default — fine dispatch
    # granularity: local objects and refinement scatter stay on narrow
    # rungs); "plane" = per-(CTU, class) bases (one whole-tile roll per
    # grid step, ~2x faster kernels at the hot rungs but plane-coarse
    # dispatch: measured to LOSE end-to-end on both the synthetic and the
    # realistic 1080p workloads, docs/ab_r04.md).  Round-3 measured win
    # for "slab": 1.43 -> 1.00 s per 1080p frame-ref (docs/ab_r03.md).
    rebase: object = True

    @property
    def rebase_mode(self):
        """None | 'slab' | 'plane' (normalizes the bool/str knob)."""
        if not self.rebase:
            return None
        return "slab" if self.rebase is True else self.rebase

    @property
    def num_gradient_iters(self) -> int:
        return (5 if self.n_cp == 2 else 4) + self.extra_iters

    @property
    def r_ladder(self) -> Tuple[int, ...]:
        """Ascending kernel displacement bounds tried by the dispatcher."""
        if not self.adaptive:
            return (self.R,)
        base = self.ladder if self.ladder is not None else (1, 2, 4)
        rungs = tuple(r for r in base if r < self.R)
        assert rungs == tuple(sorted(set(rungs)))
        return rungs + (self.R,)


class DynTables(NamedTuple):
    """Per-CTU tables as traced arrays (shardable over the CTU axis)."""

    abs_x: jnp.ndarray   # int32 [nCtu, nCU]
    abs_y: jnp.ndarray
    within: jnp.ndarray  # bool  [nCtu, nCU]
    ctu_x: jnp.ndarray   # int32 [nCtu]
    ctu_y: jnp.ndarray
    slab_act: jnp.ndarray  # int32 [nCtu, nBins, 16] (slab_activity)


MAX_LADDER = 8   # rung_hist slots (>= any r_ladder length)


class EvalTelemetry(NamedTuple):
    """Escape-budget counters (int32 scalars), summed over iterations.

    n_escapes counts blocks displaced beyond the WIDEST ladder kernel
    (spec.R) — the ones recomputed by the per-block gather fix-up; blocks
    between the selected rung and spec.R are handled by the vectorized
    escaped-slab second pass and are not counted here.  rung_hist[i]
    counts evaluates dispatched at ladder position i (spec.r_ladder;
    non-adaptive/fallback evaluates count nowhere) — the dispatch
    distribution a workload actually exercises.
    """

    n_escapes: jnp.ndarray       # blocks recomputed by the exact fix-up
    max_groups: jnp.ndarray      # peak escape-containing (ctu, class) groups
    n_fallbacks: jnp.ndarray     # whole-frame warp_xla fallbacks fired
    rung_hist: jnp.ndarray       # int32 [MAX_LADDER] rung-choice counts


class PlaneTables(NamedTuple):
    n_ctu_y: int
    n_ctu_x: int
    n_ctus: int
    n_cus: int
    n_cls: int
    n_bins: int
    bins: Tuple[Tuple[int, ...], ...]  # disjoint-class packing (planes.bin_layout)
    bin_of: np.ndarray                 # int32 [n_cls]
    # merged per-bin Sobel border masks
    bin_row_top: np.ndarray            # bool [n_bins, 128, 128]
    bin_row_bot: np.ndarray
    bin_col_left: np.ndarray
    bin_col_right: np.ndarray
    border_packed: np.ndarray          # int32 [n_bins, 128, 128] bit-packed
    slab_active: np.ndarray            # int32 [nCtus, n_bins, 16]
    strides: Tuple[int, ...]          # canonical per-class CU offsets
    cls: Tuple[P.ClassPlane, ...]
    # canonical per-CU tables [nCtu, nCU] / [nCU]
    abs_x: np.ndarray
    abs_y: np.ndarray
    within: np.ndarray
    cu_w: np.ndarray
    cu_h: np.ndarray
    ctu_x: np.ndarray                 # [nCtu]
    ctu_y: np.ndarray


def slab_activity(mode: str, within: np.ndarray) -> np.ndarray:
    """Per-CTU slab activity int32 [nCtu, n_bins, 16] from the in-frame mask.

    Slab k of a bin is active iff some within-frame CU of a class in the
    bin covers block row 2k or 2k+1.  Beyond the static never-valid
    half-aligned slabs, this skips the slabs of CUs cut off by the frame
    boundary (the bottom CTU row loses 40-100% of its slabs at 1080p).
    Bit-exact: inactive-slab outputs are unspecified, and every consumer
    masks at CU level; Sobel never reads garbage because no within-CU
    interior intersects an inactive slab and CU border rows are
    replication-masked (_sobel_replicated).
    """
    lay = G.layout(mode)
    cls = P.plane_layout(mode)
    bins, bin_of = P.bin_layout(mode)
    n_ctu = within.shape[0]
    act = np.zeros((n_ctu, len(bins), 16), bool)
    for ci, cp_tab in enumerate(cls):
        c = lay.classes[ci]
        s = lay.return_strides[ci]
        w_cu = within[:, s:s + cp_tab.num_cus]          # [nCtu, num_cus]
        rowcover = np.zeros((n_ctu, NB), bool)
        for j, y0 in enumerate(c.ys):
            b0y, sh = y0 // 4, c.height // 4
            rowcover[:, b0y:b0y + sh] |= w_cu[:, j:j + 1]
        act[:, int(bin_of[ci])] |= rowcover.reshape(n_ctu, 16, 2).any(-1)
    return act.astype(np.int32)


def build_tables(spec: PlaneSpec) -> PlaneTables:
    lay = G.layout(spec.mode)
    grid = G.frame_grid(spec.frame_w, spec.frame_h)
    ctu_x, ctu_y = grid.ctu_origin()
    abs_x = ctu_x[:, None] + lay.cu_x[None, :]
    abs_y = ctu_y[:, None] + lay.cu_y[None, :]
    within = (abs_x + lay.cu_w[None, :] <= spec.frame_w) & (
        abs_y + lay.cu_h[None, :] <= spec.frame_h)
    cls = P.plane_layout(spec.mode)
    bins, bin_of = P.bin_layout(spec.mode)
    n_bins = len(bins)
    # 2-D border masks: with mixed classes in one bin, another class's
    # border row/col can pass through this class's CU interior in other
    # columns/rows, so 1-D masks would misreplicate
    brt = np.zeros((n_bins, 128, 128), bool)
    brb = np.zeros((n_bins, 128, 128), bool)
    bcl = np.zeros((n_bins, 128, 128), bool)
    bcr = np.zeros((n_bins, 128, 128), bool)
    for bi, ids in enumerate(bins):
        for ci in ids:
            c = lay.classes[ci]
            for x0, y0 in zip(c.xs, c.ys):
                brt[bi, y0, x0:x0 + c.width] = True
                brb[bi, y0 + c.height - 1, x0:x0 + c.width] = True
                bcl[bi, y0:y0 + c.height, x0] = True
                bcr[bi, y0:y0 + c.height, x0 + c.width - 1] = True
    slab_active = slab_activity(spec.mode, within)
    return PlaneTables(
        n_ctu_y=grid.ctu_rows, n_ctu_x=grid.ctu_cols, n_ctus=grid.num_ctus,
        n_cus=lay.cus_per_ctu, n_cls=len(lay.classes),
        n_bins=n_bins, bins=bins, bin_of=bin_of,
        bin_row_top=brt, bin_row_bot=brb, bin_col_left=bcl, bin_col_right=bcr,
        border_packed=(brt * blockreduce_ops.TOP + brb * blockreduce_ops.BOT
                       + bcl * blockreduce_ops.LEFT
                       + bcr * blockreduce_ops.RIGHT).astype(np.int32),
        slab_active=slab_active,
        strides=lay.return_strides, cls=cls,
        abs_x=abs_x.astype(np.int32), abs_y=abs_y.astype(np.int32),
        within=within, cu_w=lay.cu_w.astype(np.int32),
        cu_h=lay.cu_h.astype(np.int32),
        ctu_x=ctu_x.astype(np.int32), ctu_y=ctu_y.astype(np.int32),
    )


def _class_slice(t: PlaneTables, ci: int):
    s = t.strides[ci]
    return slice(s, s + t.cls[ci].num_cus)


def _mv_planes(spec: PlaneSpec, t: PlaneTables, dyn: DynTables, cpmvs,
               with_valid: bool = False):
    """Per-class displacement/phase planes from canonical CPMVs.

    Returns dy, dx int32 [nCtu, nCls, NB, NB] and fx, fy likewise (plus a
    bool validity plane — within-frame CU slot coverage — when
    ``with_valid``).  Out-of-frame CUs are forced to zero motion so they
    never trigger the escape fallback (their results are masked out
    downstream, matching the reference's skipped-pass semantics,
    affine.cl:192-208).
    """
    dys, dxs, fxs, fys, vals = [], [], [], [], []
    for ci, cp_tab in enumerate(t.cls):
        sl = _class_slice(t, ci)
        cp = cpmvs[:, sl]
        log2w = int(np.log2(cp_tab.width))
        log2h = int(np.log2(cp_tab.height))
        hx, hy, vx, vy = mv_ops.affine_deltas(cp, log2w, log2h, spec.n_cp)
        spread = mv_ops.is_spread_over_limit(hx, hy, vx, vy)
        base_x = cp[..., 0, 0] << (C.MAX_CU_DEPTH - 4 + 4)
        base_y = cp[..., 0, 1] << (C.MAX_CU_DEPTH - 4 + 4)
        w_cu = dyn.within[:, sl]
        # ONE spread per class: stack all ten per-CU values on a leading
        # batch axis (spread_cu_to_slots handles batch dims), with the
        # out-of-frame zeroing applied once on the stacked array
        stacked = jnp.stack(
            [hx, hy, vx, vy, base_x, base_y,
             (spread & w_cu).astype(jnp.int32),
             dyn.abs_x[:, sl], dyn.abs_y[:, sl],
             w_cu.astype(jnp.int32)], axis=1)       # [nCtu, 10, num_cus]
        stacked = jnp.where(w_cu[:, None], stacked, jnp.int32(0))
        sp = P.spread_cu_to_slots(jnp, stacked, cp_tab)  # [nCtu, 10, NB, NB]
        hxp, hyp, vxp, vyp, bxp, byp = [sp[:, i] for i in range(6)]
        sprp = sp[:, 6].astype(bool)
        pux, puy = sp[:, 7], sp[:, 8]
        cxs = jnp.where(sprp, cp_tab.width // 2, jnp.asarray(cp_tab.slot_cx))
        cys = jnp.where(sprp, cp_tab.height // 2, jnp.asarray(cp_tab.slot_cy))
        mvx = bxp + hxp * cxs + vxp * cys
        mvy = byp + hyp * cxs + vyp * cys
        # clip bounds use the CU corner position (aux_functions.cl:90-101)
        mvx, mvy = mv_ops.round_and_clip_mv(
            mvx, mvy, pux, puy, spec.frame_w, spec.frame_h)
        wslot = sp[:, 9].astype(bool) & jnp.asarray(cp_tab.slot_valid)
        mvx = jnp.where(wslot, mvx, 0)
        mvy = jnp.where(wslot, mvy, 0)
        dys.append(mvy >> 4)
        dxs.append(mvx >> 4)
        fys.append(mvy & 15)
        fxs.append(mvx & 15)
        vals.append(wslot.astype(jnp.int32))

    def binned(xs):
        # classes in a bin have disjoint slot coverage and zeros elsewhere,
        # so the merge is a plain sum
        acc = [None] * t.n_bins
        for ci, v in enumerate(xs):
            bi = int(t.bin_of[ci])
            acc[bi] = v if acc[bi] is None else acc[bi] + v
        return jnp.stack(acc, axis=1)

    out = binned(dys), binned(dxs), binned(fxs), binned(fys)
    if with_valid:
        return out + (binned(vals).astype(bool),)
    return out


def _tap_planes(f, dtype=jnp.int32):
    """Phase plane [nCtu, nCls, NB, NB] -> taps [nCtu, nCls, 6, NB, NB].

    6-tap convention (ops/warp module docstring): the 4x4 affine filter
    bank's first and last columns are zero in every phase, so only columns
    1..6 are carried — 25% less tap-plane HBM traffic, bit-exact.  With
    dtype=int16 (coefficients are in [-11, 58]) the tap planes — the
    largest per-evaluate tensors — halve again, and every consumer promotes
    exactly (the Pallas kernel converts to int32 at load; XLA paths promote
    in the multiply).
    """
    bank = np.asarray(C.LUMA_FILTER_4x4, np.dtype(dtype))[:, 1:7]  # [16, 6]
    out = jnp.zeros(f.shape[:2] + (6,) + f.shape[2:], dtype)
    for p in range(16):
        sel = (f == p)[:, :, None]
        out = jnp.where(sel, jnp.asarray(bank[p]).reshape(1, 1, 6, 1, 1), out)
    return out


def _sobel_replicated(plane, row_top, row_bot, col_left, col_right):
    """Full-plane Sobel with per-CU border replication (affine.cl:472-540).

    plane: int32 [..., 128, 128]; masks: bool [128, 128].  Returns (gx, gy)
    int32 [..., 128, 128]; values outside the masks' CUs are unspecified.
    """
    pp = jnp.pad(plane, [(0, 0)] * (plane.ndim - 2) + [(1, 1), (1, 1)])
    gx = (
        pp[..., :-2, 2:] - pp[..., :-2, :-2]
        + 2 * pp[..., 1:-1, 2:] - 2 * pp[..., 1:-1, :-2]
        + pp[..., 2:, 2:] - pp[..., 2:, :-2]
    )
    gy = (
        pp[..., 2:, :-2] - pp[..., :-2, :-2]
        + 2 * pp[..., 2:, 1:-1] - 2 * pp[..., :-2, 1:-1]
        + pp[..., 2:, 2:] - pp[..., :-2, 2:]
    )

    top = jnp.asarray(row_top)
    bot = jnp.asarray(row_bot)
    left = jnp.asarray(col_left)
    right = jnp.asarray(col_right)

    def repl(g):
        down = jnp.concatenate([g[..., 1:, :], g[..., -1:, :]], axis=-2)
        up = jnp.concatenate([g[..., :1, :], g[..., :-1, :]], axis=-2)
        g = jnp.where(top, down, jnp.where(bot, up, g))
        rightv = jnp.concatenate([g[..., :, 1:], g[..., :, -1:]], axis=-1)
        leftv = jnp.concatenate([g[..., :, :1], g[..., :, :-1]], axis=-1)
        return jnp.where(left, rightv, jnp.where(right, leftv, g))

    return repl(gx), repl(gy)


def _block_sums(x):
    """[..., 128, 128] -> per-4x4-block sums [..., NB, NB]."""
    s = x.reshape(x.shape[:-2] + (NB, 4, NB, 4))
    return s.sum(axis=(-3, -1))


def _blocks16(x):
    """[..., 128, 128] -> [..., 16, NB*NB] 4x4 blocks, sample-major.

    Entry [..., 4r+c, by*NB+bx] = sample (r, c) of block (by, bx).  The
    sample index leads so that per-sample arithmetic (SATD butterflies,
    moment products, sums over the 16 samples) runs on [..., NB*NB]
    vectors — 1024 contiguous lanes — instead of on [..., NB, NB] arrays
    whose 32-wide trailing dim wastes 3/4 of every TPU vector register.
    """
    s = x.reshape(x.shape[:-2] + (NB, 4, NB, 4))
    s = s.transpose(tuple(range(x.ndim - 2)) + tuple(
        x.ndim - 2 + k for k in (1, 3, 0, 2)))
    return s.reshape(x.shape[:-2] + (16, NB * NB))


def _factor_planes(cp_tab: P.ClassPlane, n_cp: int):
    """Static per-slot equation factors (equations.py linear-form model)."""
    cx = cp_tab.slot_cx.astype(np.int64)
    cy = cp_tab.slot_cy.astype(np.int64)
    one = np.ones_like(cx)
    zero = np.zeros_like(cx)
    if n_cp == 3:
        a = [one, cx, zero, zero, cy, zero]
        b = [zero, zero, one, cx, zero, cy]
    else:
        a = [one, cx, zero, cy]
        b = [zero, cy, one, -cx]
    return a, b


@functools.lru_cache(maxsize=1)
def _triu128():
    return np.triu(np.ones((128, 128), np.float32))


def _prefix128(v):
    """Inclusive prefix sum of a 1-D f32 vector via triangular matmuls.

    len(v) must be a multiple of 128.  XLA's native cumsum lowering
    (reduce-window) materializes a ~19 MB scoped-vmem window expansion at
    64K+ elements inside large programs (hardware-measured scoped-vmem
    compile failures, docs/ab_r04.md); the triangular-matmul form runs the
    same prefix on the MXU with O(rows x 128) memory.  Exact for integer
    values: every partial sum <= len(v) < 2^24 is f32-representable
    (precision=HIGHEST keeps the MXU passes f32-exact below 2^24, cf.
    ops/blockstat.py).
    """
    M = jnp.asarray(_triu128())
    p = jnp.dot(v.reshape(-1, 128), M, precision=lax.Precision.HIGHEST)
    if p.shape[0] > 1:
        t = p[:, -1]
        pad = (-t.shape[0]) % 128
        off = _prefix128(jnp.pad(t, (0, pad)))[:t.shape[0]] - t
        p = p + off[:, None]
    return p.ravel()


def _zero_telem() -> EvalTelemetry:
    z = jnp.int32(0)
    return EvalTelemetry(z, z, z, jnp.zeros(MAX_LADDER, jnp.int32))


def _static_slab_mask(t: PlaneTables, n_ctu: int):
    """[nCtu, nBins, 16] int32 slab activity (within-aware, per CTU)."""
    assert n_ctu == t.slab_active.shape[0]
    return jnp.asarray(t.slab_active)


def _warp_kernel_only(spec: PlaneSpec, t: PlaneTables, tiles,
                      dy, dx, hc, vc, R: int, slab_active=None,
                      base_y=None, base_x=None):
    if slab_active is None:
        slab_active = _static_slab_mask(t, dy.shape[0])
    return warp_ops.warp_pallas(
        tiles,
        warp_ops.expand_lanes(dy), warp_ops.expand_lanes(dx),
        warp_ops.expand_lanes(hc), warp_ops.expand_lanes(vc),
        R=R, interpret=spec.interpret,
        slab_active=slab_active.astype(jnp.int32), f32=spec.f32_warp,
        base_y=base_y, base_x=base_x)


def _escape_fixup(spec: PlaneSpec, t: PlaneTables, dyn: DynTables, ref_flat,
                  pred, dy, dx, hc, vc, rt, admax=None):
    """Exact per-block recompute of every block displaced beyond ``rt``.

    ``rt`` is the (possibly traced) displacement bound of the kernel that
    produced ``pred`` — the threshold is data, so ONE fix-up graph serves
    every dispatch rung (a per-rung copy triples XLA's scoped-vmem use of
    the compaction cumsums and overflows it).  ``admax`` (optional) is the
    precomputed per-block max |displacement| — the dispatcher already has
    it, so the abs maps aren't recomputed here.
    """
    n_bins = dy.shape[1]
    if admax is None:
        admax = jnp.maximum(jnp.abs(dy), jnp.abs(dx))
    esc = admax > rt
    # _prefix128's f32 prefix sums (and the escape-index extraction built
    # on them) are exact only while every partial sum < 2^24; ~4M flags at
    # 4K leaves 4x headroom, but an 8K-scale frame would silently corrupt
    # escape indices rather than fail, so guard the static bound here.
    assert esc.size < 2 ** 24, (
        f"escape-flag count {esc.size} exceeds the f32-exact prefix bound")
    n_esc = esc.sum()
    # Escaped blocks (|d| > rt; the kernel's masked selects miss and
    # leave garbage there) are recomputed exactly one-by-one and
    # scattered back in.  Fix-up slots beyond the escape count point at
    # block 0 whose recompute equals the fast-path value, so the
    # scatter is harmless.  The reference pays its full 121-load cost
    # for EVERY sub-block (affine.cl:288-326); here only outliers do.
    E = spec.escape_budget
    if E is None:
        E = max(4096, 30 * t.n_ctus)
    n_groups = esc.any(axis=(-2, -1)).sum()          # telemetry only
    over = n_esc > E

    def fix(pred):
        # Compaction WITHOUT jnp.nonzero: its cumsum lowering
        # (reduce-window) carries a ~19 MB scoped-vmem working set at 64K+
        # flags inside this program and fails TPU compilation outright
        # (hardware-measured; it compiles standalone — the budget is
        # shared with co-scheduled fusions).  Instead: an MXU
        # triangular-matmul prefix over ALL block flags (f32-exact,
        # _prefix128) + a binary-search extraction of the first E flagged
        # indices (fi[e] = first index with prefix >= e+1).  No group or
        # slab tables, no caps beyond the E budget itself — the former
        # group-table cap sent realistic content (a moving object
        # touching 144 (ctu, class) groups) to the multi-second
        # whole-frame fallback every pass.
        prefix = _prefix128(esc.ravel().astype(jnp.float32))
        targets = jnp.arange(1, E + 1, dtype=jnp.float32)
        fi = jnp.searchsorted(prefix, targets, side="left")
        # slots beyond the escape count point at block 0 (fill), whose
        # recompute equals the fast-path value, so the scatter is harmless
        flat_idx = jnp.where(jnp.arange(E) < n_esc, fi, 0).astype(jnp.int32)
        bxi = flat_idx % NB
        byi = (flat_idx // NB) % NB
        ci = (flat_idx // (NB * NB)) % n_bins
        ti = flat_idx // (NB * NB * n_bins)
        g1 = ti * n_bins + ci
        g2 = byi * NB + bxi
        dy_f = dy.reshape(-1)[flat_idx]
        dx_f = dx.reshape(-1)[flat_idx]
        hc_f = hc.reshape(-1, 6, NB * NB)[g1, :, g2]  # [E, 6]
        vc_f = vc.reshape(-1, 6, NB * NB)[g1, :, g2]
        y_blk = dyn.ctu_y[ti] + 4 * byi
        x_blk = dyn.ctu_x[ti] + 4 * bxi
        blocks = warp_ops.predict_blocks_flat(
            ref_flat, spec.frame_w, spec.frame_h,
            y_blk, x_blk, dy_f, dx_f, hc_f, vc_f)    # [E, 4, 4]
        rr = jnp.arange(4, dtype=jnp.int32)
        rows = (4 * byi[:, None] + rr)[:, :, None]   # [E, 4, 1]
        cols = (4 * bxi[:, None] + rr)[:, None, :]   # [E, 1, 4]
        pred = pred.at[ti[:, None, None], ci[:, None, None],
                       rows, cols].set(blocks.astype(pred.dtype))
        # beyond-budget escape counts (pathological inputs): exact fallback
        return lax.cond(
            over,
            lambda op: warp_ops.warp_xla(
                ref_flat, spec.frame_w, spec.frame_h, dyn.ctu_y, dyn.ctu_x,
                op[0], op[1], op[2], op[3]).astype(pred.dtype),
            lambda op: op[4],
            (dy, dx, hc, vc, pred),
        )

    # the compaction + per-block gather is pure overhead on clean
    # iterations — skip it entirely when nothing escaped
    pred = lax.cond(n_esc > 0, fix, lambda p: p, pred)
    telem = EvalTelemetry(n_esc.astype(jnp.int32),
                          n_groups.astype(jnp.int32),
                          over.astype(jnp.int32),
                          jnp.zeros(MAX_LADDER, jnp.int32))
    return pred, telem


def dispatch_units(r: int, rebase_mode) -> float:
    """Adaptive-dispatch cost-model weight of the R=r warp kernel.

    Fit to the round-4 hardware profile (docs/ab_r04.md; units = measured
    whole-kernel ms x 10): R=1/2/4/8 measured 4.2/8.4/30.3/70.2 ms with
    the plane-granular tile roll and 7.9/14.2/33.1/62.2 ms with the
    slab-granular windows — the Ht field's lane-relayout cost grows faster
    than its NS*NR MAC count, so the weight interpolates measured points
    on the NS*NR axis.  tools/profile_stage.py re-measures the rungs every
    round and flags this table when any point drifts >25% (a stale model
    mis-picks rungs with no exactness impact, but silently).
    """
    x = (2 * r + 6) * (2 * r + 9)
    if rebase_mode == "plane":
        return float(np.interp(x, [88, 130, 238, 550], [42, 84, 303, 702]))
    return float(np.interp(x, [88, 130, 238, 550], [79, 142, 331, 622]))


def _rebase_bases(ladder: Tuple[int, ...], dy, dx, val,
                  granularity: str = "slab"):
    """Base displacements for the rebased dispatch.

    Base = midrange of the VALID block displacements within the
    granularity unit (an 8-row slab, or the whole plane), clamped into the
    window legal for every ladder rung (warp.rebase_base_limits).  Slab
    granularity keeps dispatch fine (local objects / refinement scatter
    rebase independently); plane granularity enables the faster
    single-tile-roll kernel (see PlaneSpec.rebase).
    Returns (by0, bx0 [nCtu, nBins, 16] or [nCtu, nBins], dy_k, dx_k
    base-subtracted planes, admax residual |d'| over valid blocks) — the
    inputs every dispatch decision and the rebased kernel key on.
    """
    BIG = jnp.int32(1 << 20)
    per_slab = granularity == "slab"

    def red(x, fill, r):
        xm = jnp.where(val, x, fill)
        if per_slab:
            return r(xm.reshape(xm.shape[:2] + (16, 2, NB)), axis=(-2, -1))
        return r(xm, axis=(-2, -1))

    dy_mn = red(dy, BIG, jnp.min)
    dy_mx = red(dy, -BIG, jnp.max)
    dx_mn = red(dx, BIG, jnp.min)
    dx_mx = red(dx, -BIG, jnp.max)
    anyv = dy_mn <= dy_mx          # any valid block in the unit
    by_lo, by_hi, bx_lo, bx_hi = warp_ops.rebase_base_limits(
        ladder, granularity)
    by0 = jnp.where(anyv, (dy_mn + dy_mx) >> 1, 0)
    bx0 = jnp.where(anyv, (dx_mn + dx_mx) >> 1, 0)
    by0 = clamp(by0, jnp.asarray(by_lo), jnp.asarray(by_hi))
    bx0 = clamp(bx0, jnp.int32(bx_lo), jnp.int32(bx_hi))
    if per_slab:
        dy_k = dy - jnp.repeat(by0, 2, axis=-1)[..., None]
        dx_k = dx - jnp.repeat(bx0, 2, axis=-1)[..., None]
    else:
        dy_k = dy - by0[..., None, None]
        dx_k = dx - bx0[..., None, None]
    # dispatch/escape distance: residual |d'| over VALID blocks
    admax = jnp.where(val, jnp.maximum(jnp.abs(dy_k), jnp.abs(dx_k)), 0)
    return by0, bx0, dy_k, dx_k, admax


def _evaluate(spec: PlaneSpec, t: PlaneTables, dyn: DynTables, ref_flat,
              tiles, orig, cpmvs, refine: bool):
    """One prediction pass.

    ``orig`` is the (orig_pl, orig16) pair from ``_orig_forms``.
    Returns (satd [nCtu,nCU] i64, M, rhs | None, telem: EvalTelemetry).
    """
    rb = spec.rebase_mode
    if rb:
        dy, dx, fx, fy, val = _mv_planes(spec, t, dyn, cpmvs,
                                         with_valid=True)
    else:
        dy, dx, fx, fy = _mv_planes(spec, t, dyn, cpmvs)
    tap_dtype = jnp.int16 if spec.i16_taps else jnp.int32
    hc = _tap_planes(fx, tap_dtype)
    vc = _tap_planes(fy, tap_dtype)

    if _use_pallas(spec):
        # Adaptive two-pass dispatch.  Pass 1 runs one kernel from the
        # R-ladder over every slab; pass 2 re-runs the WIDEST kernel on
        # only the slabs containing blocks the narrow kernel missed
        # (per-(CTU, class, slab) predication) and the results merge
        # per-block — so mid-range outliers cost a few extra slabs of
        # vector work instead of gathers.  The rung is chosen by an
        # arithmetic cost model: units(r) * all-slabs + units(Rmax) *
        # escaped-slabs(r), minimized over the ladder.  Blocks beyond Rmax
        # (rare) still go through the exact per-block gather fix-up and
        # its whole-frame fallback, so the dispatch is exact for ANY
        # displacements.
        #
        # With spec.rebase, every criterion keys on the RESIDUAL after the
        # per-slab base subtraction (dist) instead of raw magnitude: the
        # kernels get base-subtracted planes + the bases, and only blocks
        # beyond the rebased widest kernel reach the fix-up.
        ladder = spec.r_ladder
        act_static = dyn.slab_act
        by0 = bx0 = None
        if rb:
            by0, bx0, dy_k, dx_k, admax = _rebase_bases(ladder, dy, dx,
                                                        val, rb)
        else:
            dy_k, dx_k = dy, dx
            admax = None

        def run_kernel(r, act):
            return _warp_kernel_only(spec, t, tiles, dy_k, dx_k, hc, vc, r,
                                     act, by0, bx0)

        if len(ladder) == 1:
            pred = run_kernel(ladder[0], act_static)
            pred, telem = _escape_fixup(
                spec, t, dyn, ref_flat, pred, dy, dx, hc, vc,
                jnp.int32(ladder[0]), admax=admax)
            telem = telem._replace(rung_hist=telem.rung_hist.at[0].add(1))
        else:
            r_max = ladder[-1]
            # ONE pass over the displacement planes feeds every dispatch
            # decision: per-block max |d|, then a per-slab max — all rung
            # escape counts, the pass-2 slab set, and the fix-up flags are
            # tiny [nCtu, nBins, 16] / scalar ops on top of these
            if admax is None:
                admax = jnp.maximum(jnp.abs(dy), jnp.abs(dx))
            admax_slab = admax.reshape(
                admax.shape[:2] + (16, 2, NB)).max(axis=(-2, -1))

            def units(r):
                return dispatch_units(r, rb)

            n_slabs = act_static.sum()
            costs = []
            for r in ladder[:-1]:
                esc_slabs_r = (admax_slab > r).sum()
                costs.append(units(r) * n_slabs + units(r_max) * esc_slabs_r)
            costs.append(units(r_max) * n_slabs)
            branch = jnp.argmin(jnp.stack(costs)).astype(jnp.int32)

            pred = lax.switch(
                branch,
                [lambda _, r=r: run_kernel(r, act_static) for r in ladder],
                None)
            rt = jnp.asarray(np.asarray(ladder, np.int32))[branch]
            esc_slabs = admax_slab > rt

            def pass2(pred1):
                act2 = (esc_slabs & act_static.astype(bool))
                pred2 = run_kernel(r_max, act2.astype(jnp.int32))
                esc_s = warp_ops.expand_lanes(
                    jnp.repeat(admax > rt, 4, axis=-2))
                return jnp.where(esc_s, pred2, pred1)

            pred = lax.cond(
                (branch < len(ladder) - 1) & (esc_slabs.sum() > 0),
                pass2, lambda p: p, pred)
            # blocks beyond the widest kernel: exact per-block recompute
            pred, telem = _escape_fixup(
                spec, t, dyn, ref_flat, pred, dy, dx, hc, vc,
                jnp.int32(r_max), admax=admax)
            telem = telem._replace(
                rung_hist=telem.rung_hist.at[branch].add(1))
    else:
        pred = warp_ops.warp_xla(
            ref_flat, spec.frame_w, spec.frame_h, dyn.ctu_y, dyn.ctu_x,
            dy, dx, hc, vc)
        telem = _zero_telem()

    satd, M, rhs = _reduce_pred(spec, t, pred, orig, dyn.within, refine)
    return satd, M, rhs, telem


def _use_pallas(spec: PlaneSpec) -> bool:
    if spec.use_pallas is not None:
        return spec.use_pallas
    return jax.default_backend() == "tpu"


def _fused_active(spec: PlaneSpec) -> bool:
    """True when _reduce_pred runs the fused Mosaic reduction kernel.

    Tied to the Pallas warp path (its int16 pred planes are the kernel's
    input contract); the mxu_reduce / plane_moments knobs select the other
    A/B reduction variants and take precedence.  fused_reduce=None
    resolves by frame size (see the PlaneSpec field).
    """
    fused = spec.fused_reduce
    if fused is None:
        fused = G.frame_grid(spec.frame_w, spec.frame_h).num_ctus <= 240
    return (fused and not spec.mxu_reduce
            and not spec.plane_moments and _use_pallas(spec))


class OrigForms(NamedTuple):
    """The per-CTU original planes in the form(s) the reduce path needs."""

    plane: jnp.ndarray                  # int32 [nCtu, 128, 128]
    blocks16: Optional[jnp.ndarray]     # sample-major (unfused reduce only)
    plane16: Optional[jnp.ndarray]      # int16 (fused reduce kernel input)


def _orig_forms(spec: PlaneSpec, orig_pl) -> OrigForms:
    fused = _fused_active(spec)
    return OrigForms(
        orig_pl,
        None if (spec.mxu_reduce or fused) else _blocks16(orig_pl),
        orig_pl.astype(jnp.int16) if fused else None)


def _reduce_pred_fused(spec: PlaneSpec, t: PlaneTables, pred,
                       orig: "OrigForms", within_j, refine: bool):
    """_reduce_pred through the fused Mosaic kernel (ops.blockreduce).

    Same contract and bit-identical per-CU outputs.  The kernel emits
    lane-resolution per-block partials (SATD on lane 4b+3 of each block
    with zeros elsewhere; moment column sums on every lane); strided lane
    slices — hardware-measured as free, unlike the sample-major _blocks16
    transposes they replace (tools/reduce_probe.py) — compact them to the
    block-granular [NB, NB] form, after which the per-CU term assembly is
    byte-for-byte the unfused path's (XLA fuses it into the strided CU
    reductions at no measurable cost).
    """
    satd_l, moms_l = blockreduce_ops.reduce_pallas(
        pred, orig.plane16, jnp.asarray(t.border_packed),
        jnp.asarray(t.slab_active), refine=refine, interpret=spec.interpret)

    satd_c = satd_l[..., 3::4]                  # [nCtu, nBins, NB, NB] i32
    satd_cols = []
    for ci, cp_tab in enumerate(t.cls):
        bi = int(t.bin_of[ci])
        satd_cu = P.reduce_slots_to_cu(
            jnp, jnp.where(jnp.asarray(cp_tab.slot_valid),
                           satd_c[:, bi].astype(jnp.int64),
                           0), cp_tab)
        satd_cols.append(satd_cu)
    satd = jnp.concatenate(satd_cols, axis=1)
    satd = jnp.where(within_j, satd, 0)
    if not refine:
        return satd, None, None

    # per-block moment sums: 4-lane fold, int32-exact (|prod| < 2^25 per
    # sample, 16-sample block sums < 2^29); i64 widening happens where the
    # unfused path widens, so the term assembly below is identical to it
    moms_c = (moms_l[..., 0::4] + moms_l[..., 1::4]
              + moms_l[..., 2::4] + moms_l[..., 3::4])
    moments = [moms_c[:, bi].astype(jnp.int64) for bi in range(t.n_bins)]
    return satd, *_assemble_equations(spec, t, moments, within_j)


def _assemble_equations(spec: PlaneSpec, t: PlaneTables, moments, within_j):
    """Per-CU normal equations from per-bin block moments.

    moments: per bin, int64 [nCtu, 5, NB, NB] block sums of (gx*gx, gx*gy,
    gy*gy, gx*err, gy*err).  Shared tail of the fused and unfused reduce
    paths (the equation model of ops/equations.py; affine.cl:680-694).
    """
    Pn = 2 * spec.n_cp
    M_cols, rhs_cols = [], []
    for ci, cp_tab in enumerate(t.cls):
        m = moments[int(t.bin_of[ci])]
        m20_64, m11_64, m02_64 = m[:, 0], m[:, 1], m[:, 2]
        me1_64, me2_64 = m[:, 3], m[:, 4]
        a, b = _factor_planes(cp_tab, spec.n_cp)
        # all unique M terms (p <= q) and rhs terms stack on one axis so the
        # slot->CU reduction is a SINGLE batched strided sum per class
        terms, order = [], []
        for p in range(Pn):
            for q in range(p, Pn):
                aa = jnp.asarray(a[p] * a[q])
                ab = jnp.asarray(a[p] * b[q] + a[q] * b[p])
                bb = jnp.asarray(b[p] * b[q])
                terms.append(m20_64 * aa + m11_64 * ab + m02_64 * bb)
                order.append((p, q))
        for p in range(Pn):
            terms.append(me1_64 * jnp.asarray(a[p])
                         + me2_64 * jnp.asarray(b[p]))
        red = P.reduce_slots_to_cu(
            jnp, jnp.stack(terms, axis=1), cp_tab)       # [nCtu, T, num_cus]
        cell = {}
        for k, (p, q) in enumerate(order):
            cell[(p, q)] = cell[(q, p)] = red[:, k]
        M = jnp.stack(
            [jnp.stack([cell[(p, q)] for q in range(Pn)], axis=-1)
             for p in range(Pn)], axis=-2)
        rhs = jnp.stack([red[:, len(order) + p] << 3 for p in range(Pn)],
                        axis=-1)
        M_cols.append(M)
        rhs_cols.append(rhs)
    M = jnp.concatenate(M_cols, axis=1)
    rhs = jnp.concatenate(rhs_cols, axis=1)
    M = jnp.where(within_j[..., None, None], M, 0)
    rhs = jnp.where(within_j[..., None], rhs, 0)
    return M, rhs


def _reduce_pred(spec: PlaneSpec, t: PlaneTables, pred, orig, within_j,
                 refine: bool):
    """SATD / gradient / normal-equation reductions from bin pred planes.

    pred may have a length-1 bin axis (broadcast), e.g. the zero-MV case.
    ``orig`` is the OrigForms triple from ``_orig_forms``.
    """
    if _fused_active(spec):
        return _reduce_pred_fused(spec, t, pred, orig, within_j, refine)
    orig_pl, orig16 = orig.plane, orig.blocks16
    one_bin = pred.shape[1] == 1
    # ---- SATD per block, reduced per CU --------------------------------
    pred16 = None
    if spec.mxu_reduce:
        sb_satd = blockstat_ops.satd_blocks(orig_pl[:, None], pred)
    else:
        pred16 = _blocks16(pred)                   # [nCtu, nBin, 16, NB*NB]
        sb_satd = satd_ops.satd_4x4(orig16[:, None], pred16, sample_axis=-2)
        sb_satd = sb_satd.reshape(sb_satd.shape[:-1] + (NB, NB))
    satd_cols = []
    for ci, cp_tab in enumerate(t.cls):
        bi = 0 if one_bin else int(t.bin_of[ci])
        satd_cu = P.reduce_slots_to_cu(
            jnp, jnp.where(jnp.asarray(cp_tab.slot_valid),
                           sb_satd[:, bi].astype(jnp.int64),
                           0), cp_tab)
        satd_cols.append(satd_cu)
    satd = jnp.concatenate(satd_cols, axis=1)
    satd = jnp.where(within_j, satd, 0)

    if not refine:
        return satd, None, None

    # ---- gradients + normal-equation moments (once per bin) ------------
    moments = []
    for bi in range(t.n_bins):
        plane = pred[:, 0 if one_bin else bi]
        gx, gy = _sobel_replicated(
            plane, t.bin_row_top[bi], t.bin_row_bot[bi],
            t.bin_col_left[bi], t.bin_col_right[bi])
        # moments per block (int32-exact: |g|<=4*1023, 16 samples); pred
        # planes may arrive int16 (10-bit samples, half the HBM traffic),
        # so the products are cast up explicitly.
        if spec.mxu_reduce or spec.plane_moments:
            # plane-space products + per-block sums with NO sample-major
            # transposes: either blockstat's MXU matmul form or plain
            # strided reshape sums (_block_sums).  The round-4 device
            # profile attributed most of reduce_pred to the _blocks16
            # relayouts (3 full planes per bin per evaluate).
            gx32 = gx.astype(jnp.int32)
            gy32 = gy.astype(jnp.int32)
            err = orig_pl.astype(jnp.int32) - plane.astype(jnp.int32)
            prods = jnp.stack(
                [gx32 * gx32, gx32 * gy32, gy32 * gy32,
                 gx32 * err, gy32 * err], axis=1)  # [nCtu, 5, 128, 128]
            if spec.mxu_reduce:
                moments.append(blockstat_ops.block_sums_i64(prods))
            else:
                # |prod| < 2^25 per sample, 16-sample block sums < 2^29 —
                # int32-exact; widen to the i64 contract after the sum
                moments.append(_block_sums(prods).astype(jnp.int64))
        else:
            # Blocks are sample-major [.., 16, NB*NB]: products/sums run on
            # 1024-lane vectors, the [NB, NB] plane shape is restored only
            # for the per-CU reduction.  The error reuses the SATD pass's
            # pred16 transpose instead of re-transposing the plane.
            err16 = orig16 - pred16[:, 0 if one_bin else bi].astype(jnp.int32)
            gx16 = _blocks16(gx).astype(jnp.int32)
            gy16 = _blocks16(gy).astype(jnp.int32)
            prods = jnp.stack(
                [gx16 * gx16, gx16 * gy16, gy16 * gy16,
                 gx16 * err16, gy16 * err16], axis=1)  # [nCtu, 5, 16, NB*NB]
            moments.append(prods.sum(-2).reshape(
                prods.shape[:2] + (NB, NB)).astype(jnp.int64))
    return satd, *_assemble_equations(spec, t, moments, within_j)


def _evaluate_zero(spec: PlaneSpec, t: PlaneTables, ref_pl, orig,
                   within_j, refine: bool):
    """Iteration-0 evaluate for 2CP stages: CPMVs are all zero
    (affine.cl:53-59), so every block's prediction is the phase-0 filter of
    the co-located reference sample — a closed-form elementwise map of the
    reference plane, identical for every size class.  No warp needed.

    ref_pl: int32 [nCtu, 128, 128] co-located reference CTU tiles.
    """
    tmp = (ref_pl * 64 + warp_ops._OFF1) >> warp_ops._SHIFT1
    p0 = jnp.clip((tmp * 64 + warp_ops._OFF2) >> warp_ops._SHIFT2,
                  C.CLP_RNG_MIN, C.CLP_RNG_MAX).astype(jnp.int16)
    return _reduce_pred(spec, t, p0[:, None], orig, within_j, refine)


def _init_cpmvs(spec: PlaneSpec, t: PlaneTables, prev, abs_x, abs_y):
    """2CP: zeros (affine.cl:53-59); 3CP: LT/RT from 2CP best + derived LB
    (affine.cl:62-106).  Canonical class order throughout."""
    if spec.n_cp == 2:
        return jnp.zeros((prev.shape[0], t.n_cus, 3, 2), jnp.int32)
    parts = []
    for ci, cp_tab in enumerate(t.cls):
        sl = _class_slice(t, ci)
        cp = prev[:, sl]
        lb = mv_ops.derive_lb_from_2cp(
            cp, int(np.log2(cp_tab.width)), int(np.log2(cp_tab.height)),
            abs_x[:, sl], abs_y[:, sl], spec.frame_w, spec.frame_h)
        parts.append(jnp.concatenate([cp[..., 0:2, :], lb[..., None, :]],
                                     axis=-2))
    return jnp.concatenate(parts, axis=1)


def _refine_cpmvs(spec, t, cpmvs, M, rhs, cu_w, cu_h, abs_x, abs_y):
    params = solver_ops.solve_affine(M, rhs, spec.n_cp)
    deltas = solver_ops.scale_delta_mvs(params, spec.n_cp, cu_w, cu_h)
    new = clamp(cpmvs + deltas, C.MV_MIN, C.MV_MAX)
    nx, ny = mv_ops.clip_mv(
        new[..., 0], new[..., 1], abs_x[..., None], abs_y[..., None],
        spec.frame_w, spec.frame_h)
    return jnp.stack([nx, ny], axis=-1)


def prep_inputs(spec: PlaneSpec, t: PlaneTables, ref_flat, orig_flat):
    """Frame-global device prep: (tiles, orig_pl, ref_pl), all CTU-leading.

    Runs once per stage invocation BEFORE any CTU sharding — the outputs
    lead with the CTU axis, so the sharding layer pads/shards them directly.
    """
    tiles = warp_ops.build_tiles(
        warp_ops.build_refpad(
            ref_flat, spec.frame_w, spec.frame_h, t.n_ctu_y, t.n_ctu_x),
        t.n_ctu_y, t.n_ctu_x)
    # per-CTU 128x128 planes (zero padding; only within-CUs used)
    oh = 128 * t.n_ctu_y
    ow = 128 * t.n_ctu_x

    def to_planes(flat):
        p2d = jnp.pad(
            flat.reshape(spec.frame_h, spec.frame_w),
            ((0, oh - spec.frame_h), (0, ow - spec.frame_w)))
        pl_ = p2d.reshape(t.n_ctu_y, 128, t.n_ctu_x, 128)
        return pl_.transpose(0, 2, 1, 3).reshape(t.n_ctus, 128, 128)

    return tiles, to_planes(orig_flat), to_planes(ref_flat)


def dyn_tables(t: PlaneTables) -> DynTables:
    return DynTables(
        abs_x=jnp.asarray(t.abs_x), abs_y=jnp.asarray(t.abs_y),
        within=jnp.asarray(t.within),
        ctu_x=jnp.asarray(t.ctu_x), ctu_y=jnp.asarray(t.ctu_y),
        slab_act=jnp.asarray(t.slab_active))


def _stage_core(spec: PlaneSpec, t: PlaneTables, dyn: DynTables, ref_flat,
                tiles, orig_pl, ref_pl, lam, prev_cpmvs):
    """The iteration loop over (possibly CTU-sharded) local arrays.

    Returns (best_cost, best_cpmvs, telem).  Every per-CTU input leads with
    the same (local) CTU count; ref_flat/lam are frame-global (replicated).
    """
    abs_x, abs_y, within_j = dyn.abs_x, dyn.abs_y, dyn.within
    cu_w = jnp.asarray(t.cu_w)
    cu_h = jnp.asarray(t.cu_h)
    orig = _orig_forms(spec, orig_pl)

    curr = _init_cpmvs(spec, t, prev_cpmvs, abs_x, abs_y)
    best_cost = jnp.full((curr.shape[0], t.n_cus), C.MAX_LONG, jnp.int64)
    best_cp = jnp.zeros_like(curr)

    def cost_of(cpmvs, satd):
        bits = cost_ops.affine_bits_zero_pred(cpmvs, spec.n_cp)
        return cost_ops.rd_cost(satd, bits, lam)

    def update_best(curr, cost, best_cost, best_cp):
        better = cost < best_cost
        return (jnp.where(better, cost, best_cost),
                jnp.where(better[..., None, None], curr, best_cp))

    def add_telem(a: EvalTelemetry, b: EvalTelemetry) -> EvalTelemetry:
        return EvalTelemetry(a.n_escapes + b.n_escapes,
                             jnp.maximum(a.max_groups, b.max_groups),
                             a.n_fallbacks + b.n_fallbacks,
                             a.rung_hist + b.rung_hist)

    def body(carry, _):
        curr, best_cost, best_cp, telem = carry
        satd, M, rhs, tm = _evaluate(
            spec, t, dyn, ref_flat, tiles, orig, curr, True)
        cost = cost_of(curr, satd)
        best_cost, best_cp = update_best(curr, cost, best_cost, best_cp)
        curr = _refine_cpmvs(spec, t, curr, M, rhs, cu_w, cu_h, abs_x, abs_y)
        return (curr, best_cost, best_cp, add_telem(telem, tm)), None

    n_iters = spec.num_gradient_iters
    telem = _zero_telem()
    if spec.n_cp == 2:
        # iteration 0 in closed form (zero CPMVs)
        satd, M, rhs = _evaluate_zero(spec, t, ref_pl, orig, within_j, True)
        cost = cost_of(curr, satd)
        best_cost, best_cp = update_best(curr, cost, best_cost, best_cp)
        curr = _refine_cpmvs(spec, t, curr, M, rhs, cu_w, cu_h, abs_x, abs_y)
        n_iters -= 1

    (curr, best_cost, best_cp, telem), _ = lax.scan(
        body, (curr, best_cost, best_cp, telem), None, length=n_iters)
    satd, _, _, tm = _evaluate(
        spec, t, dyn, ref_flat, tiles, orig, curr, False)
    telem = add_telem(telem, tm)
    cost = cost_of(curr, satd)
    best_cost, best_cp = update_best(curr, cost, best_cost, best_cp)
    return best_cost, best_cp, telem


def _stage_run(spec: PlaneSpec, t: PlaneTables, ref_flat, orig_flat, lam,
               prev_cpmvs):
    tiles, orig_pl, ref_pl = prep_inputs(spec, t, ref_flat, orig_flat)
    cost, cp, _ = _stage_core(spec, t, dyn_tables(t), ref_flat, tiles,
                              orig_pl, ref_pl, lam, prev_cpmvs)
    return cost, cp


@functools.lru_cache(maxsize=None)
def build_stage(spec: PlaneSpec, telemetry: bool = False):
    """Compile a dense-engine stage; same contract as affine_me.build_stage:
    fn(ref_flat_i32, orig_flat_i32, lam_f32, prev_cpmvs) ->
    (best_cost int64 [nCtu, nCU], best_cpmvs int32 [nCtu, nCU, 3, 2]),
    canonical class order.  With telemetry=True a third output carries the
    EvalTelemetry escape counters."""
    tables = build_tables(spec)

    @jax.jit
    def run(ref_flat, orig_flat, lam, prev_cpmvs):
        tiles, orig_pl, ref_pl = prep_inputs(spec, tables, ref_flat, orig_flat)
        cost, cp, telem = _stage_core(
            spec, tables, dyn_tables(tables), ref_flat, tiles, orig_pl,
            ref_pl, lam, prev_cpmvs)
        return (cost, cp, telem) if telemetry else (cost, cp)

    return run


@functools.lru_cache(maxsize=None)
def build_pair_stage(spec2: PlaneSpec, spec3: PlaneSpec,
                     telemetry: bool = False):
    """ONE jitted program for a mode's sequential 2CP -> 3CP chain.

    The reference dispatches these as two kernel launches with the 2CP
    result buffer fed to the 3CP kernel as prevCpmvs (main.cpp:759-878,
    arg 10 at main.cpp:837); the chain is sequential inside one (frame,
    ref) anyway, so fusing it into one executable halves the per-resolution
    program count (2 instead of 4), shares one prep_inputs (tiles / plane
    forms) between the two stages, and keeps the 2CP->3CP CPMV handoff
    on-device.  Outputs are bit-identical to the two separate stages.

    fn(ref_flat, orig_flat, lam, prev2) ->
      (cost2, cpmvs2, cost3, cpmvs3[, telem2, telem3]).
    """
    assert spec2.mode == spec3.mode and spec2.n_cp == 2 and spec3.n_cp == 3
    tables = build_tables(spec2)   # mode/frame geometry only: same for both

    @jax.jit
    def run(ref_flat, orig_flat, lam, prev2):
        tiles, orig_pl, ref_pl = prep_inputs(spec2, tables, ref_flat,
                                             orig_flat)
        dyn = dyn_tables(tables)
        c2, p2, tm2 = _stage_core(spec2, tables, dyn, ref_flat, tiles,
                                  orig_pl, ref_pl, lam, prev2)
        c3, p3, tm3 = _stage_core(spec3, tables, dyn, ref_flat, tiles,
                                  orig_pl, ref_pl, lam, p2)
        if telemetry:
            return c2, p2, c3, p3, tm2, tm3
        return c2, p2, c3, p3

    return run


def zero_cpmvs(spec: PlaneSpec) -> jnp.ndarray:
    lay = G.layout(spec.mode)
    n = G.frame_grid(spec.frame_w, spec.frame_h).num_ctus
    return jnp.zeros((n, lay.cus_per_ctu, 3, 2), jnp.int32)
