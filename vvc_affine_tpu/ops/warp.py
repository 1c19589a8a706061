"""Dense motion-compensated prediction of whole CTU planes.

This is the TPU-native replacement for the reference's per-sub-block window
fetch + 8-tap interpolation (affine.cl:254-393, aux_functions.cl:1096-1223).
Instead of 121 random loads per 4x4 sub-block, prediction runs as dense
vector work over per-class 128x128 CTU planes:

* per-sample integer displacements (dy, dx) and per-sample filter-tap planes
  (hc, vc — the 1/16-pel phase resolved to coefficients, so phases are data
  rather than control flow), constant within each 4x4 block;
* `warp_xla`: exact reference path — clamped window gather + separable
  filter — valid for ANY displacement; the escape fallback and CPU oracle;
* `warp_pallas`: the fast path — a Mosaic kernel over per-CTU reference
  tiles (176x256 int16, built once per evaluate by `build_tiles` from pure
  reshape/concat ops) that resolves displacements with masked selects:
  the horizontal filter and dx-select fuse into one coefficient field
  (HMASK[s, x] = hc[s - dx(x) + 3][x], so sum_s slab[., x+s]*HMASK[s, x]
  IS the horizontally-filtered sample at x's own displaced window), and the
  vertical displacement resolves with a radix-4 masked row select.  Exact
  for |dy|,|dx| <= R; the caller cond-falls-back to warp_xla when any block
  escapes.  Tiles (not the whole padded plane) keep VMEM flat in the frame
  area — 4K runs in the same ~0.4 MB VMEM footprint per grid step — and
  give the kernel a flat CTU leading grid axis, which is the sharding axis
  (parallel.mesh).

Bit-exactness: both paths reproduce VTM's first/last-pass offset/shift
scheme exactly in int32 (aux_functions.cl:1121-1195); the padded plane's
edge replication is provably identical to the reference's per-sample
clamp-to-edge window correction (affine.cl:288-326).

6-tap convention: the VTM 4x4 affine filter bank (m_lumaFilter4x4,
constants.cl:40-58) has ZERO first and last taps in every one of its 16
phases, so the nominal 8-tap filter is effectively 6-tap.  The reference
MACs all 8 taps anyway (aux_functions.cl:1121-1195); skipping the two zero
coefficients is bit-exact and shrinks every hot dimension: hc/vc carry 6
coefficients (bank columns 1..6), windows are 9x9 (not 11x11), the Pallas
select support is NS = 2R+6 and the candidate-row field NR = 2R+9.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vvc_affine_tpu import constants as C
from vvc_affine_tpu.utils.bitmath import clamp

NB = 32      # 4x4 block slots per CTU axis
PAD = 64     # refpad top/left padding
MAX_R = 16   # tile geometry supports |displacement| bound R up to this

# Per-CTU reference tile geometry: tile[i] = refpad[128 ty + PAD - TILE_TOP :
# + TILE_H, 128 tx : + TILE_W] for CTU i = ty * n_ctu_x + tx, so CTU sample
# (r, c) sits at tile (r + TILE_TOP, c + TILE_LEFT).  Row reach per 4x4 block
# at block-row by with |dy| <= R is [4 by - R - 2, 4 by + R + 7); column
# reach is [c - R - 2, c + R + 4) — both inside the tile for R <= MAX_R.
# TILE_H carries 8 extra rows beyond the legacy kernels' 176-row reach to
# widen the rebased kernel's legal base window (see rebase_base_limits).
TILE_TOP = 24
TILE_LEFT = PAD
TILE_H = 184
TILE_W = 256

_SHIFT1 = C.IF_FILTER_PREC - 4                    # 2
_OFF1 = -C.IF_INTERNAL_OFFS << _SHIFT1
_SHIFT2 = C.IF_FILTER_PREC + 4                    # 10
_OFF2 = (1 << (_SHIFT2 - 1)) + (C.IF_INTERNAL_OFFS << C.IF_FILTER_PREC)


def refpad_shape(n_ctu_y: int, n_ctu_x: int) -> Tuple[int, int]:
    # bottom margin = TILE_H - 128 - TILE_TOP exactly: the last CTU row's
    # tile ends at refpad row 128 n_ctu_y + PAD - TILE_TOP + TILE_H
    return PAD + 128 * n_ctu_y + (TILE_H - 128 - TILE_TOP), \
        PAD + 128 * n_ctu_x + 64


def build_refpad(ref_flat, frame_w: int, frame_h: int,
                 n_ctu_y: int, n_ctu_x: int):
    """Edge-replicated padded reference plane, int16 [Hp, Wp].

    refpad[y, x] == ref[clip(y-PAD), clip(x-PAD)], which makes every
    in-bounds window read equal to the reference's clamp-to-edge sample
    correction (affine.cl:288-326).
    """
    hp, wp = refpad_shape(n_ctu_y, n_ctu_x)
    ref = ref_flat.reshape(frame_h, frame_w)
    ref = jnp.pad(
        ref,
        ((PAD, hp - PAD - frame_h), (PAD, wp - PAD - frame_w)),
        mode="edge",
    )
    return ref.astype(jnp.int16)


def filter_blocks(win, hc, vc):
    """Separable 6-tap over 9x9 windows with explicit per-block taps.

    win: int32 [..., 9, 9] starting at displacement offset -2 (see
    warp_xla); hc/vc: int16/int32 [..., 6] (filter-bank columns 1..6 —
    columns 0 and 7 are zero in every phase, so this is the full 8-tap
    result; int16 taps promote exactly in the multiplies).
    Returns int32 [..., 4, 4] clipped to [0, 1023].
    """
    tmp = None
    for c in range(4):
        acc = win[..., :, c] * hc[..., None, 0]
        for t in range(1, 6):
            acc = acc + win[..., :, c + t] * hc[..., None, t]
        col = (acc + _OFF1) >> _SHIFT1
        tmp = col[..., None] if tmp is None else jnp.concatenate(
            [tmp, col[..., None]], axis=-1)
    out = None
    for r in range(4):
        acc = tmp[..., r, :] * vc[..., None, 0]
        for t in range(1, 6):
            acc = acc + tmp[..., r + t, :] * vc[..., None, t]
        row = (acc + _OFF2) >> _SHIFT2
        out = row[..., None, :] if out is None else jnp.concatenate(
            [out, row[..., None, :]], axis=-2)
    return clamp(out, C.CLP_RNG_MIN, C.CLP_RNG_MAX)


def warp_xla(ref_flat, frame_w: int, frame_h: int, ctu_y, ctu_x,
             dy, dx, hc, vc):
    """Exact dense warp via clamped gather; any displacement.

    ref_flat: int32 [fh*fw]; ctu_y/ctu_x: int32 [nCtu] CTU corners;
    dy/dx: int32 [nCtu, nCls, NB, NB]; hc/vc: int16/int32
    [nCtu, nCls, 6, NB, NB] (6-tap convention, see module docstring).
    Returns int32 [nCtu, nCls, 128, 128].
    """
    n_ctu, n_cls = dy.shape[:2]
    taps = jnp.arange(9, dtype=jnp.int32)
    planes = []
    for ci in range(n_cls):
        by = ctu_y[:, None, None] + 4 * jnp.arange(NB, dtype=jnp.int32)[:, None]
        bx = ctu_x[:, None, None] + 4 * jnp.arange(NB, dtype=jnp.int32)[None, :]
        y0 = by + dy[:, ci] - 2
        x0 = bx + dx[:, ci] - 2
        ys = clamp(y0[..., None] + taps, 0, frame_h - 1)
        xs = clamp(x0[..., None] + taps, 0, frame_w - 1)
        idx = ys[..., :, None] * frame_w + xs[..., None, :]
        win = jnp.take(ref_flat, idx, mode="clip")      # [nCtu, NB, NB, 9, 9]
        hcc = jnp.moveaxis(hc[:, ci], 1, -1)            # [nCtu, NB, NB, 6]
        vcc = jnp.moveaxis(vc[:, ci], 1, -1)
        pred = filter_blocks(win, hcc, vcc)             # [nCtu, NB, NB, 4, 4]
        plane = pred.transpose(0, 1, 3, 2, 4).reshape(n_ctu, 128, 128)
        planes.append(plane)
    return jnp.stack(planes, axis=1)


# ---------------------------------------------------------------------------
# Pallas fast path
# ---------------------------------------------------------------------------

def build_tiles(refpad, n_ctu_y: int, n_ctu_x: int):
    """Per-CTU reference tiles int16 [nCtu, TILE_H, TILE_W] from refpad.

    tile[ty*n_ctu_x+tx] = refpad[128 ty + PAD - TILE_TOP : + TILE_H,
    128 tx : + TILE_W].  The overlapping extraction is pure reshapes +
    concats (two shifted row copies, two shifted column copies) — no
    gathers, no conv patches.
    """
    hp, wp = refpad.shape
    ny, nx = n_ctu_y, n_ctu_x
    r0 = PAD - TILE_TOP                                # 40
    # rows: A = tile rows [0, 128), B = tile rows [128, TILE_H)
    need = r0 + 128 + 128 * ny
    rp = jnp.pad(refpad, ((0, max(0, need - hp)), (0, 0)))
    A = rp[r0:r0 + 128 * ny].reshape(ny, 128, wp)
    B = rp[r0 + 128:r0 + 128 + 128 * ny].reshape(ny, 128, wp)
    band = jnp.concatenate([A, B[:, :TILE_H - 128]], axis=1)  # [ny, TILE_H, wp]
    # cols: wp == 128 nx + 128 exactly (refpad_shape)
    L = band[:, :, 0:128 * nx].reshape(ny, TILE_H, nx, 128)
    Rr = band[:, :, 128:128 + 128 * nx].reshape(ny, TILE_H, nx, 128)
    tiles = jnp.concatenate([L, Rr], axis=-1)          # [ny, TILE_H, nx, 256]
    return tiles.transpose(0, 2, 1, 3).reshape(ny * nx, TILE_H, TILE_W)


def _geom(R: int):
    """Shared select-field geometry for the warp kernel at bound R."""
    NS = 2 * R + 6           # HMASK support: s in [-R-2, R+3]
    S0 = -(R + 2)
    DIRECT_DY = 2 * R + 1 <= 5
    # candidate rows: W rows [1, 10) shifted by dy in [0, 2R]; the radix-4
    # dy-select's coarse window reads ht[4*(2R//4) : +12], so NR pads up
    NR = (2 * R + 9) if DIRECT_DY else (4 * ((2 * R) // 4) + 12)
    return NS, S0, DIRECT_DY, NR


def _rb_geom(R: int):
    """Rebased-kernel slab geometry: the slab slice starts at the first
    candidate row (8k + by0 + 22 - R), so rows [4j, 4j + NR) are the j-th
    block row's candidates and SLAB_H shrinks to the used rows only."""
    NS, S0, DIRECT_DY, NR = _geom(R)
    SLAB_H = -(-(4 + NR) // 8) * 8
    WS = 128 + NS - 1        # lane window after the per-slab dx rebase
    return NS, S0, DIRECT_DY, NR, SLAB_H, WS


def rebase_base_limits(R_ladder, granularity: str = "slab"):
    """Legal base windows for the rebased kernel, intersected over every
    rung in ``R_ladder`` (the pass-2/fix-up kernel runs at the widest rung
    around the SAME base, so one base must be legal for all).

    granularity="slab": one base per (CTU, class, 8-row slab) — the kernel
    resolves each slab's window with a dynamic 8-aligned load + sublane
    roll + lane roll.  Returns (by_lo[16], by_hi[16], bx_lo, bx_hi) numpy
    int32; slab k loads SLAB_H+8 rows from the 8-aligned floor of
    sb = 8k + by0 + 22 - R, so 0 <= sb <= TILE_H - SLAB_H - 8.

    granularity="plane": one base per (CTU, class) — the kernel rolls the
    whole tile ONCE per grid step and addresses every slab with static
    slices, so the base must keep all 16 slabs in-tile: slab k reads tile
    rows [8k + (22 - R) + by0, + SLAB_H), bounded by k=0 (>= 0) and k=15
    (<= TILE_H).  Returns scalar numpy int32 (by_lo, by_hi, bx_lo, bx_hi).

    Lanes (both): lane0 = TILE_LEFT + S0 + bx0 in [0, TILE_W - WS].
    """
    bx_lo, bx_hi = -(1 << 30), 1 << 30
    if granularity == "slab":
        ks = np.arange(16)
        by_lo = np.full(16, -(1 << 30))
        by_hi = np.full(16, 1 << 30)
        for R in R_ladder:
            NS, S0, _, NR, SLAB_H, WS = _rb_geom(R)
            by_lo = np.maximum(by_lo, R - 22 - 8 * ks)
            by_hi = np.minimum(by_hi, TILE_H - SLAB_H - 8 - 8 * ks - 22 + R)
            bx_lo = max(bx_lo, -(TILE_LEFT + S0))
            bx_hi = min(bx_hi, TILE_W - WS - TILE_LEFT - S0)
        return (by_lo.astype(np.int32), by_hi.astype(np.int32),
                np.int32(bx_lo), np.int32(bx_hi))
    assert granularity == "plane"
    by_lo, by_hi = -(1 << 30), 1 << 30
    for R in R_ladder:
        NS, S0, _, NR, SLAB_H, WS = _rb_geom(R)
        by_lo = max(by_lo, R - 22)
        by_hi = min(by_hi, TILE_H - SLAB_H - 8 * 15 - 22 + R)
        bx_lo = max(bx_lo, -(TILE_LEFT + S0))
        bx_hi = min(bx_hi, TILE_W - WS - TILE_LEFT - S0)
    return (np.int32(by_lo), np.int32(by_hi),
            np.int32(bx_lo), np.int32(bx_hi))


def _warp_kernel(R: int, f32: bool = False, rebase=None):
    # rebase: None (raw displacements) | "slab" | "plane" (granularity of
    # the base-relative window; see rebase_base_limits)
    NS, S0, DIRECT_DY, NR = _geom(R)
    if rebase:
        _, _, _, _, SLAB_H, WS = _rb_geom(R)
    else:
        SLAB_H = -(-(26 - R + NR) // 8) * 8  # max row: RLO(j=1)+NR-1

    # f32 arithmetic variant: the VPU has no native 32-bit integer multiply
    # (int32 muls are emulated in 16-bit pieces), so the Ht/vertical MAC
    # fields run much faster as float32.  Bit-exactness is provable: every
    # intermediate is an integer below 2^24 (f32 is exact there) —
    # horizontal acc <= 1023 * sum|coeff| (<= 94) < 2^17, +|OFF1| < 2^18;
    # tmp < 2^15.2; vertical acc <= tmp * 94 < 2^22, +OFF2 < 2^23 — and the
    # two arithmetic right-shifts become exact floor(x * 2^-s) (the scale is
    # a power of two, floor matches >> for negatives).
    acc_dtype = jnp.float32 if f32 else jnp.int32

    def _shift(x, off: int, sh: int):
        if f32:
            return jnp.floor((x + jnp.float32(off)) * jnp.float32(2.0 ** -sh))
        return (x + off) >> sh

    def body(k, slab, dy_ref, dx_ref, hc_ref, vc_ref, out_ref, rows8):
        # ---- HMASK per block row: fused dx-select + horizontal taps ----
        # NB: must be `- (R+2)`, not `+ S0`: an add with a negative
        # i32 constant sends Mosaic's convert lowering into infinite
        # recursion (jax 0.9.0)
        srow = jax.lax.broadcasted_iota(jnp.int32, (NS, 128), 0) - (R + 2)
        dyls, hms = [], []
        for j in range(2):
            sy = 2 * k + j
            dyls.append(dy_ref[0, 0, pl.ds(sy, 1), :])   # [1, 128]
            dxl = dx_ref[0, 0, pl.ds(sy, 1), :]
            tsel = srow - dxl + 3
            hmask = jnp.zeros((NS, 128), acc_dtype)
            for t in range(1, 7):
                # taps arrive int16 (half the DMA); widen at load
                hct = hc_ref[0, 0, t - 1, pl.ds(sy, 1), :].astype(
                    acc_dtype)
                hmask = jnp.where(tsel == t, hct, hmask)
            hms.append(hmask)

        # ---- Ht: horizontal filter at all candidate rows, both block
        # rows accumulated off ONE lane-shifted slice per tap position
        # (the two rows' candidate windows overlap by NR-4 rows; sharing
        # the slice halves the lane-relayout traffic) ----
        # candidate rows rel slab: [4j + 22 - R, 4j + 31 + R)
        # (rebased slab starts at the first candidate row: RLO = 4j)
        RLO0 = 0 if rebase else 22 - R
        CL = 0 if rebase else TILE_LEFT + S0
        ht0 = jnp.zeros((NR, 128), acc_dtype)
        ht1 = jnp.zeros((NR, 128), acc_dtype)
        for si in range(NS):
            S = slab[RLO0:RLO0 + 4 + NR, CL + si:CL + si + 128]
            ht0 = ht0 + S[0:NR, :] * hms[0][si:si + 1, :]
            ht1 = ht1 + S[4:4 + NR, :] * hms[1][si:si + 1, :]

        for j, ht in ((0, ht0), (1, ht1)):
            dyl = dyls[j]
            ht = _shift(ht, _OFF1, _SHIFT1)

            # ---- dy-select: w9[wy, x] = Ht[dy(x) + R + wy, x] ----
            # direct (2R+1 selects of 9 rows) for small R; radix-4
            # (coarse selects of 12 rows + 4 selects of 9) beyond
            dq = dyl + R
            w = jnp.zeros((9, 128), acc_dtype)
            if DIRECT_DY:
                for d in range(2 * R + 1):
                    w = jnp.where(dq == d, ht[d:d + 9, :], w)
            else:
                NCOARSE = (2 * R) // 4 + 1
                htc = jnp.zeros((12, 128), acc_dtype)
                for cq in range(NCOARSE):
                    htc = jnp.where(dq // 4 == cq,
                                    ht[4 * cq:4 * cq + 12, :], htc)
                for fq in range(4):
                    w = jnp.where(dq % 4 == fq, htc[fq:fq + 9, :], w)

            # ---- vertical filter (6 taps: w9 rows [u, u+4)) ----
            pred = jnp.zeros((4, 128), acc_dtype)
            for u in range(6):
                vct = vc_ref[0, 0, u, pl.ds(2 * k + j, 1), :].astype(
                    acc_dtype)
                pred = pred + w[u:u + 4, :] * vct
            pred = _shift(pred, _OFF2, _SHIFT2)
            # int32 bounds: with jax_enable_x64 on, python-int clip
            # bounds become i64 scalars, and i64->i32 converts inside a
            # Mosaic kernel infinitely recurse (jax 0.9.0)
            pred = jnp.clip(pred, jnp.asarray(C.CLP_RNG_MIN, acc_dtype),
                            jnp.asarray(C.CLP_RNG_MAX, acc_dtype))
            if f32:
                pred = pred.astype(jnp.int32)
            rows8[4 * j:4 * j + 4, :] = pred.astype(jnp.int16)

        out_ref[0, 0, 8 * k:8 * k + 8, :] = rows8[:, :]

    # static unroll: fori_loop counters are int64 under jax_enable_x64,
    # and int64 index arithmetic inside Mosaic kernels breaks lowering
    # (infinite _convert_helper recursion, jax 0.9.0); the static form
    # also gives Mosaic compile-time slab addresses.
    if rebase == "slab":
        def kernel(act_ref, by_ref, bx_ref, dy_ref, dx_ref, hc_ref,
                   vc_ref, tile_ref, out_ref, rows8):
            # Per-slab base window: a dynamic 8-aligned REF load 8 rows
            # taller than needed, a dynamic sublane roll for the 0..7 row
            # residual, and a dynamic lane roll for the column base — the
            # probe-validated Mosaic mechanisms (tools/mosaic_probe.py;
            # Mosaic only lowers dynamic ref loads whose sublane start is
            # provably a multiple of 8 with a static lane start).
            # pltpu.roll(x, s, a): out[i] = x[(i-s) mod n] — to bring src
            # index `off` to 0, shift by (n - off) % n; the wrapped tail
            # lands beyond the rows/lanes the body reads.  Slab-granular
            # bases cost ~2x the plane-granular tile roll at the hot rungs
            # (docs/ab_r04.md) but keep the dispatch fine-grained: motion
            # only has to cohere WITHIN a slab, not across the plane —
            # local objects / refinement scatter stay on narrow rungs.
            for k in range(16):
                @pl.when(act_ref[0, 0, 0, k] != 0)
                def _(k=k):
                    sb_raw = 8 * k + (22 - R) + by_ref[0, 0, 0, k]
                    q8 = pl.multiple_of((sb_raw >> 3) << 3, 8)
                    nrow = SLAB_H + 8
                    wide = tile_ref[0, pl.ds(q8, nrow), :].astype(acc_dtype)
                    rr = sb_raw & 7
                    wide = pltpu.roll(wide, (nrow - rr) % nrow, 0)
                    lane0 = (TILE_LEFT + S0) + bx_ref[0, 0, 0, k]
                    slab = pltpu.roll(wide[0:SLAB_H, :],
                                      (TILE_W - lane0) % TILE_W, 1)
                    body(k, slab, dy_ref, dx_ref, hc_ref, vc_ref, out_ref,
                         rows8)
    elif rebase == "plane":
        def kernel(act_ref, byp_ref, bxp_ref, dy_ref, dx_ref, hc_ref,
                   vc_ref, tile_ref, out_ref, rows8):
            # Base-relative window, resolved ONCE per grid step: the whole
            # CTU tile rolls by the per-plane base (dynamic sublane + lane
            # rolls — the probe-validated Mosaic mechanisms,
            # tools/mosaic_probe.py; pltpu.roll(x, s, a): out[i] =
            # x[(i-s) mod n]), after which every slab is a STATIC slice —
            # rows [8k, 8k + SLAB_H) are tile rows [8k + (22-R) + by0, ...)
            # for every k.  Bases are host-clamped into rebase_base_limits
            # so no active slab's slice wraps.  One tile roll per (CTU,
            # class) instead of 16 slab windows — ~2x faster than the
            # "slab" variant at the hot rungs (docs/ab_r04.md) at the cost
            # of plane-coarse dispatch granularity.
            sbp = (22 - R) + byp_ref[0, 0, 0, 0]
            lane0 = (TILE_LEFT + S0) + bxp_ref[0, 0, 0, 0]
            # widen BEFORE rolling: Mosaic's dynamic rotate only lowers
            # 32-bit element types ("Rotate with non-32-bit data")
            rt = tile_ref[0, :, :].astype(acc_dtype)
            rt = pltpu.roll(rt, (TILE_H - sbp) % TILE_H, 0)
            rta = pltpu.roll(rt, (TILE_W - lane0) % TILE_W, 1)
            for k in range(16):
                @pl.when(act_ref[0, 0, 0, k] != 0)
                def _(k=k):
                    body(k, rta[8 * k:8 * k + SLAB_H, :], dy_ref, dx_ref,
                         hc_ref, vc_ref, out_ref, rows8)
    else:
        def kernel(act_ref, dy_ref, dx_ref, hc_ref, vc_ref, tile_ref,
                   out_ref, rows8):
            for k in range(16):
                @pl.when(act_ref[0, 0, 0, k] != 0)
                def _(k=k):
                    # slab k (block rows 2k, 2k+1) reads tile rows
                    # [8k, 8k + SLAB_H) (body predicated off for slabs
                    # with no valid blocks in this bin — 23% of
                    # half-aligned slabs; consumers mask those slots)
                    body(k,
                         tile_ref[0, 8 * k:8 * k + SLAB_H, :].astype(
                             acc_dtype),
                         dy_ref, dx_ref, hc_ref, vc_ref, out_ref, rows8)

    return kernel


@functools.lru_cache(maxsize=None)
def _warp_pallas_fn(n_ctu: int, n_cls: int, R: int, interpret: bool,
                    f32: bool = False, rebase=None):
    if not 1 <= R <= MAX_R:
        raise ValueError(f"R must be in [1, {MAX_R}]")
    kernel = _warp_kernel(R, f32, rebase)

    def im_act(i, c):
        return (i, c, 0, 0)

    def im_blk(i, c):
        return (i, c, 0, 0)

    def im_tap(i, c):
        return (i, c, 0, 0, 0)

    # act is [nCtu, nCls, 1, 16]: Mosaic requires the block's last
    # two dims to equal the array's (or be (8k, 128k))
    smem16 = pl.BlockSpec((1, 1, 1, 16), im_act, memory_space=pltpu.SMEM)
    smem1 = pl.BlockSpec((1, 1, 1, 1), im_act, memory_space=pltpu.SMEM)
    in_specs = [smem16]
    if rebase == "slab":
        in_specs += [smem16, smem16]   # by0, bx0 per (ctu, cls, slab)
    elif rebase == "plane":
        in_specs += [smem1, smem1]     # by0, bx0 per (ctu, cls)
    in_specs += [
        pl.BlockSpec((1, 1, NB, 128), im_blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NB, 128), im_blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 6, NB, 128), im_tap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 6, NB, 128), im_tap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE_H, TILE_W), lambda i, c: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    # grid iterates classes fastest, so the (class-independent) tile block
    # is fetched once per CTU and reused across all n_cls steps
    return pl.pallas_call(
        kernel,
        grid=(n_ctu, n_cls),
        out_shape=jax.ShapeDtypeStruct((n_ctu, n_cls, 128, 128), jnp.int16),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, 128, 128), lambda i, c: (i, c, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def expand_lanes(plane):
    """[..., NB] per-block values -> [..., 128] per-sample (repeat 4x)."""
    return jnp.repeat(plane, 4, axis=-1)


def warp_pallas(tiles, dy_l, dx_l, hc_l, vc_l, R: int = 8,
                interpret: bool = False, slab_active=None,
                f32: bool = False, base_y=None, base_x=None):
    """Fast dense warp; exact iff all |dy|,|dx| <= R.

    tiles: int16 [nCtu, TILE_H, TILE_W] from build_tiles; dy_l/dx_l: int32
    [nCtu, nCls, NB, 128] (lane-expanded, see expand_lanes); hc_l/vc_l:
    int16 [nCtu, nCls, 6, NB, 128]; slab_active: optional int32
    [nCtu, nCls, 16] per-(CTU, class, 8-row slab) work mask — slabs with 0
    are skipped and their output rows are unspecified (used both for the
    static never-valid slabs of half-aligned classes and for the dynamic
    escaped-slab second pass of the adaptive dispatcher).
    base_y/base_x: optional int32 base displacements for the rebased
    kernel — [nCtu, nCls, 16] (per-slab granularity) or [nCtu, nCls]
    (per-plane), each inside the matching rebase_base_limits window.
    When given, dy_l/dx_l must already be base-subtracted — the kernel is
    then exact iff all |dy - by0|, |dx - bx0| <= R.
    Returns int16 [nCtu, nCls, 128, 128] (samples are 10-bit; keeping the
    planes int16 halves the HBM traffic of every downstream reduction).
    """
    n_ctu, n_cls = dy_l.shape[:2]
    if slab_active is None:
        slab_active = jnp.ones((n_ctu, n_cls, 16), jnp.int32)
    slab_active = slab_active.reshape(n_ctu, n_cls, 1, 16)
    rebase = None
    if base_y is not None:
        rebase = "slab" if base_y.ndim == 3 else "plane"
    fn = _warp_pallas_fn(n_ctu, n_cls, R, interpret, f32, rebase)
    # Trace the kernel with x64 semantics off: the package enables
    # jax_enable_x64 globally (the VTM solver needs f64), which leaks i64
    # loop counters / literals into the kernel, and i64 inside a Mosaic
    # kernel breaks lowering (infinite _convert_helper recursion /
    # func.return legalization failures, jax 0.9.0).  All kernel dtypes are
    # explicit, so semantics are unchanged.
    with jax.enable_x64(False):
        if rebase == "slab":
            by = base_y.reshape(n_ctu, n_cls, 1, 16).astype(jnp.int32)
            bx = base_x.reshape(n_ctu, n_cls, 1, 16).astype(jnp.int32)
            return fn(slab_active, by, bx, dy_l, dx_l, hc_l, vc_l, tiles)
        if rebase == "plane":
            by = base_y.reshape(n_ctu, n_cls, 1, 1).astype(jnp.int32)
            bx = base_x.reshape(n_ctu, n_cls, 1, 1).astype(jnp.int32)
            return fn(slab_active, by, bx, dy_l, dx_l, hc_l, vc_l, tiles)
        return fn(slab_active, dy_l, dx_l, hc_l, vc_l, tiles)


def predict_blocks_flat(ref_flat, frame_w: int, frame_h: int,
                        y_blk, x_blk, dy, dx, hc, vc):
    """Exact prediction of E individual 4x4 blocks (the escape fix-up).

    y_blk/x_blk: int32 [E] absolute block corners; dy/dx: int32 [E]
    displacements (any magnitude); hc/vc: int16/int32 [E, 6] taps.
    Returns int32 [E, 4, 4].
    """
    taps = jnp.arange(9, dtype=jnp.int32)
    y0 = y_blk + dy - 2
    x0 = x_blk + dx - 2
    ys = clamp(y0[:, None] + taps, 0, frame_h - 1)
    xs = clamp(x0[:, None] + taps, 0, frame_w - 1)
    idx = ys[:, :, None] * frame_w + xs[:, None, :]
    win = jnp.take(ref_flat, idx, mode="clip")          # [E, 9, 9]
    return filter_blocks(win, hc, vc)
