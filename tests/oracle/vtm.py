"""Scalar NumPy/Python oracle of the VTM-12.0 affine-ME math.

Plain, slow, loop-based transcriptions of the arithmetic the engine must
reproduce bit-exactly.  Each function cites the behavioural spec it mirrors in
/root/reference (the OpenCL reference engine, itself mirroring VTM-12.0).
Python ints are used throughout; all reference intermediates fit int32/int64,
so arbitrary precision is equivalent.
"""

from __future__ import annotations

import numpy as np

from vvc_affine_tpu import constants as C

CTU = 128
SB = 4


# --- rounding / clipping (aux_functions.cl:37-101) --------------------------

def round_mv(v: int, shift: int) -> int:
    offset = 1 << (shift - 1)
    return (v + offset - (1 if v >= 0 else 0)) >> shift


def clip_mv(mvx, mvy, block_x, block_y, fw, fh):
    mv_shift = C.MV_FRACTIONAL_BITS_INTERNAL
    offset = 8
    hor_max = (fw + offset - block_x - 1) << mv_shift
    hor_min = (-C.MAX_CU_WIDTH - offset - block_x + 1) << mv_shift
    ver_max = (fh + offset - block_y - 1) << mv_shift
    ver_min = (-C.MAX_CU_HEIGHT - offset - block_y + 1) << mv_shift
    return (
        min(max(mvx, hor_min), hor_max),
        min(max(mvy, ver_min), ver_max),
    )


def round_and_clip_mv(mvx, mvy, pu_x, pu_y, fw, fh):
    shift = C.MAX_CU_DEPTH - 4 + C.MV_FRACTIONAL_BITS_INTERNAL  # = 7
    return clip_mv(round_mv(mvx, shift), round_mv(mvy, shift), pu_x, pu_y, fw, fh)


# --- sub-block MV derivation (aux_functions.cl:106-212) ----------------------

def is_spread_over_limit(a, b, c, d, bipred=False):
    s4 = 4 << 11
    tap = 6
    if bipred:
        rw = max(max(0, 4 * a + s4), max(4 * c, 4 * a + 4 * c + s4)) - min(
            min(0, 4 * a + s4), min(4 * c, 4 * a + 4 * c + s4))
        rh = max(max(0, 4 * b), max(4 * d + s4, 4 * b + 4 * d + s4)) - min(
            min(0, 4 * b), min(4 * d + s4, 4 * b + 4 * d + s4))
        rw = (rw >> 11) + tap + 3
        rh = (rh >> 11) + tap + 3
        return rw * rh > (tap + 9) * (tap + 9)
    rw = max(0, 4 * a + s4) - min(0, 4 * a + s4)
    rh = max(0, 4 * b) - min(0, 4 * b)
    rw = (rw >> 11) + tap + 3
    rh = (rh >> 11) + tap + 3
    if rw * rh > (tap + 9) * (tap + 5):
        return True
    rw = max(0, 4 * c) - min(0, 4 * c)
    rh = max(0, 4 * d + s4) - min(0, 4 * d + s4)
    rw = (rw >> 11) + tap + 3
    rh = (rh >> 11) + tap + 3
    return rw * rh > (tap + 5) * (tap + 9)


def affine_deltas(cpmvs, w, h, n_cp):
    """(iDMvHorX, iDMvHorY, iDMvVerX, iDMvVerY) per aux_functions.cl:152-191."""
    (ltx, lty), (rtx, rty), (lbx, lby) = cpmvs
    shift = 7
    log2w = int(np.log2(w))
    log2h = int(np.log2(h))
    hx = (rtx - ltx) << (shift - log2w)
    hy = (rty - lty) << (shift - log2w)
    if n_cp == 3:
        vx = (lbx - ltx) << (shift - log2h)
        vy = (lby - lty) << (shift - log2h)
    else:
        vx = -hy
        vy = hx
    return hx, hy, vx, vy


def derive_sub_mv(cpmvs, w, h, sub_x, sub_y, n_cp, bipred=False):
    """Raw (unrounded) sub-block MV + spread flag."""
    (ltx, lty), _, _ = cpmvs
    hx, hy, vx, vy = affine_deltas(cpmvs, w, h, n_cp)
    base_x = ltx << 7
    base_y = lty << 7
    spread = is_spread_over_limit(hx, hy, vx, vy, bipred)
    if spread:
        cx, cy = w >> 1, h >> 1
    else:
        cx, cy = sub_x + 2, sub_y + 2
    return base_x + hx * cx + vx * cy, base_y + hy * cx + vy * cy, spread


# --- reference window & interpolation (affine.cl:254-326, aux:1096-1239) ----

def fetch_window(ref, bx, by, mv_int_x, mv_int_y):
    """11x11 clamp-to-edge window; equivalent to the select-chain correction."""
    fh, fw = ref.shape
    win = np.empty((11, 11), np.int64)
    x0 = bx + mv_int_x - 3
    y0 = by + mv_int_y - 3
    for r in range(11):
        for c in range(11):
            y = min(max(y0 + r, 0), fh - 1)
            x = min(max(x0 + c, 0), fw - 1)
            win[r, c] = ref[y, x]
    return win


def filter_block(win, x_frac, y_frac):
    """Separable 8-tap over an 11x11 window -> clipped 4x4 (aux:1096-1223)."""
    coef = C.LUMA_FILTER_4x4
    # horizontal: first pass, shift = 6-4 = 2, offset = (-8192) << 2
    shift1 = C.IF_FILTER_PREC - 4
    off1 = -C.IF_INTERNAL_OFFS << shift1
    tmp = np.empty((11, 4), np.int64)
    for r in range(11):
        for c in range(4):
            s = sum(int(win[r, c + t]) * int(coef[x_frac][t]) for t in range(8))
            tmp[r, c] = (s + off1) >> shift1
    # vertical: last pass, shift = 6+4, offset = (1<<9) + (8192<<6)
    shift2 = C.IF_FILTER_PREC + 4
    off2 = (1 << (shift2 - 1)) + (C.IF_INTERNAL_OFFS << C.IF_FILTER_PREC)
    out = np.empty((4, 4), np.int64)
    for r in range(4):
        for c in range(4):
            s = sum(int(tmp[r + t, c]) * int(coef[y_frac][t]) for t in range(8))
            v = (s + off2) >> shift2
            out[r, c] = min(max(v, C.CLP_RNG_MIN), C.CLP_RNG_MAX)
    return out


# --- SATD (aux_functions.cl:1940-2043) --------------------------------------

def satd_4x4(orig, pred):
    diff = [int(o) - int(p) for o, p in zip(np.ravel(orig), np.ravel(pred))]
    m = [0] * 16
    d = [0] * 16
    for k in range(4):
        m[k] = diff[k] + diff[12 + k]
        m[4 + k] = diff[4 + k] + diff[8 + k]
        m[8 + k] = diff[4 + k] - diff[8 + k]
        m[12 + k] = diff[k] - diff[12 + k]
    for k in range(4):
        d[k] = m[k] + m[4 + k]
        d[4 + k] = m[8 + k] + m[12 + k]
        d[8 + k] = m[k] - m[4 + k]
        d[12 + k] = m[12 + k] - m[8 + k]
    for base in range(0, 16, 4):
        m[base + 0] = d[base + 0] + d[base + 3]
        m[base + 1] = d[base + 1] + d[base + 2]
        m[base + 2] = d[base + 1] - d[base + 2]
        m[base + 3] = d[base + 0] - d[base + 3]
    for base in range(0, 16, 4):
        d[base + 0] = m[base + 0] + m[base + 1]
        d[base + 1] = m[base + 0] - m[base + 1]
        d[base + 2] = m[base + 2] + m[base + 3]
        d[base + 3] = m[base + 3] - m[base + 2]
    satd = sum(abs(v) for v in d)
    satd -= abs(d[0])
    satd += abs(d[0]) >> 2
    return (satd + 1) >> 1


# --- rate estimation (aux_functions.cl:2056-2189) ----------------------------

def change_precision(v: int, src: int, dst: int) -> int:
    shift = dst - src
    if shift >= 0:
        return v << shift
    right = -shift
    off = 1 << (right - 1)
    return (v + off - 1) >> right if v >= 0 else (v + off) >> right


def round_affine_prec(v: int, precision: int) -> int:
    """roundAffinePrecInternal2Amvr (aux:2078-2113): round at lower precision."""
    src, dst = C.MV_PRECISION_INTERNAL, precision
    shift = dst - src
    if shift >= 0:
        v <<= shift
        off = 1 << (shift - 1)
        return (v + off - 1) >> shift if v >= 0 else (v + off) >> shift
    right = -shift
    off = 1 << (right - 1)
    v = (v + off - 1) >> right if v >= 0 else (v + off) >> right
    return v << right


def exp_golomb_bits(value: int) -> int:
    length = 1
    t = ((-value) << 1) + 1 if value <= 0 else value << 1
    while t > C.MAX_CU_SIZE:
        length += C.MAX_CU_DEPTH << 1
        t >>= C.MAX_CU_DEPTH
    return length + (t.bit_length() - 1) * 2  # + 2*floor(log2 t)


def bits_of_vector(pred, sel):
    return exp_golomb_bits(sel[0] - pred[0]) + exp_golomb_bits(sel[1] - pred[1])


def calc_affine_bits(cpmvs, pred_cpmvs, n_cp, precision=C.AFFINE_MV_PRECISION_QUARTER):
    """InterSearch::xCalcAffineMVBits analogue (aux:2140-2188)."""

    def q(mv):
        return (
            change_precision(mv[0], C.MV_PRECISION_INTERNAL, precision),
            change_precision(mv[1], C.MV_PRECISION_INTERNAL, precision),
        )

    lt, rt, lb = cpmvs
    plt, prt, plb = pred_cpmvs
    bits = bits_of_vector(q(plt), q(lt))
    bits += bits_of_vector(
        q((prt[0] + lt[0] - plt[0], prt[1] + lt[1] - plt[1])), q(rt)
    )
    if n_cp == 3:
        bits += bits_of_vector(
            q((plb[0] + lt[0] - plt[0], plb[1] + lt[1] - plt[1])), q(lb)
        )
    return bits


def rd_cost(bitrate: int, lam: float) -> int:
    """floor(lambda * bits) in float32 (aux:2219-2221)."""
    return int(np.floor(np.float32(lam) * np.float32(bitrate)))


# --- gradient (affine.cl:477-540) --------------------------------------------

def sobel_plane_with_refill(plane, cu_boxes):
    """Literal CTU-plane Sobel + per-CU border refill (the reference order).

    plane: int array [128,128]; cu_boxes: list of (x, y, w, h).
    Returns (gx, gy) int arrays [128,128].
    """
    gx = np.zeros((CTU, CTU), np.int64)
    gy = np.zeros((CTU, CTU), np.int64)
    p = plane.astype(np.int64)
    for y in range(1, CTU - 1):
        for x in range(1, CTU - 1):
            gx[y, x] = (
                p[y - 1, x + 1] - p[y - 1, x - 1]
                + 2 * p[y, x + 1] - 2 * p[y, x - 1]
                + p[y + 1, x + 1] - p[y + 1, x - 1]
            )
            gy[y, x] = (
                p[y + 1, x - 1] - p[y - 1, x - 1]
                + 2 * p[y + 1, x] - 2 * p[y - 1, x]
                + p[y + 1, x + 1] - p[y - 1, x + 1]
            )
    for g in (gx, gy):
        for (cx, cy, w, h) in cu_boxes:
            # rows first
            g[cy, cx : cx + w] = g[cy + 1, cx : cx + w]
            g[cy + h - 1, cx : cx + w] = g[cy + h - 2, cx : cx + w]
            # then columns (reading the refreshed rows)
            g[cy : cy + h, cx] = g[cy : cy + h, cx + 1]
            g[cy : cy + h, cx + w - 1] = g[cy : cy + h, cx + w - 2]
            # corners from the inner diagonal
            g[cy, cx] = g[cy + 1, cx + 1]
            g[cy, cx + w - 1] = g[cy + 1, cx + w - 2]
            g[cy + h - 1, cx] = g[cy + h - 2, cx + 1]
            g[cy + h - 1, cx + w - 1] = g[cy + h - 2, cx + w - 2]
    return gx, gy


def sobel_cu(pred_cu):
    """Per-CU equivalent: interior Sobel + edge-replicate pad."""
    p = pred_cu.astype(np.int64)
    gx_i = (
        p[:-2, 2:] - p[:-2, :-2] + 2 * p[1:-1, 2:] - 2 * p[1:-1, :-2]
        + p[2:, 2:] - p[2:, :-2]
    )
    gy_i = (
        p[2:, :-2] - p[:-2, :-2] + 2 * p[2:, 1:-1] - 2 * p[:-2, 1:-1]
        + p[2:, 2:] - p[:-2, 2:]
    )
    return (
        np.pad(gx_i, 1, mode="edge"),
        np.pad(gy_i, 1, mode="edge"),
    )


# --- normal equations (affine.cl:671-717) ------------------------------------

def build_system(gx, gy, err, n_cp):
    """Direct per-sample accumulation into the (2nCP)x(2nCP+1) system.

    gx, gy, err: int arrays [h, w] for one CU.  Returns int64 [P, P+1] with
    P = 2*n_cp (matrix rows 1..P of the reference's 7x7 layout, columns
    0..P-1 plus the rhs).
    """
    h, w = err.shape
    P = 2 * n_cp
    A = np.zeros((P, P + 1), np.int64)
    for y in range(h):
        for x in range(w):
            cy = ((y >> 2) << 2) + 2
            cx = ((x >> 2) << 2) + 2
            g1, g2 = int(gx[y, x]), int(gy[y, x])
            if n_cp == 3:
                iC = [g1, cx * g1, g2, cx * g2, cy * g1, cy * g2]
            else:
                iC = [g1, cx * g1 + cy * g2, g2, cy * g1 - cx * g2]
            for col in range(P):
                for row in range(P):
                    A[col, row] += iC[col] * iC[row]
                A[col, P] += (iC[col] * int(err[y, x])) << 3
    return A


# --- solver (affine.cl:782-869, VTM solveEqual) -------------------------------

def solve_system(A_int, n_cp):
    """VTM Gaussian elimination; returns dAffinePara (len 2*n_cp, float64)."""
    order = 2 * n_cp
    # Recreate the reference's 7x7 double layout: rows 1..order hold the
    # system; row 0 is swap scratch (never read after swapping).
    Aref = np.zeros((order + 1, order + 1), np.float64)
    Aref[1 : order + 1, :] = A_int.astype(np.float64)
    x = np.zeros(order, np.float64)
    for i in range(1, order):
        temp = abs(Aref[i][i - 1])
        temp_idx = i
        for j in range(i + 1, order + 1):
            if abs(Aref[j][i - 1]) > temp:
                temp = abs(Aref[j][i - 1])
                temp_idx = j
        if temp_idx != i:
            tmp = Aref[i].copy()
            Aref[i] = Aref[temp_idx]
            Aref[temp_idx] = tmp
        for j in range(i + 1, order + 1):
            for k in range(i, order + 1):
                Aref[j][k] = Aref[j][k] - Aref[i][k] * Aref[j][i - 1] / Aref[i][i - 1]
    with np.errstate(divide="ignore", invalid="ignore"):
        x[order - 1] = Aref[order][order] / Aref[order][order - 1]
        for i in range(order - 2, -1, -1):
            if Aref[i + 1][i] == 0.0:
                x[:] = 0.0
                break
            temp = 0.0
            for j in range(i + 1, order):
                temp += Aref[i + 1][j] * x[j]
            x[i] = (Aref[i + 1][order] - temp) / Aref[i + 1][i]
    return x


def scale_delta_mvs(params, n_cp, w, h):
    """affine params -> six integer CPMV deltas (aux:2194-2215, affine.cl:858-869)."""
    d = np.zeros(8, np.float64)
    d[0] = params[0]
    d[2] = params[2]
    if n_cp == 3:
        d[1] = params[1] * w + params[0]
        d[3] = params[3] * w + params[2]
        d[4] = params[4] * h + params[0]
        d[5] = params[5] * h + params[2]
    else:
        d[1] = params[1] * w + params[0]
        d[3] = -params[3] * w + params[2]
    mult = 1 << (C.AFFINE_MV_PRECISION_QUARTER - C.AFFINE_MV_PRECISION_INT)  # 4
    mv_shift = C.MV_PRECISION_INTERNAL - C.AFFINE_MV_PRECISION_QUARTER  # 2
    out = []
    for k in range(6):
        v = d[k] * mult + (0.5 if d[k] >= 0 else -0.5)
        if np.isnan(v):
            iv = 0
        else:
            iv = int(np.trunc(min(max(v, -2**31), 2**31 - 1)))
        out.append(iv << mv_shift)
    return out  # [LT.x, RT.x(pre-map: see engine), ...] — raw s0..s5 order


# --- PROF (aux_functions.cl:218-605) -----------------------------------------

def prof_deltas(cpmvs, w, h, n_cp):
    """(dMvH, dMvV) int lists of 16, per getHorizontal/VerticalDeltasPROF*."""
    hx, hy, vx, vy = affine_deltas(cpmvs, w, h, n_cp)

    def field(h_step, v_step):
        quad_h = h_step << 2
        quad_v = v_step << 2
        d = [0] * 16
        d[0] = ((h_step + v_step) << 1) - ((quad_h + quad_v) << 1)
        for wv in range(1, 4):
            d[wv] = d[wv - 1] + quad_h
        for hv in range(1, 4):
            for wv in range(4):
                d[hv * 4 + wv] = d[(hv - 1) * 4 + wv] + quad_v
        out = []
        for v in d:
            r = round_mv(v, 8)
            out.append(min(max(r, -31), 31))
        return out

    return field(hx, vx), field(hy, vy)


def prof_apply(pred14, win, x_frac, y_frac, d_hor, d_ver):
    """PROF() (aux:472-605): pred14 = 4x4 at internal precision."""
    x_off = x_frac >> 3
    y_off = y_frac >> 3
    anchor = 3 * 11 + 3
    winf = [int(v) for v in np.ravel(win)]
    padded = [0] * 36
    curr = anchor + y_off * 11 + x_off
    for i in range(4):
        padded[(i + 1) * 6 + 0] = (winf[curr + i * 11 - 1] << 4) - C.IF_INTERNAL_OFFS
        padded[(i + 1) * 6 + 5] = (winf[curr + i * 11 + 4] << 4) - C.IF_INTERNAL_OFFS
    curr = anchor - (1 - y_off) * 11 + x_off - 1
    for i in range(6):
        padded[i] = (winf[curr + i] << 4) - C.IF_INTERNAL_OFFS
        padded[30 + i] = (winf[curr + 5 * 11 + i] << 4) - C.IF_INTERNAL_OFFS
    for i in range(4):
        for j in range(4):
            padded[(i + 1) * 6 + (j + 1)] = int(pred14[i * 4 + j])
    out = []
    for i in range(16):
        r, c = divmod(i, 4)
        pr, pc = r + 1, c + 1
        gx = (padded[pr * 6 + pc + 1] >> 6) - (padded[pr * 6 + pc - 1] >> 6)
        gy = (padded[(pr + 1) * 6 + pc] >> 6) - (padded[(pr - 1) * 6 + pc] >> 6)
        di = gx * d_hor[i] + gy * d_ver[i]
        di = min(max(di, -(1 << 13)), (1 << 13) - 1)
        v = int(pred14[i]) + di
        v = (v + (1 << 3) + C.IF_INTERNAL_OFFS) >> 4
        out.append(min(max(v, 0), 1023))
    return out


def derive_lb_from_2cp(lt, rt, w, h, cu_abs_x, cu_abs_y, fw, fh):
    """3CP predictor LB derivation (affine.cl:83-105)."""
    shift = C.MAX_CU_DEPTH
    log2w, log2h = int(np.log2(w)), int(np.log2(h))
    vx2 = (lt[0] << shift) - ((rt[1] - lt[1]) << (shift + log2h - log2w))
    vy2 = (lt[1] << shift) + ((rt[0] - lt[0]) << (shift + log2h - log2w))
    offset = 1 << (shift - 1)
    vx2 = (vx2 + offset - (1 if vx2 >= 0 else 0)) >> shift
    vy2 = (vy2 + offset - (1 if vy2 >= 0 else 0)) >> shift
    vx2 = min(max(vx2, -(1 << 17)), (1 << 17) - 1)
    vy2 = min(max(vy2, -(1 << 17)), (1 << 17) - 1)
    vx2 = round_affine_prec(vx2, C.AFFINE_MV_PRECISION_QUARTER)
    vy2 = round_affine_prec(vy2, C.AFFINE_MV_PRECISION_QUARTER)
    return clip_mv(vx2, vy2, cu_abs_x, cu_abs_y, fw, fh)
