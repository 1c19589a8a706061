"""Sequential per-CU oracle of a full Affine-ME stage.

Independently re-implements the engine orchestration (CPMV init, the
evaluate/refine iteration schedule, best tracking, out-of-frame masking,
result ordering) on top of the scalar VTM math of oracle/vtm.py, with light
numpy vectorisation per CU.  Used to validate the jitted TPU engine
end-to-end on small frames.
"""

from __future__ import annotations

import numpy as np

from vvc_affine_tpu import constants as C
from vvc_affine_tpu import geometry as G

from . import vtm


def _predict_cu(ref, fw, fh, cu_abs_x, cu_abs_y, w, h, cpmvs, n_cp):
    """All 4x4 sub-block predictions of one CU -> int64 [h, w] plane."""
    coef = C.LUMA_FILTER_4x4.astype(np.int64)
    plane = np.zeros((h, w), np.int64)
    for sy in range(0, h, 4):
        for sx in range(0, w, 4):
            mvx, mvy, _ = vtm.derive_sub_mv(cpmvs, w, h, sx, sy, n_cp)
            mvx, mvy = vtm.round_and_clip_mv(mvx, mvy, cu_abs_x, cu_abs_y, fw, fh)
            ix, fx = mvx >> 4, mvx & 15
            iy, fy = mvy >> 4, mvy & 15
            x0 = cu_abs_x + sx + ix - 3
            y0 = cu_abs_y + sy + iy - 3
            xs = np.clip(x0 + np.arange(11), 0, fw - 1)
            ys = np.clip(y0 + np.arange(11), 0, fh - 1)
            win = ref[np.ix_(ys, xs)].astype(np.int64)
            # horizontal (first pass)
            s1 = C.IF_FILTER_PREC - 4
            o1 = -C.IF_INTERNAL_OFFS << s1
            tmp = np.stack(
                [ (win[:, c : c + 8] @ coef[fx] + o1) >> s1 for c in range(4)],
                axis=1,
            )  # [11, 4]
            s2 = C.IF_FILTER_PREC + 4
            o2 = (1 << (s2 - 1)) + (C.IF_INTERNAL_OFFS << C.IF_FILTER_PREC)
            out = np.stack(
                [ (coef[fy] @ tmp[r : r + 8, :] + o2) >> s2 for r in range(4)],
                axis=0,
            )  # [4, 4]
            plane[sy : sy + 4, sx : sx + 4] = np.clip(out, 0, 1023)
    return plane


def _system_cu(gx, gy, err, n_cp):
    """Direct iC-based system build, numpy-vectorised (int64 exact)."""
    h, w = err.shape
    ys, xs = np.mgrid[0:h, 0:w]
    cy = (((ys >> 2) << 2) + 2).astype(np.int64).ravel()
    cx = (((xs >> 2) << 2) + 2).astype(np.int64).ravel()
    g1 = gx.astype(np.int64).ravel()
    g2 = gy.astype(np.int64).ravel()
    e = err.astype(np.int64).ravel()
    if n_cp == 3:
        iC = np.stack([g1, cx * g1, g2, cx * g2, cy * g1, cy * g2], axis=1)
    else:
        iC = np.stack([g1, cx * g1 + cy * g2, g2, cy * g1 - cx * g2], axis=1)
    P = 2 * n_cp
    A = np.zeros((P, P + 1), np.int64)
    A[:, :P] = iC.T @ iC
    A[:, P] = (iC * e[:, None]).sum(axis=0) << 3
    return A


def run_stage(mode, n_cp, ref, orig, lam, prev_cpmvs=None, extra_iters=0):
    """Run one stage sequentially.

    ref/orig: int arrays [fh, fw]; prev_cpmvs: canonical [nCtu, nCU, 3, 2]
    (required for n_cp == 3).  Returns (costs int64 [nCtu, nCU],
    cpmvs int32 [nCtu, nCU, 3, 2]) in canonical class order.
    """
    fh, fw = ref.shape
    lay = G.layout(mode)
    grid = G.frame_grid(fw, fh)
    ctu_x, ctu_y = grid.ctu_origin()
    n_iters = (5 if n_cp == 2 else 4) + extra_iters

    costs = np.zeros((grid.num_ctus, lay.cus_per_ctu), np.int64)
    out_cp = np.zeros((grid.num_ctus, lay.cus_per_ctu, 3, 2), np.int32)

    for ctu in range(grid.num_ctus):
        for ci, cls in enumerate(lay.classes):
            stride = lay.return_strides[ci]
            for cu in range(cls.num_cus):
                flat = stride + cu
                ax = int(ctu_x[ctu]) + cls.xs[cu]
                ay = int(ctu_y[ctu]) + cls.ys[cu]
                w, h = cls.width, cls.height
                within = ax + w <= fw and ay + h <= fh

                if n_cp == 2:
                    curr = [(0, 0), (0, 0), (0, 0)]
                else:
                    p = prev_cpmvs[ctu, flat]
                    lt = (int(p[0, 0]), int(p[0, 1]))
                    rt = (int(p[1, 0]), int(p[1, 1]))
                    lb = vtm.derive_lb_from_2cp(lt, rt, w, h, ax, ay, fw, fh)
                    curr = [lt, rt, lb]

                best_cost = int(C.MAX_LONG)
                best_cp = [(0, 0), (0, 0), (0, 0)]
                for it in range(n_iters + 1):
                    if within:
                        pred = _predict_cu(ref, fw, fh, ax, ay, w, h, curr, n_cp)
                        satd = 0
                        o = orig[ay : ay + h, ax : ax + w]
                        for sy in range(0, h, 4):
                            for sx in range(0, w, 4):
                                satd += vtm.satd_4x4(
                                    o[sy : sy + 4, sx : sx + 4],
                                    pred[sy : sy + 4, sx : sx + 4],
                                )
                    else:
                        satd = 0
                    bits = vtm.calc_affine_bits(
                        curr, [(0, 0), (0, 0), (0, 0)], n_cp
                    )
                    cost = satd + vtm.rd_cost(bits + C.RUI_BITS, lam)
                    if cost < best_cost:
                        best_cost = cost
                        best_cp = list(curr)
                    if it == n_iters:
                        break
                    if within:
                        gx, gy = vtm.sobel_cu(pred)
                        err = o.astype(np.int64) - pred
                        A = _system_cu(gx, gy, err, n_cp)
                    else:
                        A = np.zeros((2 * n_cp, 2 * n_cp + 1), np.int64)
                    params = vtm.solve_system(A, n_cp)
                    raw = vtm.scale_delta_mvs(params, n_cp, w, h)
                    d = [
                        (raw[0], raw[2]),  # LT += (f(d0), f(d2))
                        (raw[1], raw[3]),  # RT += (f(d1), f(d3))
                        (raw[4], raw[5]),  # LB += (f(d4), f(d5))
                    ]
                    nxt = []
                    for k in range(3):
                        x = min(max(curr[k][0] + d[k][0], C.MV_MIN), C.MV_MAX)
                        y = min(max(curr[k][1] + d[k][1], C.MV_MIN), C.MV_MAX)
                        nxt.append(vtm.clip_mv(x, y, ax, ay, fw, fh))
                    curr = nxt

                costs[ctu, flat] = best_cost
                out_cp[ctu, flat] = np.asarray(best_cp, np.int32)
    return costs, out_cp
