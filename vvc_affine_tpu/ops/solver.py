"""Batched VTM least-squares solver and CPMV delta scaling.

Behavioural spec: affine.cl:782-915 — VTM-12.0 solveEqual() (float64 Gaussian
elimination with column-max pivoting, no early return) followed by the affine
parameter -> quarter-pel delta-MV conversion of scaleDeltaMvs
(aux_functions.cl:2194-2215) and the dDeltaMv composition (affine.cl:858-869).

The elimination runs vectorised over the CU batch with static loops over the
(tiny) parameter dimension.  Floating-point operation ORDER matches the
reference exactly (multiply-then-divide per element; ordered back-substitution
sums) so results are bit-identical wherever f64 arithmetic is IEEE.
"""

from __future__ import annotations

import jax.numpy as jnp

from vvc_affine_tpu import constants as C


def solve_affine(M, rhs, n_cp: int):
    """Solve the per-CU systems.

    M: int64 [..., P, P]; rhs: int64 [..., P]; P = 2*n_cp.
    Returns float64 dAffinePara [..., P].

    Layout note: the reference's dEqualCoeff row r (1-based, r=1..P) is our
    row r-1; its columns 0..P-1 are the matrix (M[q][p] at column p of row
    q+1) and column P the rhs.
    """
    P = 2 * n_cp
    # Flatten batch dims: multi-dim batches trigger a libtpu kernel fault in
    # the emulated-f64 path at some shapes (e.g. [135, 284, 4, 4] crashes the
    # TPU worker; the flat [38340, 4, 4] form is fine).  Bit-identical either
    # way, so always solve on the flattened batch.
    batch_shape = M.shape[:-2]
    M = M.reshape((-1,) + M.shape[-2:])
    rhs = rhs.reshape((-1,) + rhs.shape[-1:])
    B = jnp.concatenate(
        [M.astype(jnp.float64), rhs.astype(jnp.float64)[..., None]], axis=-1
    )  # [..., P, P+1]

    row_ids = jnp.arange(P)
    # forward elimination (reference i = 1..P-1; pivot row r0 = i-1, col i-1)
    for i in range(1, P):
        r0 = i - 1
        col = jnp.abs(B[..., :, i - 1])  # [..., P]
        # candidates are rows r0.. (ref scans j=i+1..P with init j=i)
        cand = jnp.where(row_ids >= r0, col, -jnp.inf)
        # ref keeps the FIRST max only when strictly greater than earlier
        # candidates: argmax of a reversed strict scan == first index of max
        # with > comparisons == jnp.argmax semantics (first occurrence).
        amax = jnp.argmax(cand, axis=-1)  # [...]
        # swap rows r0 <-> amax, gather-free: take_along_axis on emulated
        # f64 data faults libtpu (TPU worker crash) at some batch shapes,
        # and arithmetic selects are faster anyway.
        amax_oh = row_ids == amax[..., None]  # [..., P] one-hot
        B_amax = jnp.sum(jnp.where(amax_oh[..., None], B, 0.0), axis=-2)
        B_r0 = B[..., r0, :]
        is_r0 = (row_ids == r0)[:, None]
        B = jnp.where(
            is_r0,
            B_amax[..., None, :],
            jnp.where(amax_oh[..., None], B_r0[..., None, :], B),
        )
        # eliminate rows r > r0, columns k >= i
        pivot_row = B[..., r0, :]  # [..., P+1]
        pivot = B[..., r0, i - 1]  # [...]
        lead = B[..., :, i - 1]  # [..., P]
        upd = B - (pivot_row[..., None, :] * lead[..., :, None]) / pivot[..., None, None]
        row_mask = (row_ids > r0)[..., :, None]
        col_mask = (jnp.arange(P + 1) >= i)[None, :]
        B = jnp.where(row_mask & col_mask, upd, B)

    # back substitution (reference affine.cl:834-855)
    x = [None] * P
    x[P - 1] = B[..., P - 1, P] / B[..., P - 1, P - 1]
    dead = jnp.zeros(B.shape[:-2], dtype=bool)
    for i in range(P - 2, -1, -1):
        dead = dead | (B[..., i, i] == 0.0)
        temp = jnp.zeros(B.shape[:-2], jnp.float64)
        for j in range(i + 1, P):
            temp = temp + B[..., i, j] * x[j]
        x[i] = (B[..., i, P] - temp) / B[..., i, i]
    params = jnp.stack(x, axis=-1)
    params = jnp.where(dead[..., None], 0.0, params)
    return params.reshape(batch_shape + (P,))


def scale_delta_mvs(params, n_cp: int, cu_w, cu_h):
    """dAffinePara -> int32 CPMV deltas [..., 3, 2] ((LT,RT,LB) x (x,y)).

    cu_w/cu_h: int32 [...] CU dimensions.  Implements the dDeltaMv
    composition (affine.cl:858-869), scaleDeltaMvs' truncate-toward-zero
    quarter-pel rounding (aux:2203-2210), and the s0..s5 -> CPMV mapping
    (affine.cl:884-889).  NaN parameters (degenerate systems whose zero-pivot
    path did not trigger) convert to 0, matching GPU float-to-int semantics.
    """
    w = cu_w.astype(jnp.float64)
    h = cu_h.astype(jnp.float64)
    p = params
    d0 = p[..., 0]
    d2 = p[..., 2]
    d1 = p[..., 1] * w + p[..., 0]
    if n_cp == 3:
        d3 = p[..., 3] * w + p[..., 2]
        d4 = p[..., 4] * h + p[..., 0]
        d5 = p[..., 5] * h + p[..., 2]
    else:
        d3 = -p[..., 3] * w + p[..., 2]
        d4 = jnp.zeros_like(d0)
        d5 = jnp.zeros_like(d0)

    mult = 1 << (C.AFFINE_MV_PRECISION_QUARTER - C.AFFINE_MV_PRECISION_INT)  # 4
    mv_shift = C.MV_PRECISION_INTERNAL - C.AFFINE_MV_PRECISION_QUARTER  # 2

    def quantise(d):
        v = d * mult + jnp.where(d >= 0, 0.5, -0.5)  # SIGN(x>=0)=+1
        v = jnp.where(jnp.isnan(v), 0.0, jnp.clip(v, -(2.0**31), 2.0**31 - 1))
        return jnp.trunc(v).astype(jnp.int32) << mv_shift

    # s0->LT.x, s1(=f(d2))->LT.y, s2(=f(d1))->RT.x, s3->RT.y, s4->LB.x, s5->LB.y
    lt = jnp.stack([quantise(d0), quantise(d2)], axis=-1)
    rt = jnp.stack([quantise(d1), quantise(d3)], axis=-1)
    lb = jnp.stack([quantise(d4), quantise(d5)], axis=-1)
    return jnp.stack([lt, rt, lb], axis=-2)
