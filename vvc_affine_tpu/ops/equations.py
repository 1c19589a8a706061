"""Normal-equation assembly for gradient-based CPMV refinement.

Behavioural spec: affine.cl:671-717 — for every sample of a CU, coefficients
iC are built from the Sobel gradients and the sample's sub-block centre
(cx, cy), and the (2nCP)x(2nCP) system M = sum iC iC^T, rhs = sum (iC*err)<<3
is accumulated in int64.

TPU-native reformulation (exact): every iC is a linear form
    iC_p = a_p(cx,cy) * gx + b_p(cx,cy) * gy
with (a_p, b_p) constant per sub-block, so
    sum_samples iC_p iC_q = sum_subblocks [ a_p a_q * m20 + (a_p b_q + a_q b_p)
                            * m11 + b_p b_q * m02 ]
where m20/m11/m02 are the per-sub-block gradient moments sum(gx*gx),
sum(gx*gy), sum(gy*gy), and likewise rhs uses sum(gx*err), sum(gy*err).
Only 5 int64 products per sample instead of P^2+P, and the combination with
the static factor tensors runs at sub-block granularity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class SubblockFactors(NamedTuple):
    """Static per-sub-block linear-form factors for one CU shape."""

    aa: np.ndarray  # int64 [S, P, P]  a_p*a_q
    ab: np.ndarray  # int64 [S, P, P]  a_p*b_q + a_q*b_p
    bb: np.ndarray  # int64 [S, P, P]  b_p*b_q
    a: np.ndarray   # int64 [S, P]
    b: np.ndarray   # int64 [S, P]


def subblock_factors(sb_rows: int, sb_cols: int, n_cp: int) -> SubblockFactors:
    """Factors for a CU with sb_rows x sb_cols sub-blocks (raster order).

    cx/cy are the sub-block centres in CU-local sample coordinates
    (affine.cl:680-681): cx = 4*col + 2, cy = 4*row + 2.
    """
    P = 2 * n_cp
    S = sb_rows * sb_cols
    a = np.zeros((S, P), np.int64)
    b = np.zeros((S, P), np.int64)
    for s in range(S):
        cx = (s % sb_cols) * 4 + 2
        cy = (s // sb_cols) * 4 + 2
        if n_cp == 3:
            # iC = [gx, cx*gx, gy, cx*gy, cy*gx, cy*gy] (affine.cl:684-689)
            a[s] = [1, cx, 0, 0, cy, 0]
            b[s] = [0, 0, 1, cx, 0, cy]
        else:
            # iC = [gx, cx*gx + cy*gy, gy, cy*gx - cx*gy] (affine.cl:691-694)
            a[s] = [1, cx, 0, cy]
            b[s] = [0, cy, 1, -cx]
    aa = np.einsum("sp,sq->spq", a, a)
    bb = np.einsum("sp,sq->spq", b, b)
    ab = np.einsum("sp,sq->spq", a, b) + np.einsum("sp,sq->spq", b, a)
    return SubblockFactors(aa, ab, bb, a, b)


def gradient_moments(gx, gy, err):
    """Per-sub-block int64 moments.

    gx/gy/err: int32 [..., h, w] -> five arrays int64 [..., h//4 * w//4].
    """
    h, w = gx.shape[-2], gx.shape[-1]
    sh, sw = h // 4, w // 4

    def blocks(x):
        x = x.astype(jnp.int64)
        x = x.reshape(x.shape[:-2] + (sh, 4, sw, 4))
        return x

    gxb, gyb, eb = blocks(gx), blocks(gy), blocks(err)

    def moment(u, v):
        m = (u * v).sum(axis=(-3, -1))  # [..., sh, sw]
        return m.reshape(m.shape[:-2] + (sh * sw,))

    return (
        moment(gxb, gxb),
        moment(gxb, gyb),
        moment(gyb, gyb),
        moment(gxb, eb),
        moment(gyb, eb),
    )


def assemble_system(m20, m11, m02, me1, me2, fac: SubblockFactors):
    """Moments [..., S] + static factors -> (M [..., P, P], rhs [..., P]).

    Exact int64; the rhs carries the reference's <<3 scaling
    (affine.cl:704).
    """
    P = fac.a.shape[1]
    rows = []
    cache = {}
    for p in range(P):
        row = []
        for q in range(P):
            if (q, p) in cache:
                row.append(cache[(q, p)])
                continue
            aa = jnp.asarray(fac.aa[:, p, q])
            ab = jnp.asarray(fac.ab[:, p, q])
            bb = jnp.asarray(fac.bb[:, p, q])
            term = (m20 * aa + m11 * ab + m02 * bb).sum(axis=-1)
            cache[(p, q)] = term
            row.append(term)
        rows.append(jnp.stack(row, axis=-1))
    M = jnp.stack(rows, axis=-2)  # [..., P, P]
    rhs_cols = []
    for p in range(P):
        av = jnp.asarray(fac.a[:, p])
        bv = jnp.asarray(fac.b[:, p])
        rhs_cols.append(((me1 * av + me2 * bv).sum(axis=-1)) << 3)
    rhs = jnp.stack(rhs_cols, axis=-1)
    return M, rhs
