"""Motion-compensated 4x4 sub-block prediction: window gather + 8-tap filter.

Behavioural spec:
  * window fetch with 8-way out-of-frame correction (affine.cl:254-326) —
    provably equivalent to clamp-to-edge sample indexing, realised here as a
    single clamped gather from the HBM-resident reference plane;
  * separable 1/16-pel 8-tap interpolation with VTM's first/last-pass
    offset/shift scheme (aux_functions.cl:1096-1223).

Exactness: the horizontal pass sums |coef|*1023 <= 2^17 and the vertical pass
<= 2^23, so int32 arithmetic is exact; shifts are arithmetic.
"""

from __future__ import annotations

import jax.numpy as jnp

from vvc_affine_tpu import constants as C
from vvc_affine_tpu.utils.bitmath import clamp

_SHIFT1 = C.IF_FILTER_PREC - 4  # 2; first-pass shift
_OFF1 = -C.IF_INTERNAL_OFFS << _SHIFT1
_SHIFT2 = C.IF_FILTER_PREC + 4  # 10; last-pass shift
_OFF2 = (1 << (_SHIFT2 - 1)) + (C.IF_INTERNAL_OFFS << C.IF_FILTER_PREC)


def gather_windows(ref_flat, frame_w: int, frame_h: int, bx, by, mv_int_x, mv_int_y):
    """Clamped 11x11 reference windows.

    ref_flat: int32 [frame_h*frame_w]; bx/by: absolute sub-block corners
    [...]; mv_int_*: integer-pel MV parts [...].
    Returns int32 [..., 11, 11].
    """
    x0 = bx + mv_int_x - (C.NTAPS_LUMA // 2 - 1)
    y0 = by + mv_int_y - (C.NTAPS_LUMA // 2 - 1)
    taps = jnp.arange(11, dtype=jnp.int32)
    xs = clamp(x0[..., None] + taps, 0, frame_w - 1)  # [..., 11]
    ys = clamp(y0[..., None] + taps, 0, frame_h - 1)
    idx = ys[..., :, None] * frame_w + xs[..., None, :]  # [..., 11, 11]
    return jnp.take(ref_flat, idx, mode="clip")


def filter_windows(windows, x_frac, y_frac, last: bool = True):
    """Separable 8-tap over 11x11 windows -> 4x4 predictions.

    windows: int32 [..., 11, 11]; x_frac/y_frac: int32 [...] in [0, 15].
    Returns int32 [..., 16] (row-major 4x4).  With ``last`` (the shipping
    path) the result is scaled back to sample range and clipped to
    [0, 1023]; with ``last=False`` it stays at the 14-bit internal
    precision (the vertical-pass isLast=false branch, aux:1185-1195, used
    when PROF follows).
    """
    bank = jnp.asarray(C.LUMA_FILTER_4x4)  # [16, 8]
    hcoef = jnp.take(bank, x_frac, axis=0)  # [..., 8]
    vcoef = jnp.take(bank, y_frac, axis=0)
    # horizontal pass: rows 0..10, output cols 0..3
    tmp = None
    for c in range(4):
        acc = windows[..., :, c] * hcoef[..., None, 0]
        for t in range(1, 8):
            acc = acc + windows[..., :, c + t] * hcoef[..., None, t]
        col = (acc + _OFF1) >> _SHIFT1  # [..., 11]
        tmp = col[..., None] if tmp is None else jnp.concatenate(
            [tmp, col[..., None]], axis=-1
        )
    # tmp: [..., 11, 4]
    shift2, off2 = (_SHIFT2, _OFF2) if last else (C.IF_FILTER_PREC, 0)
    out = None
    for r in range(4):
        acc = tmp[..., r, :] * vcoef[..., None, 0]
        for t in range(1, 8):
            acc = acc + tmp[..., r + t, :] * vcoef[..., None, t]
        row = (acc + off2) >> shift2  # [..., 4]
        out = row[..., None, :] if out is None else jnp.concatenate(
            [out, row[..., None, :]], axis=-2
        )
    # out: [..., 4, 4]
    if last:
        out = clamp(out, C.CLP_RNG_MIN, C.CLP_RNG_MAX)
    return out.reshape(out.shape[:-2] + (16,))


def predict_subblocks(ref_flat, frame_w: int, frame_h: int, bx, by, mvx, mvy):
    """Full MC prediction from rounded+clipped 1/16-pel MVs.

    mvx/mvy: int32 [...] (post roundAndClipMv).  Returns int32 [..., 16].
    """
    mv_int_x = mvx >> 4
    mv_int_y = mvy >> 4
    x_frac = mvx & 15
    y_frac = mvy & 15
    win = gather_windows(ref_flat, frame_w, frame_h, bx, by, mv_int_x, mv_int_y)
    return filter_windows(win, x_frac, y_frac)


def gather_blocks(plane_flat, frame_w: int, frame_h: int, bx, by):
    """4x4 blocks at absolute corners (bx, by), clamped indices.

    Returns int32 [..., 16].
    """
    taps = jnp.arange(4, dtype=jnp.int32)
    xs = clamp(bx[..., None] + taps, 0, frame_w - 1)
    ys = clamp(by[..., None] + taps, 0, frame_h - 1)
    idx = ys[..., :, None] * frame_w + xs[..., None, :]
    vals = jnp.take(plane_flat, idx, mode="clip")
    return vals.reshape(vals.shape[:-2] + (16,))
