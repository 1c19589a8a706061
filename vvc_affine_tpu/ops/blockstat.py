"""MXU-routed per-4x4-block reductions over CTU planes.

The dense engine's per-block statistics (SATD, normal-equation moments) need
sums over each 4x4 block of a 128x128 plane.  The sample-major formulation
(`affine_plane._blocks16`) pays a full plane transpose per reduced tensor —
pure relayout traffic the VPU can't hide.  This module keeps everything in
plane space instead:

* sums over the 4 rows of a block are free (the sublane axis splits 128 ->
  (32, 4) contiguously, no relayout);
* sums/transforms over the 4 columns of a block ride the MXU as matmuls with
  tiny constant 0/+-1 matrices (block-diagonal Hadamard, 4->1 summing map).

Exactness: every matmul operates on integer-valued float32 whose products
and partial sums stay below 2^24, so float32 arithmetic is error-free; the
moment path splits its 27-bit inputs into a 12-bit lo / 15-bit hi pair first
(`precision=HIGHEST` keeps the TPU MXU's bf16 passes exact for float32).
Each bound is stated at the call site.  This mirrors the reference's SATD
(aux_functions.cl:1940-2043, the JVET_R0164 mean-scaled 4x4 Hadamard) and
the per-sample moment accumulation (affine.cl:620-752) bit-exactly — the
2-D Hadamard's abs-sum and DC term are invariant to the (signed,
permuted) Hadamard variant used, so the Sylvester matmul form below equals
VTM's butterfly network.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

NB = 32  # 4x4-block slots per CTU axis

# Sylvester 4-point Hadamard (symmetric, H @ H.T = 4 I).
_H4 = np.array(
    [[1, 1, 1, 1],
     [1, -1, 1, -1],
     [1, 1, -1, -1],
     [1, -1, -1, 1]], np.float32)
# Block-diagonal plane forms: right-multiplying a [.., 128] lane axis mixes
# each 4-lane group independently.
_HBLK = np.kron(np.eye(NB, dtype=np.float32), _H4)        # [128, 128]
_S4 = np.kron(np.eye(NB, dtype=np.float32), np.ones((4, 1), np.float32))


def _row4(x):
    """Sum the 4 rows of every block row: [.., 128, L] -> [.., NB, L]."""
    return x.reshape(x.shape[:-2] + (NB, 4, x.shape[-1])).sum(-2)


def _lane4(xf):
    """Sum each 4-lane group via MXU: [.., r, 128] f32 -> [.., r, NB].

    Exact iff every 4-term sum stays below 2^24 (caller-checked).
    """
    return jnp.einsum('...rk,kb->...rb', xf, jnp.asarray(_S4),
                      precision=lax.Precision.HIGHEST)


def satd_blocks(orig_pl, pred_pl):
    """Mean-scaled 4x4 SATD per block, plane-space: -> int32 [.., NB, NB].

    orig_pl/pred_pl: integer planes [.., 128, 128] (broadcastable), samples
    in [0, 1023].  Matches ops.satd.satd_4x4 bit-exactly: the 2-D Hadamard
    is computed as (vertical butterflies) then (lane matmul with the
    block-diagonal Sylvester H4); |d| <= 1023 so the transform magnitudes
    are <= 4092 (stage 1), <= 16368 (stage 2) and the per-block abs-sum is
    <= 261888 — all < 2^24, so the float32 MXU path is error-free.
    """
    d = orig_pl.astype(jnp.int32) - pred_pl.astype(jnp.int32)
    # vertical 4-point Hadamard on sublane groups (free reshape)
    dr = d.reshape(d.shape[:-2] + (NB, 4, 128))
    a, b, c, e = (dr[..., k, :] for k in range(4))
    p, q = a + c, b + e
    r, s = a - c, b - e
    v = jnp.stack([p + q, p - q, r + s, r - s], axis=-2)
    v = v.reshape(d.shape).astype(jnp.float32)
    # horizontal stage: one MXU matmul per plane
    E = jnp.einsum('...yk,kx->...yx', v, jnp.asarray(_HBLK),
                   precision=lax.Precision.HIGHEST)
    sumabs = _lane4(_row4(jnp.abs(E))).astype(jnp.int32)   # <= 16 * 16368
    # DC term (|transform[0,0]| = |block sum of d|) for JVET_R0164 scaling
    dc = _lane4(_row4(d).astype(jnp.float32)).astype(jnp.int32)
    adc = jnp.abs(dc)
    satd = sumabs - adc + (adc >> 2)
    return (satd + 1) >> 1


def block_sums_i64(x):
    """Exact per-block sums of int32 planes: [.., 128, 128] -> i64 [.., NB, NB].

    |x| may use the full moment-product range (< 2^25 per sample, so block
    sums < 2^29).  The sublane sum is int32-exact; the lane sum splits into
    a 12-bit lo / signed hi pair so both float32 matmuls stay below 2^24:
    |hi| <= 2^15, 4-term sums <= 2^17; lo < 2^12, sums < 2^14.
    """
    p4 = _row4(x)                                          # int32, |.| < 2^27
    hi = p4 >> 12
    lo = p4 - (hi << 12)                                   # in [0, 4095]
    hi_s = _lane4(hi.astype(jnp.float32)).astype(jnp.int32)
    lo_s = _lane4(lo.astype(jnp.float32)).astype(jnp.int32)
    return (hi_s.astype(jnp.int64) << 12) + lo_s.astype(jnp.int64)
