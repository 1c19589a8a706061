"""Per-CU 3x3 Sobel gradient with border replication.

Behavioural spec: affine.cl:477-540 — the reference computes the Sobel over
the whole CTU plane (zeroing CTU borders) and then refills every CU's border
rows/cols/corners from the adjacent interior values.  Because the refill
overwrites exactly the samples whose Sobel window crossed a CU boundary, the
net effect per CU is: Sobel of the CU's own prediction on its interior,
replicated outward to the border (rows, then columns, then corners — which is
precisely edge-padding).  This module implements that per-CU form directly;
tests/test_gradient.py proves equivalence against a literal transcription of
the plane+refill procedure.
"""

from __future__ import annotations

import jax.numpy as jnp


def sobel_cu(pred):
    """pred: int32 [..., h, w] (one plane per CU) -> (gx, gy) int32 [..., h, w]."""
    p = pred
    gx_i = (
        p[..., :-2, 2:] - p[..., :-2, :-2]
        + 2 * p[..., 1:-1, 2:] - 2 * p[..., 1:-1, :-2]
        + p[..., 2:, 2:] - p[..., 2:, :-2]
    )
    gy_i = (
        p[..., 2:, :-2] - p[..., :-2, :-2]
        + 2 * p[..., 2:, 1:-1] - 2 * p[..., :-2, 1:-1]
        + p[..., 2:, 2:] - p[..., :-2, 2:]
    )

    def pad_edge(g):
        nb = g.ndim - 2
        pad = [(0, 0)] * nb + [(1, 1), (1, 1)]
        return jnp.pad(g, pad, mode="edge")

    return pad_edge(gx_i), pad_edge(gy_i)
