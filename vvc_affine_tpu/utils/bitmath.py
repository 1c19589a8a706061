"""Exact integer helpers shared by the batched ops.

All shifts on signed ints in JAX are arithmetic (lax.shift_right_arithmetic),
matching the C semantics of the VTM math.
"""

from __future__ import annotations

import jax.numpy as jnp


def round_shift(v: jnp.ndarray, shift: int) -> jnp.ndarray:
    """VTM MV rounding: (v + (1<<(s-1)) - (v>=0)) >> s   (aux_functions.cl:38-47)."""
    offset = 1 << (shift - 1)
    return (v + offset - (v >= 0).astype(v.dtype)) >> shift


def floor_log2(x: jnp.ndarray) -> jnp.ndarray:
    """floor(log2(x)) for int32 x >= 1, exact (bit-cascade, no floats)."""
    x = x.astype(jnp.int32)
    r = jnp.zeros_like(x)
    for s in (16, 8, 4, 2, 1):
        hit = x >= (1 << s)
        r = r + jnp.where(hit, s, 0)
        x = jnp.where(hit, x >> s, x)
    return r


def clamp(v, lo, hi):
    return jnp.minimum(jnp.maximum(v, lo), hi)
