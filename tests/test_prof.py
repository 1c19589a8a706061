"""PROF parity: delta fields + refinement vs the oracle transcription."""

import numpy as np
import pytest

import jax.numpy as jnp

from vvc_affine_tpu.ops import interp as interp_ops
from vvc_affine_tpu.ops import prof as prof_ops

from .oracle import vtm

RNG = np.random.default_rng(21)


@pytest.mark.parametrize("n_cp", [2, 3])
@pytest.mark.parametrize("w,h", [(16, 16), (64, 32)])
def test_prof_delta_fields(n_cp, w, h):
    n = 64
    cp = RNG.integers(-4000, 4000, size=(n, 3, 2)).astype(np.int32)
    dh, dv = prof_ops.prof_delta_fields(
        jnp.asarray(cp), int(np.log2(w)), int(np.log2(h)), n_cp
    )
    for i in range(0, n, 5):
        cpmvs = [tuple(int(x) for x in cp[i, j]) for j in range(3)]
        eh, ev = vtm.prof_deltas(cpmvs, w, h, n_cp)
        np.testing.assert_array_equal(np.asarray(dh[i]), eh)
        np.testing.assert_array_equal(np.asarray(dv[i]), ev)


def test_prof_application():
    n = 128
    win = RNG.integers(0, 1024, size=(n, 11, 11)).astype(np.int32)
    xf = RNG.integers(0, 16, size=n).astype(np.int32)
    yf = RNG.integers(0, 16, size=n).astype(np.int32)
    pred14 = interp_ops.filter_windows(jnp.asarray(win), jnp.asarray(xf),
                                       jnp.asarray(yf), last=False)
    dh = RNG.integers(-31, 32, size=(n, 16)).astype(np.int32)
    dv = RNG.integers(-31, 32, size=(n, 16)).astype(np.int32)
    out = prof_ops.apply_prof(
        pred14, jnp.asarray(win), jnp.asarray(xf), jnp.asarray(yf),
        jnp.asarray(dh), jnp.asarray(dv),
    )
    pred14_np = np.asarray(pred14)
    out_np = np.asarray(out)
    for i in range(0, n, 7):
        exp = vtm.prof_apply(pred14_np[i], win[i], int(xf[i]), int(yf[i]),
                             dh[i], dv[i])
        np.testing.assert_array_equal(out_np[i], exp)
