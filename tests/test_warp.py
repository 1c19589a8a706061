"""Parity tests for the dense warp paths (ops/warp.py).

warp_xla is validated against interp_ops (the original gather+filter pair,
itself bit-exact vs the NumPy VTM oracle); warp_pallas (interpret mode) is
validated against warp_xla for in-range displacements, including frame-edge
clamping.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vvc_affine_tpu import constants as C
from vvc_affine_tpu import geometry as G
from vvc_affine_tpu.ops import interp as interp_ops
from vvc_affine_tpu.ops import warp as warp_ops

FW, FH = 416, 240


def _mk(seed, lo, hi, shape):
    rng = np.random.default_rng(seed)
    return rng.integers(lo, hi, size=shape).astype(np.int32)


def _setup(seed, n_cls, dmax):
    grid = G.frame_grid(FW, FH)
    n_ctu = grid.num_ctus
    ctu_x, ctu_y = grid.ctu_origin()
    ref = jnp.asarray(_mk(seed, 0, 1024, (FH * FW,)))
    dy = jnp.asarray(_mk(seed + 1, -dmax, dmax + 1, (n_ctu, n_cls, 32, 32)))
    dx = jnp.asarray(_mk(seed + 2, -dmax, dmax + 1, (n_ctu, n_cls, 32, 32)))
    bank = np.asarray(C.LUMA_FILTER_4x4, np.int64)
    fx = _mk(seed + 3, 0, 16, (n_ctu, n_cls, 32, 32))
    fy = _mk(seed + 4, 0, 16, (n_ctu, n_cls, 32, 32))
    hc = jnp.asarray(np.moveaxis(bank[fx], -1, 2).astype(np.int32))
    vc = jnp.asarray(np.moveaxis(bank[fy], -1, 2).astype(np.int32))
    return grid, ref, jnp.asarray(ctu_y), jnp.asarray(ctu_x), dy, dx, hc, vc, fx, fy


def test_warp_xla_matches_interp():
    grid, ref, ctu_y, ctu_x, dy, dx, hc, vc, fx, fy = _setup(0, 2, 40)
    pred = np.asarray(warp_ops.warp_xla(ref, FW, FH, ctu_y, ctu_x,
                                        dy, dx, hc, vc))
    # spot-check blocks via the original per-sub-block path
    rng = np.random.default_rng(5)
    for _ in range(64):
        t = rng.integers(grid.num_ctus)
        c = rng.integers(2)
        by = rng.integers(32)
        bx = rng.integers(32)
        ay = int(ctu_y[t]) + 4 * by
        ax = int(ctu_x[t]) + 4 * bx
        mvy = (int(dy[t, c, by, bx]) << 4) | int(fy[t, c, by, bx])
        mvx = (int(dx[t, c, by, bx]) << 4) | int(fx[t, c, by, bx])
        blk = interp_ops.predict_subblocks(
            ref, FW, FH, jnp.int32(ax), jnp.int32(ay),
            jnp.int32(mvx), jnp.int32(mvy))
        got = pred[t, c, 4 * by:4 * by + 4, 4 * bx:4 * bx + 4].reshape(16)
        assert np.array_equal(np.asarray(blk), got), (t, c, by, bx)


@pytest.mark.parametrize("R", [4, 8, 16])
def test_warp_pallas_matches_xla(R):
    grid, ref, ctu_y, ctu_x, dy, dx, hc, vc, _, _ = _setup(10 + R, 2, R)
    want = np.asarray(warp_ops.warp_xla(ref, FW, FH, ctu_y, ctu_x,
                                        dy, dx, hc, vc))
    refpad = warp_ops.build_refpad(ref, FW, FH, grid.ctu_rows, grid.ctu_cols)
    got = np.asarray(warp_ops.warp_pallas(
        refpad,
        warp_ops.expand_lanes(dy), warp_ops.expand_lanes(dx),
        warp_ops.expand_lanes(hc), warp_ops.expand_lanes(vc),
        grid.ctu_rows, grid.ctu_cols, R=R, interpret=True))
    assert np.array_equal(want, got)


def test_escape_fixup_exact():
    """Blocks with |d| > R are recomputed exactly (interpret-mode kernel)."""
    from vvc_affine_tpu.models import affine_plane as ap

    rng = np.random.default_rng(3)
    ref = jnp.asarray(rng.integers(0, 1024, size=(FH * FW,)).astype(np.int32))
    orig = jnp.asarray(rng.integers(0, 1024, size=(FH * FW,)).astype(np.int32))
    spec_fast = ap.PlaneSpec("full", 2, FW, FH, use_pallas=True,
                             interpret=True, R=4, escape_budget=8192)
    spec_ref = ap.PlaneSpec("full", 2, FW, FH, use_pallas=False)
    t = ap.build_tables(spec_fast)
    within = jnp.asarray(t.within)
    # CPMVs with a large uniform translation (40 px = 640 sixteenth-pel):
    # every block displacement escapes R=4
    cp = jnp.zeros((t.n_ctus, t.n_cus, 3, 2), jnp.int32)
    cp = cp.at[..., :, 0].set(640).at[..., :, 1].set(-320)
    from vvc_affine_tpu.ops import warp as warp_ops
    refpad = warp_ops.build_refpad(ref, FW, FH, t.n_ctu_y, t.n_ctu_x)
    oh, ow = 128 * t.n_ctu_y, 128 * t.n_ctu_x
    orig2d = jnp.pad(orig.reshape(FH, FW), ((0, oh - FH), (0, ow - FW)))
    orig_pl = orig2d.reshape(t.n_ctu_y, 128, t.n_ctu_x, 128)
    orig_pl = orig_pl.transpose(0, 2, 1, 3).reshape(t.n_ctus, 128, 128)
    orig16 = ap._blocks16(orig_pl)
    s_fast, _, _ = ap._evaluate(spec_fast, t, ref, refpad, orig16, cp,
                                within, False)
    s_ref, _, _ = ap._evaluate(spec_ref, t, ref, refpad, orig16, cp,
                               within, False)
    assert np.array_equal(np.asarray(s_fast), np.asarray(s_ref))
