"""Parity tests for the dense warp paths (ops/warp.py).

warp_xla is validated against interp_ops (the original gather+filter pair,
itself bit-exact vs the NumPy VTM oracle); warp_pallas (interpret mode) is
validated against warp_xla for in-range displacements, including frame-edge
clamping.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests._child import run_in_child

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
    # 6-tap convention: bank columns 1..6 (0 and 7 are zero in every phase)
    bank = np.asarray(C.LUMA_FILTER_4x4, np.int64)[:, 1:7]
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


def _tiles_of(ref, grid):
    refpad = warp_ops.build_refpad(ref, FW, FH, grid.ctu_rows, grid.ctu_cols)
    return warp_ops.build_tiles(refpad, grid.ctu_rows, grid.ctu_cols)


@pytest.mark.parametrize("R", [2, 4, 8, 16])
def test_warp_pallas_matches_xla(R):
    grid, ref, ctu_y, ctu_x, dy, dx, hc, vc, _, _ = _setup(10 + R, 2, R)
    want = np.asarray(warp_ops.warp_xla(ref, FW, FH, ctu_y, ctu_x,
                                        dy, dx, hc, vc))
    got = np.asarray(warp_ops.warp_pallas(
        _tiles_of(ref, grid),
        warp_ops.expand_lanes(dy), warp_ops.expand_lanes(dx),
        warp_ops.expand_lanes(hc), warp_ops.expand_lanes(vc),
        R=R, interpret=True))
    assert np.array_equal(want, got)


def test_build_tiles_4k_geometry():
    """Tile extraction is exact at the 4K workload size (510 CTUs).

    The reference's largest supported resolution (constants.h:73-79).
    Validates the overlapping reshape/concat construction against direct
    refpad slicing for every CTU — the axis the old whole-refpad-in-VMEM
    kernel could not scale (VMEM), which tiles fix.
    """
    fw, fh = 3840, 2160
    ny, nx = 17, 30
    rng = np.random.default_rng(9)
    ref = jnp.asarray(
        rng.integers(0, 1024, size=(fh * fw,)).astype(np.int32))
    refpad = np.asarray(warp_ops.build_refpad(ref, fw, fh, ny, nx))
    tiles = np.asarray(warp_ops.build_tiles(jnp.asarray(refpad), ny, nx))
    assert tiles.shape == (510, warp_ops.TILE_H, warp_ops.TILE_W)
    r0 = warp_ops.PAD - warp_ops.TILE_TOP
    for ty in (0, 1, 8, 16):
        for tx in (0, 1, 15, 29):
            want = refpad[128 * ty + r0:128 * ty + r0 + warp_ops.TILE_H,
                          128 * tx:128 * tx + warp_ops.TILE_W]
            np.testing.assert_array_equal(
                tiles[ty * nx + tx], want, err_msg=f"{ty},{tx}")


def _eval_setup(seed):
    from vvc_affine_tpu.models import affine_plane as ap

    rng = np.random.default_rng(seed)
    ref = jnp.asarray(rng.integers(0, 1024, size=(FH * FW,)).astype(np.int32))
    orig = jnp.asarray(rng.integers(0, 1024, size=(FH * FW,)).astype(np.int32))
    return ap, ref, orig


def _eval(ap, spec, t, ref, orig, cp):
    tiles, orig_pl, _ = ap.prep_inputs(spec, t, ref, orig)
    satd, _, _, telem = ap._evaluate(
        spec, t, ap.dyn_tables(t), ref, tiles, ap._orig_forms(spec, orig_pl),
        cp, False)
    return satd, telem


@run_in_child
def test_escape_fallback_exact():
    """Beyond-budget escapes trigger the exact whole-frame fallback."""
    from vvc_affine_tpu.models import affine_plane as ap

    ap, ref, orig = _eval_setup(3)
    spec_fast = ap.PlaneSpec("full", 2, FW, FH, use_pallas=True,
                             interpret=True, R=4, escape_budget=512,
                             adaptive=False)
    spec_ref = ap.PlaneSpec("full", 2, FW, FH, use_pallas=False)
    t = ap.build_tables(spec_fast)
    # CPMVs with a large uniform translation (40 px = 640 sixteenth-pel):
    # every block displacement escapes R=4, blowing the 512-slot budget
    cp = jnp.zeros((t.n_ctus, t.n_cus, 3, 2), jnp.int32)
    cp = cp.at[..., :, 0].set(640).at[..., :, 1].set(-320)
    s_fast, telem = _eval(ap, spec_fast, t, ref, orig, cp)
    s_ref, _ = _eval(ap, spec_ref, t, ref, orig, cp)
    assert int(telem.n_fallbacks) == 1
    assert np.array_equal(np.asarray(s_fast), np.asarray(s_ref))


@run_in_child
def test_escape_scatter_exact():
    """A handful of escaped CUs go through the two-level compaction +
    per-block exact fix-up scatter (NOT the whole-frame fallback), and the
    result is bit-identical to the gather path."""
    from vvc_affine_tpu.models import affine_plane as ap

    ap, ref, orig = _eval_setup(4)
    spec_fast = ap.PlaneSpec("full", 2, FW, FH, use_pallas=True,
                             interpret=True, R=4, escape_budget=4096,
                             adaptive=False)
    spec_ref = ap.PlaneSpec("full", 2, FW, FH, use_pallas=False)
    t = ap.build_tables(spec_fast)
    # all-zero motion except three 32x32 CUs with a 9-px translation:
    # 0 < n_esc <= budget and n_groups <= GT, so the scatter path runs
    cp = jnp.zeros((t.n_ctus, t.n_cus, 3, 2), jnp.int32)
    s32 = t.strides[6]  # 32x32 class offset (canonical order)
    for ctu, cu in ((0, 0), (1, 3), (3, 7)):
        cp = cp.at[ctu, s32 + cu, :, 0].set(144).at[ctu, s32 + cu, :, 1].set(-144)
    s_fast, telem = _eval(ap, spec_fast, t, ref, orig, cp)
    s_ref, _ = _eval(ap, spec_ref, t, ref, orig, cp)
    n_esc = int(telem.n_escapes)
    assert 0 < n_esc <= 4096 and int(telem.n_fallbacks) == 0, n_esc
    assert np.array_equal(np.asarray(s_fast), np.asarray(s_ref))


@run_in_child
def test_adaptive_dispatch_exact():
    """The magnitude-keyed (legacy, rebase=False) R-ladder dispatcher is
    exact at every rung boundary.  rebase is pinned OFF here: these
    telemetry expectations (outliers reaching the escape fix-up) are
    specific to magnitude keying — under the shipped rebase=True default
    the per-slab base absorbs them (covered by
    test_adaptive_dispatch_rebased_telemetry below)."""
    from vvc_affine_tpu.models import affine_plane as ap

    ap, ref, orig = _eval_setup(5)
    spec_fast = ap.PlaneSpec("full", 2, FW, FH, use_pallas=True,
                             interpret=True, R=8, rebase=False)
    spec_ref = ap.PlaneSpec("full", 2, FW, FH, use_pallas=False)
    assert spec_fast.r_ladder == (1, 2, 4, 8)
    t = ap.build_tables(spec_fast)
    for mv in (16, 32, 48, 64, 80, 128):   # maxd = 1, 2, 3, 4, 5, 8
        cp = jnp.full((t.n_ctus, t.n_cus, 3, 2), mv, jnp.int32)
        s_fast, _ = _eval(ap, spec_fast, t, ref, orig, cp)
        s_ref, _ = _eval(ap, spec_ref, t, ref, orig, cp)
        assert np.array_equal(np.asarray(s_fast), np.asarray(s_ref)), mv
    # mostly-small motion + a few 6-px outlier CUs: a narrow rung wins and
    # the escaped-slab second pass fixes the outliers (no gather fix-up)
    cp = jnp.full((t.n_ctus, t.n_cus, 3, 2), 16, jnp.int32)
    s32 = t.strides[6]
    for ctu, cu in ((0, 1), (2, 5)):
        cp = cp.at[ctu, s32 + cu, :, 0].set(96).at[ctu, s32 + cu, :, 1].set(96)
    s_fast, telem = _eval(ap, spec_fast, t, ref, orig, cp)
    s_ref, _ = _eval(ap, spec_ref, t, ref, orig, cp)
    assert int(telem.n_escapes) == 0 and int(telem.n_fallbacks) == 0
    assert np.array_equal(np.asarray(s_fast), np.asarray(s_ref))
    # ... and 10-px outliers exceed even the widest kernel: the per-block
    # gather fix-up engages
    for ctu, cu in ((0, 1), (2, 5)):
        cp = cp.at[ctu, s32 + cu, :, 0].set(160).at[ctu, s32 + cu, :, 1].set(160)
    s_fast, telem = _eval(ap, spec_fast, t, ref, orig, cp)
    s_ref, _ = _eval(ap, spec_ref, t, ref, orig, cp)
    assert int(telem.n_escapes) > 0 and int(telem.n_fallbacks) == 0
    assert np.array_equal(np.asarray(s_fast), np.asarray(s_ref))


@run_in_child
def test_adaptive_dispatch_rebased_telemetry():
    """Shipped-default (rebase=True) telemetry counterpart of the legacy
    dispatch test: the same 10-px outlier CUs that force escapes under
    magnitude keying are absorbed by per-slab rebasing (residual range 0
    within the outlier slabs), so NOTHING escapes — and the result is
    still bit-identical to the gather engine."""
    from vvc_affine_tpu.models import affine_plane as ap

    ap, ref, orig = _eval_setup(5)
    spec_fast = ap.PlaneSpec("full", 2, FW, FH, use_pallas=True,
                             interpret=True, R=8, rebase=True)
    spec_ref = ap.PlaneSpec("full", 2, FW, FH, use_pallas=False)
    t = ap.build_tables(spec_fast)
    cp = jnp.full((t.n_ctus, t.n_cus, 3, 2), 16, jnp.int32)
    s32 = t.strides[6]
    for ctu, cu in ((0, 1), (2, 5)):
        cp = cp.at[ctu, s32 + cu, :, 0].set(160).at[ctu, s32 + cu, :, 1].set(160)
    s_fast, telem = _eval(ap, spec_fast, t, ref, orig, cp)
    s_ref, _ = _eval(ap, spec_ref, t, ref, orig, cp)
    assert int(telem.n_escapes) == 0 and int(telem.n_fallbacks) == 0
    assert np.array_equal(np.asarray(s_fast), np.asarray(s_ref))


@run_in_child
def test_rebased_dispatch_exact():
    """Base-relative dispatch (PlaneSpec.rebase): coherent motion of any
    magnitude rides the narrow rungs with NO escapes; clamped-out extremes
    still resolve exactly through pass-2/fix-up/fallback."""
    from vvc_affine_tpu.models import affine_plane as ap

    ap, ref, orig = _eval_setup(6)
    spec_fast = ap.PlaneSpec("full", 2, FW, FH, use_pallas=True,
                             interpret=True, R=8, rebase=True)
    spec_ref = ap.PlaneSpec("full", 2, FW, FH, use_pallas=False)
    t = ap.build_tables(spec_fast)
    # uniform 12-px down / 40-px right translation: far beyond R=8, but
    # the residual range is 0, so the rung-1 rebased kernel is exact and
    # nothing escapes (the legacy dispatcher would whole-frame fall back)
    cp = jnp.full((t.n_ctus, t.n_cus, 3, 2), 0, jnp.int32)
    cp = cp.at[..., :, 0].set(40 * 16).at[..., :, 1].set(12 * 16)
    s_fast, telem = _eval(ap, spec_fast, t, ref, orig, cp)
    s_ref, _ = _eval(ap, spec_ref, t, ref, orig, cp)
    assert int(telem.n_escapes) == 0 and int(telem.n_fallbacks) == 0
    assert np.array_equal(np.asarray(s_fast), np.asarray(s_ref))
    # same global motion + 3-px local jitter: still small residual range
    rng = np.random.default_rng(12)
    jit = rng.integers(-48, 49, size=(t.n_ctus, t.n_cus, 3, 2))
    cp2 = cp + jnp.asarray(jit.astype(np.int32))
    s_fast, telem = _eval(ap, spec_fast, t, ref, orig, cp2)
    s_ref, _ = _eval(ap, spec_ref, t, ref, orig, cp2)
    assert int(telem.n_fallbacks) == 0
    assert np.array_equal(np.asarray(s_fast), np.asarray(s_ref))
    # vertical motion beyond the tile margin (60 px down): bases clamp,
    # blocks exceed the widest rebased kernel, and the escape machinery
    # must still produce the exact result
    cp3 = jnp.full((t.n_ctus, t.n_cus, 3, 2), 0, jnp.int32)
    cp3 = cp3.at[..., :, 1].set(60 * 16)
    s_fast, telem = _eval(ap, spec_fast, t, ref, orig, cp3)
    s_ref, _ = _eval(ap, spec_ref, t, ref, orig, cp3)
    assert np.array_equal(np.asarray(s_fast), np.asarray(s_ref))


def test_warp_pallas_i16_taps():
    """int16 tap planes produce bit-identical kernel output (the kernel
    widens at load); exercises the i16_taps perf knob's kernel semantics."""
    R = 4
    grid, ref, ctu_y, ctu_x, dy, dx, hc, vc, _, _ = _setup(77, 2, R)
    args = (_tiles_of(ref, grid),
            warp_ops.expand_lanes(dy), warp_ops.expand_lanes(dx))
    want = np.asarray(warp_ops.warp_pallas(
        *args, warp_ops.expand_lanes(hc), warp_ops.expand_lanes(vc),
        R=R, interpret=True))
    got = np.asarray(warp_ops.warp_pallas(
        *args, warp_ops.expand_lanes(hc.astype(jnp.int16)),
        warp_ops.expand_lanes(vc.astype(jnp.int16)),
        R=R, interpret=True))
    assert np.array_equal(want, got)


@pytest.mark.parametrize("R,f32,gran", [
    (2, False, "slab"), (8, False, "slab"), (2, True, "slab"),
    (2, False, "plane"), (8, False, "plane")])
def test_warp_pallas_rebased(R, f32, gran):
    """The rebased kernel (base displacement slides the window — per-slab
    dynamic windows or one per-plane tile roll; dy/dx planes arrive
    base-subtracted) is bit-identical to warp_xla with the FULL
    displacements — for bases anywhere inside rebase_base_limits, i.e.
    coherent motion far beyond R rides the R-kernel.  Also combined with
    the f32 MAC fields."""
    grid, ref, ctu_y, ctu_x, _, _, hc, vc, _, _ = _setup(55 + R, 2, R)
    n_ctu = grid.num_ctus
    rng = np.random.default_rng(1000 + R)
    by_lo, by_hi, bx_lo, bx_hi = warp_ops.rebase_base_limits((R,), gran)
    if gran == "slab":
        by = rng.integers(by_lo, by_hi + 1,
                          size=(n_ctu, 2, 16)).astype(np.int32)
        bx = rng.integers(int(bx_lo), int(bx_hi) + 1,
                          size=(n_ctu, 2, 16)).astype(np.int32)
        basey = np.repeat(by, 2, axis=-1).reshape(n_ctu, 2, 32, 1)
        basex = np.repeat(bx, 2, axis=-1).reshape(n_ctu, 2, 32, 1)
    else:
        by = rng.integers(int(by_lo), int(by_hi) + 1,
                          size=(n_ctu, 2)).astype(np.int32)
        bx = rng.integers(int(bx_lo), int(bx_hi) + 1,
                          size=(n_ctu, 2)).astype(np.int32)
        basey = by.reshape(n_ctu, 2, 1, 1)
        basex = bx.reshape(n_ctu, 2, 1, 1)
    # block displacement = base + in-range residual
    resy = rng.integers(-R, R + 1, size=(n_ctu, 2, 32, 32)).astype(np.int32)
    resx = rng.integers(-R, R + 1, size=(n_ctu, 2, 32, 32)).astype(np.int32)
    dy = basey + resy
    dx = basex + resx
    want = np.asarray(warp_ops.warp_xla(
        ref, FW, FH, ctu_y, ctu_x, jnp.asarray(dy), jnp.asarray(dx), hc, vc))
    got = np.asarray(warp_ops.warp_pallas(
        _tiles_of(ref, grid),
        warp_ops.expand_lanes(jnp.asarray(resy)),
        warp_ops.expand_lanes(jnp.asarray(resx)),
        warp_ops.expand_lanes(hc), warp_ops.expand_lanes(vc),
        R=R, interpret=True, f32=f32,
        base_y=jnp.asarray(by), base_x=jnp.asarray(bx)))
    assert np.array_equal(want, got)


@pytest.mark.parametrize("R", [2, 8])
def test_warp_pallas_f32(R):
    """The f32 MAC-field kernel variant is bit-identical to the int32 one
    (exactness proof at ops/warp._warp_kernel: every intermediate is an
    integer < 2^24, shifts become exact floor-scales).  Extreme phases are
    forced in (max |coeff| bank rows) so the bound is actually exercised."""
    grid, ref, ctu_y, ctu_x, dy, dx, hc, vc, _, _ = _setup(88 + R, 2, R)
    # overwrite some tap planes with the largest-magnitude phases (8: the
    # widest positive sum; 1/15: the strongest negative lobes)
    bank = np.asarray(C.LUMA_FILTER_4x4, np.int64)[:, 1:7]
    fx = np.full((grid.num_ctus, 2, 32, 32), 8)
    fx[:, :, ::3] = 1
    fx[:, :, 1::3] = 15
    hc = jnp.asarray(np.moveaxis(bank[fx], -1, 2).astype(np.int32))
    args = (_tiles_of(ref, grid),
            warp_ops.expand_lanes(dy), warp_ops.expand_lanes(dx),
            warp_ops.expand_lanes(hc), warp_ops.expand_lanes(vc))
    want = np.asarray(warp_ops.warp_pallas(*args, R=R, interpret=True))
    got = np.asarray(warp_ops.warp_pallas(*args, R=R, interpret=True,
                                          f32=True))
    assert np.array_equal(want, got)


def test_escape_budget_scales_with_frame():
    """The default budget must scale with CTU count: a FIXED 4096 overflowed
    on affine-true 4K content (34k escapes/frame-ref) and sent whole passes
    to the multi-second exact fallback (docs/ab_r05.md section 3)."""
    from vvc_affine_tpu.models import affine_plane as ap

    for fw, fh in ((1920, 1080), (3840, 2160), (7680, 4320)):
        spec = ap.PlaneSpec("full", 2, fw, fh)
        n_ctus = G.frame_grid(fw, fh).num_ctus
        want = max(4096, 30 * n_ctus)
        t = ap.build_tables(spec)
        # resolve exactly as _escape_fixup does
        E = spec.escape_budget
        if E is None:
            E = max(4096, 30 * t.n_ctus)
        assert E == want
    # 1080p keeps the validated 4096; 4K gets 15300
    assert max(4096, 30 * G.frame_grid(1920, 1080).num_ctus) == 4096
    assert max(4096, 30 * G.frame_grid(3840, 2160).num_ctus) == 15300
