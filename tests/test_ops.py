"""Unit parity: batched JAX ops vs the scalar NumPy oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from vvc_affine_tpu import constants as C
from vvc_affine_tpu.ops import cost as cost_ops
from vvc_affine_tpu.ops import equations as eq_ops
from vvc_affine_tpu.ops import gradient as grad_ops
from vvc_affine_tpu.ops import interp as interp_ops
from vvc_affine_tpu.ops import mv as mv_ops
from vvc_affine_tpu.ops import satd as satd_ops
from vvc_affine_tpu.ops import solver as solver_ops

from .oracle import vtm

RNG = np.random.default_rng(7)


def rand_cpmvs(n, lo=-2000, hi=2000):
    return RNG.integers(lo, hi, size=(n, 3, 2)).astype(np.int32)


def test_round_and_clip_mv():
    n = 512
    mv = RNG.integers(-(1 << 20), 1 << 20, size=(n, 2)).astype(np.int32)
    px = RNG.integers(0, 1920, size=n).astype(np.int32)
    py = RNG.integers(0, 1080, size=n).astype(np.int32)
    gx, gy = mv_ops.round_and_clip_mv(mv[:, 0], mv[:, 1], px, py, 1920, 1080)
    for i in range(n):
        ex, ey = vtm.round_and_clip_mv(
            int(mv[i, 0]), int(mv[i, 1]), int(px[i]), int(py[i]), 1920, 1080
        )
        assert (int(gx[i]), int(gy[i])) == (ex, ey)


@pytest.mark.parametrize("n_cp", [2, 3])
@pytest.mark.parametrize("w,h", [(128, 128), (64, 32), (16, 16)])
def test_derive_sub_mvs(n_cp, w, h):
    n = 64
    # include large CPMVs so the spread path triggers
    cp = np.concatenate([rand_cpmvs(n - 8), rand_cpmvs(8, -60000, 60000)])
    sh, sw = h // 4, w // 4
    sub_x = np.tile(np.arange(sw) * 4, sh).astype(np.int32)
    sub_y = np.repeat(np.arange(sh) * 4, sw).astype(np.int32)
    mvx, mvy, spread = mv_ops.derive_sub_mvs(
        jnp.asarray(cp), int(np.log2(w)), int(np.log2(h)), n_cp,
        jnp.asarray(sub_x), jnp.asarray(sub_y),
    )
    hit_spread = False
    step = max(1, (sh * sw) // 16)
    for i in range(0, n, 3):
        cpmvs = [tuple(cp[i, j]) for j in range(3)]
        for s in range(0, sh * sw, step):
            ex, ey, esp = vtm.derive_sub_mv(
                cpmvs, w, h, int(sub_x[s]), int(sub_y[s]), n_cp
            )
            assert int(mvx[i, s]) == ex and int(mvy[i, s]) == ey
            assert bool(spread[i]) == esp
            hit_spread |= esp
    assert hit_spread  # the test must exercise the spread path


def test_window_and_filter():
    fw, fh = 256, 192
    ref = RNG.integers(0, 1024, size=(fh, fw)).astype(np.int32)
    n = 256
    bx = RNG.integers(0, fw, size=n).astype(np.int32)
    by = RNG.integers(0, fh, size=n).astype(np.int32)
    mvx = RNG.integers(-3000, 3000, size=n).astype(np.int32)
    mvy = RNG.integers(-3000, 3000, size=n).astype(np.int32)
    pred = interp_ops.predict_subblocks(
        jnp.asarray(ref.ravel()), fw, fh,
        jnp.asarray(bx), jnp.asarray(by), jnp.asarray(mvx), jnp.asarray(mvy),
    )
    pred = np.asarray(pred)
    for i in range(0, n, 7):
        win = vtm.fetch_window(ref, int(bx[i]), int(by[i]), int(mvx[i]) >> 4, int(mvy[i]) >> 4)
        exp = vtm.filter_block(win, int(mvx[i]) & 15, int(mvy[i]) & 15)
        np.testing.assert_array_equal(pred[i].reshape(4, 4), exp)


def test_satd():
    n = 1024
    a = RNG.integers(0, 1024, size=(n, 16)).astype(np.int32)
    b = RNG.integers(0, 1024, size=(n, 16)).astype(np.int32)
    got = np.asarray(satd_ops.satd_4x4(jnp.asarray(a), jnp.asarray(b)))
    for i in range(0, n, 13):
        assert int(got[i]) == vtm.satd_4x4(a[i], b[i])


def test_exp_golomb_and_affine_bits():
    vals = np.concatenate(
        [np.array([0, 1, -1, 2, -2, 64, 65, -65, 128, 129]),
         RNG.integers(-(1 << 17), 1 << 17, size=200)]
    ).astype(np.int32)
    got = np.asarray(cost_ops.exp_golomb_bits(jnp.asarray(vals)))
    for i, v in enumerate(vals):
        assert int(got[i]) == vtm.exp_golomb_bits(int(v))

    for n_cp in (2, 3):
        cp = rand_cpmvs(128, -100000, 100000)
        bits = np.asarray(cost_ops.affine_bits_zero_pred(jnp.asarray(cp), n_cp))
        zero = ((0, 0), (0, 0), (0, 0))
        for i in range(128):
            cpmvs = [tuple(int(x) for x in cp[i, j]) for j in range(3)]
            assert int(bits[i]) == vtm.calc_affine_bits(cpmvs, zero, n_cp)


def test_rd_cost_float32_semantics():
    satd = jnp.asarray(np.array([12345], np.int64))
    for lam, bits in [(78.949063, 17), (17.583905, 4), (708.938619, 99)]:
        got = int(cost_ops.rd_cost(satd, jnp.asarray(np.array([bits], np.int32)), lam)[0])
        assert got == 12345 + vtm.rd_cost(bits + C.RUI_BITS, lam)


@pytest.mark.parametrize("w,h", [(16, 16), (64, 32), (128, 128)])
def test_gradient_matches_plane_refill(w, h):
    # per-CU sobel+edge-pad == literal CTU-plane sobel + border refill
    plane = RNG.integers(0, 1024, size=(128, 128)).astype(np.int32)
    boxes = [
        (x, y, w, h) for y in range(0, 128, h) for x in range(0, 128, w)
    ]
    gx_ref, gy_ref = vtm.sobel_plane_with_refill(plane, boxes)
    for (x, y, _, _) in boxes[:4]:
        cu = plane[y : y + h, x : x + w]
        gx, gy = grad_ops.sobel_cu(jnp.asarray(cu[None]))
        np.testing.assert_array_equal(np.asarray(gx[0]), gx_ref[y : y + h, x : x + w])
        np.testing.assert_array_equal(np.asarray(gy[0]), gy_ref[y : y + h, x : x + w])


@pytest.mark.parametrize("n_cp", [2, 3])
@pytest.mark.parametrize("w,h", [(16, 16), (32, 16)])
def test_equations_factorisation(n_cp, w, h):
    gx = RNG.integers(-4092, 4093, size=(w * h,)).reshape(h, w).astype(np.int32)
    gy = RNG.integers(-4092, 4093, size=(w * h,)).reshape(h, w).astype(np.int32)
    err = RNG.integers(-1023, 1024, size=(h, w)).astype(np.int32)
    expected = vtm.build_system(gx, gy, err, n_cp)
    fac = eq_ops.subblock_factors(h // 4, w // 4, n_cp)
    m = eq_ops.gradient_moments(
        jnp.asarray(gx[None]), jnp.asarray(gy[None]), jnp.asarray(err[None])
    )
    M, rhs = eq_ops.assemble_system(*m, fac)
    P = 2 * n_cp
    np.testing.assert_array_equal(np.asarray(M[0]), expected[:, :P])
    np.testing.assert_array_equal(np.asarray(rhs[0]), expected[:, P])


@pytest.mark.parametrize("n_cp", [2, 3])
def test_solver_matches_oracle(n_cp):
    P = 2 * n_cp
    n = 256
    systems = []
    for i in range(n):
        if i % 5 == 0:
            A = np.zeros((P, P + 1), np.int64)  # degenerate -> zero path
        elif i % 5 == 1:
            A = RNG.integers(-5, 5, size=(P, P + 1)).astype(np.int64)
        else:
            # realistic: PSD-ish from random iC outer products
            ic = RNG.integers(-(1 << 18), 1 << 18, size=(64, P)).astype(np.int64)
            A = np.zeros((P, P + 1), np.int64)
            A[:, :P] = ic.T @ ic
            A[:, P] = RNG.integers(-(1 << 40), 1 << 40, size=P)
        systems.append(A)
    A_all = np.stack(systems)
    params = np.asarray(
        solver_ops.solve_affine(jnp.asarray(A_all[:, :, :P]), jnp.asarray(A_all[:, :, P]), n_cp)
    )
    for i in range(n):
        exp = vtm.solve_system(systems[i], n_cp)
        np.testing.assert_array_equal(params[i], exp)


@pytest.mark.parametrize("n_cp", [2, 3])
def test_scale_delta_mvs(n_cp):
    n = 128
    P = 2 * n_cp
    params = RNG.normal(scale=2.0, size=(n, P))
    params[0] = 0.0
    w = np.full(n, 64, np.int32)
    h = np.full(n, 32, np.int32)
    got = np.asarray(
        solver_ops.scale_delta_mvs(jnp.asarray(params), n_cp, jnp.asarray(w), jnp.asarray(h))
    )
    for i in range(n):
        raw = vtm.scale_delta_mvs(params[i], n_cp, 64, 32)
        # raw s0..s5 -> (LT.x, LT.y, RT.x, RT.y, LB.x, LB.y) via the
        # affine.cl:884-889 mapping: s0,s1,s2,s3,s4,s5 add to
        # LT.x,LT.y,RT.x,RT.y,LB.x,LB.y where s1=f(d2), s2=f(d1).
        exp = [raw[0], raw[2], raw[1], raw[3], raw[4], raw[5]]
        np.testing.assert_array_equal(got[i].ravel(), exp)


@pytest.mark.parametrize("w,h", [(128, 128), (64, 16), (16, 64)])
def test_derive_lb_from_2cp(w, h):
    n = 128
    cp = rand_cpmvs(n, -30000, 30000)
    cux = np.full(n, 256, np.int32)
    cuy = np.full(n, 128, np.int32)
    lb = np.asarray(
        mv_ops.derive_lb_from_2cp(
            jnp.asarray(cp), int(np.log2(w)), int(np.log2(h)),
            jnp.asarray(cux), jnp.asarray(cuy), 1920, 1080,
        )
    )
    for i in range(n):
        exp = vtm.derive_lb_from_2cp(
            tuple(int(x) for x in cp[i, 0]), tuple(int(x) for x in cp[i, 1]),
            w, h, 256, 128, 1920, 1080,
        )
        assert tuple(lb[i]) == exp
