"""The dense plane engine must be bit-identical to the merged-group engine.

Both implement the affine_gradient_mult_sizes(_HA) behavioural spec; the
merged-group engine (models.affine_me) is itself validated against the
NumPy VTM oracle in test_engine_parity.py, so equality here transfers that
guarantee to the plane engine (models.affine_plane).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vvc_affine_tpu.models import affine_me, affine_plane

FW, FH = 416, 240


def _frames(seed):
    rng = np.random.default_rng(seed)
    ref = jnp.asarray(rng.integers(0, 1024, size=(FH * FW,)).astype(np.int32))
    orig = jnp.asarray(rng.integers(0, 1024, size=(FH * FW,)).astype(np.int32))
    return ref, orig


@pytest.mark.parametrize("mode", ["full", "half"])
def test_plane_engine_matches_gather_engine(mode):
    ref, orig = _frames(7)
    lam = jnp.float32(57.54)
    z = affine_me.zero_cpmvs(affine_me.StageSpec(mode, 2, FW, FH))
    c_ref, p_ref = affine_me.build_stage(
        affine_me.StageSpec(mode, 2, FW, FH))(ref, orig, lam, z)
    c_new, p_new = affine_plane.build_stage(
        affine_plane.PlaneSpec(mode, 2, FW, FH, use_pallas=False))(
            ref, orig, lam, z)
    assert np.array_equal(np.asarray(c_ref), np.asarray(c_new))
    assert np.array_equal(np.asarray(p_ref), np.asarray(p_new))
    # 3CP consumes the 2CP CPMVs (main.cpp:837)
    c3r, p3r = affine_me.build_stage(
        affine_me.StageSpec(mode, 3, FW, FH))(ref, orig, lam, p_ref)
    c3n, p3n = affine_plane.build_stage(
        affine_plane.PlaneSpec(mode, 3, FW, FH, use_pallas=False))(
            ref, orig, lam, p_new)
    assert np.array_equal(np.asarray(c3r), np.asarray(c3n))
    assert np.array_equal(np.asarray(p3r), np.asarray(p3n))


def test_qp_sweep_parity():
    """Engine parity across the standard QP sweep {22, 27, 32, 37}.

    Lambda is the only QP-dependent input to a stage (main.cpp:585), so the
    compiled stage is reused and only the scalar changes.
    """
    from vvc_affine_tpu import constants as C

    ref, orig = _frames(11)
    f_ref = affine_me.build_stage(affine_me.StageSpec("full", 2, FW, FH))
    f_new = affine_plane.build_stage(
        affine_plane.PlaneSpec("full", 2, FW, FH, use_pallas=False))
    z = affine_me.zero_cpmvs(affine_me.StageSpec("full", 2, FW, FH))
    for qp in (22, 27, 32, 37):
        lam = jnp.float32(C.lambda_for(qp, 1))
        c_r, p_r = f_ref(ref, orig, lam, z)
        c_n, p_n = f_new(ref, orig, lam, z)
        assert np.array_equal(np.asarray(c_r), np.asarray(c_n)), qp
        assert np.array_equal(np.asarray(p_r), np.asarray(p_n)), qp
