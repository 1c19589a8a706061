"""End-to-end stage parity: jitted TPU engine vs the sequential oracle.

Covers both alignment modes, both CP counts (3CP consuming the 2CP results,
as in the reference dispatch main.cpp:759-878), full and partial CTUs
(out-of-frame CUs), and frame-edge window clamping.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vvc_affine_tpu.models import affine_me

from .oracle import engine as oracle_engine

LAM = 78.949063  # QP32 POC1 motion lambda

RNG = np.random.default_rng(42)


def _frames(fw, fh):
    # smooth-ish content with global motion so refinement converges on
    # non-trivial CPMVs (pure noise would still pass but exercises less)
    yy, xx = np.mgrid[0:fh, 0:fw]
    base = (
        512
        + 300 * np.sin(xx / 23.0) * np.cos(yy / 17.0)
        + RNG.integers(-80, 80, size=(fh, fw))
    )
    ref = np.clip(base, 0, 1023).astype(np.int32)
    # orig: ref shifted by a couple of pixels + noise (affine-ish motion)
    orig = np.roll(ref, (2, -3), axis=(0, 1))
    orig = np.clip(orig + RNG.integers(-30, 30, size=(fh, fw)), 0, 1023)
    return ref.astype(np.int32), orig.astype(np.int32)


@pytest.mark.parametrize("fw,fh", [(128, 128), (192, 80)])
@pytest.mark.parametrize("mode", ["full", "half"])
def test_stage_parity(fw, fh, mode):
    ref, orig = _frames(fw, fh)
    ref_j = jnp.asarray(ref.ravel())
    orig_j = jnp.asarray(orig.ravel())

    spec2 = affine_me.StageSpec(mode, 2, fw, fh)
    run2 = affine_me.build_stage(spec2)
    zeros = affine_me.zero_cpmvs(spec2)
    cost2, cp2 = run2(ref_j, orig_j, jnp.float32(LAM), zeros)

    e_cost2, e_cp2 = oracle_engine.run_stage(mode, 2, ref, orig, LAM)
    np.testing.assert_array_equal(np.asarray(cost2), e_cost2)
    np.testing.assert_array_equal(np.asarray(cp2), e_cp2)

    spec3 = affine_me.StageSpec(mode, 3, fw, fh)
    run3 = affine_me.build_stage(spec3)
    cost3, cp3 = run3(ref_j, orig_j, jnp.float32(LAM), cp2)

    e_cost3, e_cp3 = oracle_engine.run_stage(mode, 3, ref, orig, LAM, e_cp2)
    np.testing.assert_array_equal(np.asarray(cost3), e_cost3)
    np.testing.assert_array_equal(np.asarray(cp3), e_cp3)


def test_stage_parity_extra_iters():
    """--ExtraGradientIter parity (affine.cl:173-177, the +extraGradIter
    term): one extra refinement round changes the decision set; both
    engines must track the oracle exactly."""
    from vvc_affine_tpu.models import affine_plane

    fw, fh = 128, 128
    ref, orig = _frames(fw, fh)
    ref_j = jnp.asarray(ref.ravel())
    orig_j = jnp.asarray(orig.ravel())
    e_cost, e_cp = oracle_engine.run_stage(
        "full", 2, ref, orig, LAM, extra_iters=1)

    run_g = affine_me.build_stage(affine_me.StageSpec("full", 2, fw, fh,
                                                      extra_iters=1))
    zeros = affine_me.zero_cpmvs(affine_me.StageSpec("full", 2, fw, fh))
    cost_g, cp_g = run_g(ref_j, orig_j, jnp.float32(LAM), zeros)
    np.testing.assert_array_equal(np.asarray(cost_g), e_cost)
    np.testing.assert_array_equal(np.asarray(cp_g), e_cp)

    run_p = affine_plane.build_stage(affine_plane.PlaneSpec(
        "full", 2, fw, fh, extra_iters=1))
    cost_p, cp_p = run_p(ref_j, orig_j, jnp.float32(LAM), zeros)
    np.testing.assert_array_equal(np.asarray(cost_p), e_cost)
    np.testing.assert_array_equal(np.asarray(cp_p), e_cp)
