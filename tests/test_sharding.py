"""Multi-device (virtual 8-CPU mesh) parity with the single-device engines.

Covers both engines: the shipping dense plane engine (shard_map over the
flat CTU axis) in BOTH alignment modes with the 2CP->3CP chain, and the
gather engine (GSPMD constraints).  Outputs must be bit-identical to the
single-device stages.
"""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from vvc_affine_tpu.models import affine_me, affine_plane
from vvc_affine_tpu.parallel import mesh as pmesh

LAM = 78.949063


def _frames(fw, fh, seed=11):
    rng = np.random.default_rng(seed)
    ref = rng.integers(0, 1024, size=(fh, fw)).astype(np.int32)
    orig = rng.integers(0, 1024, size=(fh, fw)).astype(np.int32)
    return jnp.asarray(ref.ravel()), jnp.asarray(orig.ravel())


def test_sharded_gather_stage_matches_single_device():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    fw, fh = 256, 128  # 2x1 = 2 CTUs -> padded to 8
    ref_j, orig_j = _frames(fw, fh)
    mesh = pmesh.make_mesh(jax.devices()[:8])

    for mode in ("full",):
        spec2 = affine_me.StageSpec(mode, 2, fw, fh)
        single2 = affine_me.build_stage(spec2)
        shard2 = pmesh.build_stage_sharded(spec2, mesh)
        zeros = affine_me.zero_cpmvs(spec2)
        c_s, p_s = single2(ref_j, orig_j, jnp.float32(LAM), zeros)
        c_m, p_m = shard2(ref_j, orig_j, jnp.float32(LAM), zeros)
        np.testing.assert_array_equal(np.asarray(c_s), np.asarray(c_m))
        np.testing.assert_array_equal(np.asarray(p_s), np.asarray(p_m))

        spec3 = affine_me.StageSpec(mode, 3, fw, fh)
        shard3 = pmesh.build_stage_sharded(spec3, mesh)
        single3 = affine_me.build_stage(spec3)
        c3_s, p3_s = single3(ref_j, orig_j, jnp.float32(LAM), p_s)
        c3_m, p3_m = shard3(ref_j, orig_j, jnp.float32(LAM), p_m)
        np.testing.assert_array_equal(np.asarray(c3_s), np.asarray(c3_m))
        np.testing.assert_array_equal(np.asarray(p3_s), np.asarray(p3_m))


@pytest.mark.parametrize("mode", ["full", "half"])
def test_sharded_plane_stage_matches_single_device(mode):
    """The shipping dense engine, sharded: both modes, 2CP->3CP chained.

    384x256 = 3x2 = 6 CTUs padded to 8 devices; a bottom CTU row is partial
    (256 % 128 == 0, so use 384x320 for a partial row instead).
    """
    assert jax.device_count() >= 8
    fw, fh = 384, 320  # 3x3 = 9 CTUs (bottom row partial) -> padded to 16
    ref_j, orig_j = _frames(fw, fh, seed=mode == "half" and 7 or 3)
    mesh = pmesh.make_mesh(jax.devices()[:8])

    spec2 = affine_plane.PlaneSpec(mode, 2, fw, fh)
    single2 = affine_plane.build_stage(spec2)
    shard2 = pmesh.build_plane_stage_sharded(spec2, mesh)
    zeros = affine_plane.zero_cpmvs(spec2)
    c_s, p_s = single2(ref_j, orig_j, jnp.float32(LAM), zeros)
    c_m, p_m = shard2(ref_j, orig_j, jnp.float32(LAM), zeros)
    np.testing.assert_array_equal(np.asarray(c_s), np.asarray(c_m))
    np.testing.assert_array_equal(np.asarray(p_s), np.asarray(p_m))

    spec3 = affine_plane.PlaneSpec(mode, 3, fw, fh)
    single3 = affine_plane.build_stage(spec3)
    shard3 = pmesh.build_plane_stage_sharded(spec3, mesh)
    c3_s, p3_s = single3(ref_j, orig_j, jnp.float32(LAM), p_s)
    c3_m, p3_m = shard3(ref_j, orig_j, jnp.float32(LAM), p_m)
    np.testing.assert_array_equal(np.asarray(c3_s), np.asarray(c3_m))
    np.testing.assert_array_equal(np.asarray(p3_s), np.asarray(p3_m))
