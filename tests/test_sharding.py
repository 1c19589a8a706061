"""Multi-device (virtual 8-CPU mesh) parity with the single-device engine."""

import numpy as np

import jax
import jax.numpy as jnp

from vvc_affine_tpu.models import affine_me
from vvc_affine_tpu.parallel import mesh as pmesh

LAM = 78.949063


def test_sharded_stage_matches_single_device():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    fw, fh = 256, 128  # 2x1 = 2 CTUs -> padded to 8
    rng = np.random.default_rng(11)
    ref = rng.integers(0, 1024, size=(fh, fw)).astype(np.int32)
    orig = rng.integers(0, 1024, size=(fh, fw)).astype(np.int32)
    ref_j = jnp.asarray(ref.ravel())
    orig_j = jnp.asarray(orig.ravel())

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
