"""Multi-device (virtual 8-CPU mesh) parity with the single-device engines.

Covers both engines: the shipping dense plane engine (shard_map over the
flat CTU axis) in BOTH alignment modes with the 2CP->3CP chain, and the
gather engine (GSPMD constraints).  Outputs must be bit-identical to the
single-device stages.
"""

import numpy as np

import jax
import pytest

LAM = 78.949063


_GATHER_CHILD_SRC = """
import sys
import numpy as np
import jax, jax.numpy as jnp
from vvc_affine_tpu.models import affine_me
from vvc_affine_tpu.parallel import mesh as pmesh

fw, fh, seed, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                          int(sys.argv[3]), sys.argv[4])
rng = np.random.default_rng(seed)
ref = jnp.asarray(rng.integers(0, 1024, (fh * fw,)).astype(np.int32))
orig = jnp.asarray(rng.integers(0, 1024, (fh * fw,)).astype(np.int32))
mesh = pmesh.make_mesh(jax.devices()[:8])
lam = jnp.float32(%r)
spec2 = affine_me.StageSpec("full", 2, fw, fh)
shard2 = pmesh.build_stage_sharded(spec2, mesh)
c2, p2 = shard2(ref, orig, lam, affine_me.zero_cpmvs(spec2))
spec3 = affine_me.StageSpec("full", 3, fw, fh)
shard3 = pmesh.build_stage_sharded(spec3, mesh)
c3, p3 = shard3(ref, orig, lam, p2)
sc2, sp2 = affine_me.build_stage(spec2)(ref, orig, lam,
                                        affine_me.zero_cpmvs(spec2))
sc3, sp3 = affine_me.build_stage(spec3)(ref, orig, lam, sp2)
np.savez(out_path, c2=np.asarray(c2), p2=np.asarray(p2),
         c3=np.asarray(c3), p3=np.asarray(p3),
         sc2=np.asarray(sc2), sp2=np.asarray(sp2),
         sc3=np.asarray(sc3), sp3=np.asarray(sp3))
""" % LAM


def test_sharded_gather_stage_matches_single_device(tmp_path):
    """Gather engine, GSPMD-sharded; BOTH the sharded and the single-device
    stages compile+run in a fresh child (XLA:CPU segfaults on big in-parent
    compiles late in long sessions), the parent only diffs arrays."""
    import os
    import subprocess
    import sys as _sys

    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    fw, fh = 256, 128  # 2x1 = 2 CTUs -> padded to 8
    out = str(tmp_path / "gather_sharded.npz")
    env = dict(os.environ)
    env["VVC_AFFINE_TPU_PLATFORM"] = "cpu"
    env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    r = subprocess.run(
        [_sys.executable, "-c", _GATHER_CHILD_SRC, str(fw), str(fh), "11",
         out],
        env=env, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
        preexec_fn=_raise_stack, capture_output=True, text=True,
        timeout=3600)
    assert r.returncode == 0, (r.stdout[-800:], r.stderr[-2000:])
    got = np.load(out)
    np.testing.assert_array_equal(got["sc2"], got["c2"])
    np.testing.assert_array_equal(got["sp2"], got["p2"])
    np.testing.assert_array_equal(got["sc3"], got["c3"])
    np.testing.assert_array_equal(got["sp3"], got["p3"])


_CHILD_SRC = """
import sys
import numpy as np
import jax, jax.numpy as jnp
from vvc_affine_tpu.models import affine_plane
from vvc_affine_tpu.parallel import mesh as pmesh

mode, fw, fh, seed, out_path = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
    sys.argv[5])
rng = np.random.default_rng(seed)
ref = jnp.asarray(rng.integers(0, 1024, (fh * fw,)).astype(np.int32))
orig = jnp.asarray(rng.integers(0, 1024, (fh * fw,)).astype(np.int32))
mesh = pmesh.make_mesh(jax.devices()[:8])
lam = jnp.float32(%r)
spec2 = affine_plane.PlaneSpec(mode, 2, fw, fh)
spec3 = affine_plane.PlaneSpec(mode, 3, fw, fh)
# 'full' exercises the fused-pair sharded builder (the pipeline's shipped
# dispatch shape); 'half' the separate per-stage one (fused=False path) —
# both sharded builders stay covered across the two parametrizations
if mode == "full":
    c2, p2, c3, p3 = pmesh.build_plane_pair_sharded(spec2, spec3, mesh)(
        ref, orig, lam, affine_plane.zero_cpmvs(spec2))
else:
    shard2 = pmesh.build_plane_stage_sharded(spec2, mesh)
    c2, p2 = shard2(ref, orig, lam, affine_plane.zero_cpmvs(spec2))
    shard3 = pmesh.build_plane_stage_sharded(spec3, mesh)
    c3, p3 = shard3(ref, orig, lam, p2)
sc2, sp2 = affine_plane.build_stage(spec2)(ref, orig, lam,
                                           affine_plane.zero_cpmvs(spec2))
sc3, sp3 = affine_plane.build_stage(spec3)(ref, orig, lam, sp2)
np.savez(out_path, c2=np.asarray(c2), p2=np.asarray(p2),
         c3=np.asarray(c3), p3=np.asarray(p3),
         sc2=np.asarray(sc2), sp2=np.asarray(sp2),
         sc3=np.asarray(sc3), sp3=np.asarray(sp3))
""" % LAM


def _raise_stack():
    import resource

    soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
    want = 1 << 29
    new = want if hard == resource.RLIM_INFINITY else min(want, hard)
    resource.setrlimit(resource.RLIMIT_STACK, (new, hard))


@pytest.mark.parametrize("mode", ["full", "half"])
def test_sharded_plane_stage_matches_single_device(mode, tmp_path):
    """The shipping dense engine, sharded: both modes, 2CP->3CP chained.

    9 CTUs (bottom row partial) padded to 16 over 8 devices.  BOTH the
    sharded and the single-device stages compile+run in a FRESH child
    process: XLA:CPU segfaults compiling big stages late in a long session
    (heap state from many prior big compiles), while identical compiles in
    a fresh process are solid — the child also gets the exec-time stack
    rlimit raise.  The parent only diffs the saved arrays.
    """
    import os
    import subprocess
    import sys as _sys

    assert jax.device_count() >= 8
    fw, fh = 384, 320  # 3x3 = 9 CTUs (bottom row partial) -> padded to 16
    seed = 7 if mode == "half" else 3
    out = str(tmp_path / "sharded.npz")
    env = dict(os.environ)
    env["VVC_AFFINE_TPU_PLATFORM"] = "cpu"
    env.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    r = subprocess.run(
        [_sys.executable, "-c", _CHILD_SRC, mode, str(fw), str(fh),
         str(seed), out],
        env=env, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
        preexec_fn=_raise_stack, capture_output=True, text=True,
        timeout=3600)
    assert r.returncode == 0, (r.stdout[-800:], r.stderr[-2000:])
    got = np.load(out)
    np.testing.assert_array_equal(got["sc2"], got["c2"])
    np.testing.assert_array_equal(got["sp2"], got["p2"])
    np.testing.assert_array_equal(got["sc3"], got["c3"])
    np.testing.assert_array_equal(got["sp3"], got["p3"])
