"""The dense plane engine must be bit-identical to the merged-group engine.

Both implement the affine_gradient_mult_sizes(_HA) behavioural spec; the
merged-group engine (models.affine_me) is itself validated against the
NumPy VTM oracle in test_engine_parity.py, so equality here transfers that
guarantee to the plane engine (models.affine_plane).

The plane-engine stages compile+run in FRESH child processes: XLA:CPU
aborts/segfaults compiling these (largest-in-suite) graphs late in a long
session, while identical compiles in a fresh process are solid — see
tests/conftest.py for the exec-time stack rlimit part of the story.
"""

import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from vvc_affine_tpu.models import affine_me

FW, FH = 416, 240
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD_SRC = """
import sys
import numpy as np
import jax.numpy as jnp
from vvc_affine_tpu.models import affine_plane

mode, fw, fh, seed, out_path = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
    sys.argv[5])
lams = [float(v) for v in sys.argv[6].split(",")]
rng = np.random.default_rng(seed)
ref = jnp.asarray(rng.integers(0, 1024, (fh * fw,)).astype(np.int32))
orig = jnp.asarray(rng.integers(0, 1024, (fh * fw,)).astype(np.int32))
spec2 = affine_plane.PlaneSpec(mode, 2, fw, fh, use_pallas=False)
run2 = affine_plane.build_stage(spec2)
z = affine_plane.zero_cpmvs(spec2)
out = {}
for i, lam in enumerate(lams):
    c2, p2 = run2(ref, orig, jnp.float32(lam), z)
    out[f"c2_{i}"] = np.asarray(c2)
    out[f"p2_{i}"] = np.asarray(p2)
spec3 = affine_plane.PlaneSpec(mode, 3, fw, fh, use_pallas=False)
run3 = affine_plane.build_stage(spec3)
c3, p3 = run3(ref, orig, jnp.float32(lams[0]), jnp.asarray(out["p2_0"]))
out["c3"] = np.asarray(c3)
out["p3"] = np.asarray(p3)
np.savez(out_path, **out)
"""


def _raise_stack():
    import resource

    soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
    want = 1 << 29
    new = want if hard == resource.RLIM_INFINITY else min(want, hard)
    resource.setrlimit(resource.RLIMIT_STACK, (new, hard))


def _run_plane_child(mode, seed, lams, out):
    env = dict(os.environ)
    env["VVC_AFFINE_TPU_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-c", _CHILD_SRC, mode, str(FW), str(FH),
         str(seed), out, ",".join(repr(v) for v in lams)],
        env=env, cwd=_REPO, preexec_fn=_raise_stack,
        capture_output=True, text=True, timeout=3600)
    assert r.returncode == 0, (r.stdout[-800:], r.stderr[-2000:])
    return np.load(out)


def _frames(seed):
    rng = np.random.default_rng(seed)
    ref = jnp.asarray(rng.integers(0, 1024, size=(FH * FW,)).astype(np.int32))
    orig = jnp.asarray(rng.integers(0, 1024, size=(FH * FW,)).astype(np.int32))
    return ref, orig


@pytest.mark.parametrize("mode", ["full", "half"])
def test_plane_engine_matches_gather_engine(mode, tmp_path):
    got = _run_plane_child(mode, 7, [57.54], str(tmp_path / "plane.npz"))
    ref, orig = _frames(7)
    lam = jnp.float32(57.54)
    z = affine_me.zero_cpmvs(affine_me.StageSpec(mode, 2, FW, FH))
    c_ref, p_ref = affine_me.build_stage(
        affine_me.StageSpec(mode, 2, FW, FH))(ref, orig, lam, z)
    np.testing.assert_array_equal(np.asarray(c_ref), got["c2_0"])
    np.testing.assert_array_equal(np.asarray(p_ref), got["p2_0"])
    # 3CP consumes the 2CP CPMVs (main.cpp:837)
    c3r, p3r = affine_me.build_stage(
        affine_me.StageSpec(mode, 3, FW, FH))(ref, orig, lam, p_ref)
    np.testing.assert_array_equal(np.asarray(c3r), got["c3"])
    np.testing.assert_array_equal(np.asarray(p3r), got["p3"])


_PAIR_CHILD_SRC = """
import sys
import numpy as np
import jax.numpy as jnp
from vvc_affine_tpu.models import affine_plane

mode, fw, fh, seed, out_path = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
    sys.argv[5])
rng = np.random.default_rng(seed)
ref = jnp.asarray(rng.integers(0, 1024, (fh * fw,)).astype(np.int32))
orig = jnp.asarray(rng.integers(0, 1024, (fh * fw,)).astype(np.int32))
lam = jnp.float32(57.54)
spec2 = affine_plane.PlaneSpec(mode, 2, fw, fh, use_pallas=False)
spec3 = affine_plane.PlaneSpec(mode, 3, fw, fh, use_pallas=False)
z = affine_plane.zero_cpmvs(spec2)
c2, p2, c3, p3 = affine_plane.build_pair_stage(spec2, spec3)(
    ref, orig, lam, z)
sc2, sp2 = affine_plane.build_stage(spec2)(ref, orig, lam, z)
sc3, sp3 = affine_plane.build_stage(spec3)(ref, orig, lam, sp2)
np.savez(out_path, c2=np.asarray(c2), p2=np.asarray(p2),
         c3=np.asarray(c3), p3=np.asarray(p3),
         sc2=np.asarray(sc2), sp2=np.asarray(sp2),
         sc3=np.asarray(sc3), sp3=np.asarray(sp3))
"""


def test_fused_pair_stage_matches_separate_stages(tmp_path):
    """The fused 2CP->3CP pair program (build_pair_stage — the pipeline's
    shipped dispatch shape) is bit-identical to the two separate stage
    programs, including the on-device CPMV handoff (main.cpp:837)."""
    out = str(tmp_path / "pair.npz")
    env = dict(os.environ)
    env["VVC_AFFINE_TPU_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-c", _PAIR_CHILD_SRC, "full", "256", "128",
         "13", out],
        env=env, cwd=_REPO, preexec_fn=_raise_stack,
        capture_output=True, text=True, timeout=3600)
    assert r.returncode == 0, (r.stdout[-800:], r.stderr[-2000:])
    got = np.load(out)
    np.testing.assert_array_equal(got["sc2"], got["c2"])
    np.testing.assert_array_equal(got["sp2"], got["p2"])
    np.testing.assert_array_equal(got["sc3"], got["c3"])
    np.testing.assert_array_equal(got["sp3"], got["p3"])


def test_qp_sweep_parity(tmp_path):
    """Engine parity across the standard QP sweep {22, 27, 32, 37}.

    Lambda is the only QP-dependent input to a stage (main.cpp:585), so the
    compiled stage is reused and only the scalar changes.
    """
    from vvc_affine_tpu import constants as C

    lams = [float(C.lambda_for(qp, 1)) for qp in (22, 27, 32, 37)]
    got = _run_plane_child("full", 11, lams, str(tmp_path / "sweep.npz"))
    ref, orig = _frames(11)
    f_ref = affine_me.build_stage(affine_me.StageSpec("full", 2, FW, FH))
    z = affine_me.zero_cpmvs(affine_me.StageSpec("full", 2, FW, FH))
    for i, lam in enumerate(lams):
        c_r, p_r = f_ref(ref, orig, jnp.float32(lam), z)
        np.testing.assert_array_equal(np.asarray(c_r), got[f"c2_{i}"])
        np.testing.assert_array_equal(np.asarray(p_r), got[f"p2_{i}"])
