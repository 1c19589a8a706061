"""Engine behaviour on realistic affine-true content.

The iid-noise fixtures elsewhere in the suite exercise bit-exactness but
not the engine's *dispatch* behaviour: on camera-like content the CPMVs
converge onto a coherent affine field, most blocks ride the narrow ladder
rungs, and only genuinely fast-moving regions hit the escape fix-up.
These tests run the full pipeline on vvc_affine_tpu.testing.affine_gop
content (global pan+zoom+rotate, a faster local object, coding noise on
the recon frames) and check:

* plane vs gather decision logs stay byte-identical through the CLI
  (the realistic-content analogue of test_gop_parity);
* the escape telemetry stays inside budget: zero whole-frame fallbacks
  (the multi-second exact path must never fire on realistic motion) while
  the fast object exercises the per-block fix-up.

Reference behaviour being covered: the always-pay per-sub-block window
gather this dispatch ladder replaced (affine.cl:288-326).
"""

import os

import numpy as np
import pytest

from vvc_affine_tpu import testing as fixtures
from vvc_affine_tpu.runtime import frames as frames_io


def test_affine_gop_fixture_properties():
    orig, recon = fixtures.affine_gop(192, 128, 2, seed=7)
    assert orig.shape == (2, 128, 192) and recon.shape == (2, 128, 192)
    assert orig.dtype == np.uint16 and recon.dtype == np.uint16
    assert orig.max() <= 1023 and recon.max() <= 1023
    # recon[t] is orig's predecessor frame + noise: POC t vs POC t+1 differ
    assert not np.array_equal(orig[0], recon[0])
    # global pan (2, -1.5)/frame: the best-matching reference patch for a
    # current-frame crop sits at offset -pan (content moved BY pan, so the
    # motion vector back to the reference is its negation)
    a = orig[0, 24:104, 32:160].astype(np.float64)
    best, arg = None, None
    for dy in range(-4, 5):
        for dx in range(-4, 5):
            b = recon[0].astype(np.float64)[24 + dy:104 + dy,
                                            32 + dx:160 + dx]
            err = ((a - b) ** 2).mean()
            if best is None or err < best:
                best, arg = err, (dy, dx)
    assert arg in ((-2, 1), (-2, 2)), arg


def _write_fixture(tmp, fw, fh, n, **kw):
    orig, recon = fixtures.affine_gop(fw, fh, n, **kw)
    opath = os.path.join(tmp, "orig.csv")
    rpath = os.path.join(tmp, "ref.csv")
    frames_io.write_frames_csv(opath, orig)
    frames_io.write_frames_csv(rpath, recon)
    return opath, rpath, orig, recon


@pytest.mark.slow
def test_realistic_gop_engines_match_cli(tmp_path):
    from vvc_affine_tpu import cli

    tmp = str(tmp_path)
    fw, fh, n = 192, 128, 2
    opath, rpath, _, _ = _write_fixture(tmp, fw, fh, n, seed=3)
    for engine in ("plane", "gather"):
        rc = cli.main([
            "-f", str(n), "-s", f"{fw}x{fh}", "-q", "32",
            "-o", opath, "-r", rpath,
            "-l", os.path.join(tmp, f"{engine}_"),
            "--Engine", engine,
        ])
        assert rc == 0
    a = sorted(f for f in os.listdir(tmp) if f.startswith("plane_"))
    b = sorted(f for f in os.listdir(tmp) if f.startswith("gather_"))
    assert a and len(a) == len(b)
    for af, bf in zip(a, b):
        with open(os.path.join(tmp, af)) as fa, \
                open(os.path.join(tmp, bf)) as fb:
            assert fa.read() == fb.read(), af


@pytest.mark.slow
def test_realistic_motion_telemetry():
    """Escape-budget telemetry on realistic motion: no whole-frame
    fallbacks; the fast local object (|v| ~ 11 px/frame > R=8) exercises
    the per-block fix-up without blowing the budget."""
    from vvc_affine_tpu.models.pipeline import (AffineMEPipeline,
                                                PipelineConfig)
    from vvc_affine_tpu.runtime.reporting import Timing

    fw, fh, n = 192, 128, 2
    orig, recon = fixtures.affine_gop(fw, fh, n, seed=3)
    pipe = AffineMEPipeline(PipelineConfig(frame_w=fw, frame_h=fh, qp=32))
    timing = Timing()
    pipe.encode(orig.astype(np.int32), recon.astype(np.int32), timing=timing)
    assert timing.fallbacks == 0, (
        "whole-frame exact fallback fired on realistic motion "
        f"(escapes={timing.escapes}, max_groups={timing.max_groups})")
    # the object moves beyond the widest rung: fix-ups should fire, and
    # stay well under the per-evaluate budget (4096 blocks)
    assert timing.max_groups <= 48, timing.max_groups
    # the rung-choice histogram must reach production telemetry (the
    # counter that exposed the round-4 realistic-content pathology) and
    # the timing report must print it.  On CPU the engine rides the exact
    # warp_xla path (no adaptive dispatch), so the pipeline wiring above
    # only proves the plumbing carries zeros; accumulate counts explicitly
    # to verify the report surface.
    timing.add_escapes(0, 0, 0, rung_hist=[3, 1, 0, 0])
    timing.add_escapes(0, 0, 0, rung_hist=[1, 0, 2, 0])
    assert timing.rung_hist[:4] == [4, 1, 2, 0]
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        timing.report(n_frames=n)
    assert "RUNG_HIST,4,1,2,0" in buf.getvalue()
    print(f"telemetry: escapes={timing.escapes} "
          f"max_groups={timing.max_groups} fallbacks={timing.fallbacks} "
          f"rung_hist={timing.rung_hist[:4]}")
