"""GOP-level golden parity between the two engines through the full CLI.

The dense plane engine (shipping) and the gather engine (reference-shaped,
itself oracle-verified) must produce byte-identical decision logs over a
multi-frame GOP — covering the reference-buffer schedule, the 2CP->3CP
chain, and the log writer (main.cpp:578-1010 end to end).

The default test runs a small frame on CPU.  The full 1080p GOP golden run
(BASELINE.md parity workload) talks to the real TPU and is gated behind
VVC_GOP_1080P=1 — see docs/verification.md.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from vvc_affine_tpu.runtime import frames as frames_io


def _fixture(tmp, fw, fh, n):
    rng = np.random.default_rng(31)
    base = rng.integers(0, 1024, size=(fh, fw)).astype(np.int32)
    origs, refs = [], [base]
    prev = base
    for i in range(n):
        o = np.clip(np.roll(prev, (2, -1), axis=(0, 1))
                    + rng.integers(-12, 12, (fh, fw)), 0, 1023)
        origs.append(o)
        refs.append(o)
        prev = o
    opath = os.path.join(tmp, "orig.csv")
    rpath = os.path.join(tmp, "ref.csv")
    frames_io.write_frames_csv(opath, np.stack(origs).astype(np.uint16))
    frames_io.write_frames_csv(rpath, np.stack(refs[:n]).astype(np.uint16))
    return opath, rpath


def _diff_logs(tmp, a_prefix, b_prefix):
    a_files = sorted(f for f in os.listdir(tmp) if f.startswith(a_prefix))
    b_files = sorted(f for f in os.listdir(tmp) if f.startswith(b_prefix))
    assert a_files and len(a_files) == len(b_files)
    for af, bf in zip(a_files, b_files):
        with open(os.path.join(tmp, af)) as fa, \
                open(os.path.join(tmp, bf)) as fb:
            assert fa.read() == fb.read(), af


@pytest.mark.slow
def test_gop_engines_match_cli(tmp_path):
    from vvc_affine_tpu import cli

    tmp = str(tmp_path)
    fw, fh, n = 192, 128, 2
    opath, rpath = _fixture(tmp, fw, fh, n)
    for engine in ("plane", "gather"):
        rc = cli.main([
            "-f", str(n), "-s", f"{fw}x{fh}", "-q", "32",
            "-o", opath, "-r", rpath,
            "-l", os.path.join(tmp, f"{engine}_"),
            "--Engine", engine,
        ])
        assert rc == 0
    _diff_logs(tmp, "plane_", "gather_")


def _tpu_golden_run(tmp, fw, fh, n, timeout_s):
    """Plane vs gather decision logs through the CLI on the real TPU,
    each engine in its own subprocess; sequential, never concurrent."""
    opath, rpath = _fixture(tmp, fw, fh, n)
    env = dict(os.environ)
    env.pop("VVC_AFFINE_TPU_PLATFORM", None)
    env.pop("JAX_PLATFORMS", None)
    for engine in ("plane", "gather"):
        r = subprocess.run(
            [sys.executable, "-m", "vvc_affine_tpu.cli",
             "-f", str(n), "-s", f"{fw}x{fh}", "-q", "32",
             "-o", opath, "-r", rpath,
             "-l", os.path.join(tmp, f"{engine}_"),
             "--Engine", engine],
            env=env, capture_output=True, text=True, timeout=timeout_s)
        assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    _diff_logs(tmp, "plane_", "gather_")


@pytest.mark.slow
@pytest.mark.skipif(os.environ.get("VVC_GOP_1080P") != "1",
                    reason="1080p GOP golden run needs the real TPU; "
                           "set VVC_GOP_1080P=1 (do not run concurrently "
                           "with other TPU processes)")
def test_gop_1080p_engines_match_tpu(tmp_path):
    """BASELINE.md parity workload: -f 2 -s 1920x1080 -q 32, 4 pred types,
    multi-frame GOP — plane vs gather decision logs, byte-identical."""
    _tpu_golden_run(str(tmp_path), 1920, 1080, 2, 7200)


@pytest.mark.slow
@pytest.mark.skipif(os.environ.get("VVC_GOP_4K") != "1",
                    reason="4K GOP golden run needs the real TPU; "
                           "set VVC_GOP_4K=1 (do not run concurrently "
                           "with other TPU processes)")
def test_gop_4k_engines_match_tpu(tmp_path):
    """4K golden diff (constants.h:73-79 lists 3840x2160 -> 510 CTUs):
    plane vs gather at 3840x2160 through the CLI, byte-identical logs.
    One frame pair — the 510-CTU geometry is the coverage target; the
    multi-frame schedule is covered by the 1080p run."""
    _tpu_golden_run(str(tmp_path), 3840, 2160, 1, 14400)
