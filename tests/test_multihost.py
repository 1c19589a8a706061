"""Multi-host (2-process CPU cluster) end-to-end: byte-identical logs.

Spawns two real processes that join a jax.distributed cluster (4 virtual
CPU devices each -> 8 global), run the CLI over the global CTU mesh, and
gather results to process 0's decision logs.  The logs must be
byte-identical to a plain single-process run — the multi-host analogue of
the reference's single-host readback+report path
(main_aux_functions.h:335-383, 387-525), which has no equivalent upstream.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

FW, FH = 256, 128   # 2 CTUs -> 8-way padded shard
N_FRAMES = 1


def _write_fixture(tmp, n_frames=N_FRAMES):
    rng = np.random.default_rng(21)
    refs, origs = [], []
    base = rng.integers(0, 1024, size=(FH, FW))
    for _ in range(n_frames):
        refs.append(base)
        base = np.clip(np.roll(base, (2, -1), axis=(0, 1))
                       + rng.integers(-16, 16, (FH, FW)), 0, 1023)
        origs.append(base)
    opath = os.path.join(tmp, "orig.csv")
    rpath = os.path.join(tmp, "ref.csv")
    for path, frames in ((opath, origs), (rpath, refs)):
        with open(path, "w") as f:
            for fr in frames:
                for row in fr:
                    f.write(",".join(str(int(v)) for v in row) + "\n")
    return opath, rpath


def _cli_cmd(opath, rpath, prefix, extra, n_frames=N_FRAMES):
    return [
        sys.executable, "-m", "vvc_affine_tpu.cli",
        "-f", str(n_frames), "-s", f"{FW}x{FH}", "-q", "32",
        "-o", opath, "-r", rpath, "-l", prefix, "--SkipHalf",
    ] + extra


def _raise_stack():
    # exec-time stack rlimit for the child: XLA:CPU compiles of big stage
    # graphs overflow the default 8 MB stack (see tests/conftest.py)
    import resource

    soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
    want = 1 << 29
    new = want if hard == resource.RLIM_INFINITY else min(want, hard)
    resource.setrlimit(resource.RLIMIT_STACK, (new, hard))


def _env(n_local_devices):
    env = dict(os.environ)
    # JAX_PLATFORMS alone is not enough: the axon site hook rewrites it at
    # interpreter startup, so use the package's explicit override
    env["JAX_PLATFORMS"] = "cpu"
    env["VVC_AFFINE_TPU_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}")
    env.pop("JAX_NUM_PROCESSES", None)
    return env


@pytest.mark.slow
def test_two_process_logs_match_single_process(tmp_path):
    tmp = str(tmp_path)
    opath, rpath = _write_fixture(tmp)

    # single-process reference run (8 virtual devices, sharded mesh)
    single_prefix = os.path.join(tmp, "single_")
    r = subprocess.run(
        _cli_cmd(opath, rpath, single_prefix, ["--NumChips", "8"]),
        env=_env(8), capture_output=True, text=True, timeout=1200,
        preexec_fn=_raise_stack)
    assert r.returncode == 0, r.stderr[-2000:]

    # two-process run over the same 8 global devices
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    multi_prefix = os.path.join(tmp, "multi_")
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            _cli_cmd(opath, rpath, multi_prefix, [
                "--Coordinator", f"localhost:{port}",
                "--NumProcesses", "2", "--ProcessId", str(pid)]),
            env=_env(4), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, preexec_fn=_raise_stack))
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    singles = sorted(f for f in os.listdir(tmp)
                     if f.startswith("single_") and f.endswith(".csv"))
    multis = sorted(f for f in os.listdir(tmp)
                    if f.startswith("multi_") and f.endswith(".csv"))
    assert singles and len(singles) == len(multis)
    for sf, mf in zip(singles, multis):
        assert sf[len("single_"):] == mf[len("multi_"):]
        with open(os.path.join(tmp, sf), "rb") as a, \
                open(os.path.join(tmp, mf), "rb") as b:
            assert a.read() == b.read(), sf


@pytest.mark.slow
def test_two_process_checkpoint_resume(tmp_path):
    """A desynced resume used to deadlock the cluster: only process 0 read
    the checkpoint, so followers entered the collective stages for frames
    the primary skipped.  Now the completed POC is broadcast; a 2-process
    resume must complete and produce logs byte-identical to a full run."""
    tmp = str(tmp_path)
    opath, rpath = _write_fixture(tmp, n_frames=2)

    # full-run reference logs (single process, 8 virtual devices)
    ref_prefix = os.path.join(tmp, "ref_")
    r = subprocess.run(
        _cli_cmd(opath, rpath, ref_prefix, ["--NumChips", "8"], n_frames=2),
        env=_env(8), capture_output=True, text=True, timeout=1200,
        preexec_fn=_raise_stack)
    assert r.returncode == 0, r.stderr[-2000:]

    # frame 1 only, checkpointed (single process) -> marker at POC 1
    res_prefix = os.path.join(tmp, "res_")
    ckpt = os.path.join(tmp, "ckpt")
    r = subprocess.run(
        _cli_cmd(opath, rpath, res_prefix,
                 ["--NumChips", "8", "--CheckpointDir", ckpt], n_frames=1),
        env=_env(8), capture_output=True, text=True, timeout=1200,
        preexec_fn=_raise_stack)
    assert r.returncode == 0, r.stderr[-2000:]

    # resume the 2-frame GOP on a 2-process cluster from the marker
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            _cli_cmd(opath, rpath, res_prefix, [
                "--Coordinator", f"localhost:{port}",
                "--NumProcesses", "2", "--ProcessId", str(pid),
                "--CheckpointDir", ckpt], n_frames=2),
            env=_env(4), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, preexec_fn=_raise_stack))
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    refs = sorted(f for f in os.listdir(tmp)
                  if f.startswith("ref_") and f.endswith(".csv"))
    ress = sorted(f for f in os.listdir(tmp)
                  if f.startswith("res_") and f.endswith(".csv"))
    assert refs and len(refs) == len(ress)
    for rf, sf in zip(refs, ress):
        assert rf[len("ref_"):] == sf[len("res_"):]
        with open(os.path.join(tmp, rf), "rb") as a, \
                open(os.path.join(tmp, sf), "rb") as b:
            assert a.read() == b.read(), rf
