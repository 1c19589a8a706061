"""Capture a JAX-profiler trace of one 1080p frame-ref on hardware.

The reference reads per-kernel device times via clGetEventProfilingInfo
(main.cpp:862-866); this is the TPU analogue: a profiler trace of the full
4-stage frame-ref (after warmup), plus a parsed per-op summary so the
numbers land in the repo without needing TensorBoard.

    python tools/xprof_trace.py [WxH] [--out DIR]

Writes the raw trace under DIR (default /tmp/vvc_xprof) and prints a
device-op summary table (top ops by self time) parsed from the .trace.json.gz
/ .xplane.pb artifacts when possible.
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vvc_affine_tpu import geometry as G
    from vvc_affine_tpu.models import affine_plane

    out_dir = "/tmp/vvc_xprof"
    if "--out" in sys.argv:
        out_dir = sys.argv[sys.argv.index("--out") + 1]
    pos = [a for a in sys.argv[1:]
           if not a.startswith("--") and a != out_dir]
    res = pos[0] if pos else "1920x1080"
    fw, fh = (int(v) for v in res.split("x"))
    os.makedirs(out_dir, exist_ok=True)

    # knob flags: --mxu / --no-mxu etc.; absent -> the shipped default
    knobs = {}
    for flag, name in (("mxu", "mxu_reduce"), ("i16taps", "i16_taps"),
                       ("f32", "f32_warp"), ("rebase", "rebase"),
                       ("mom", "plane_moments")):
        if f"--{flag}" in sys.argv:
            knobs[name] = True
        elif f"--no-{flag}" in sys.argv:
            knobs[name] = False

    rng = np.random.default_rng(2024)
    yy, xx = np.mgrid[0:fh, 0:fw]
    base = 512 + 300 * np.sin(xx / 37.0) * np.cos(yy / 29.0)
    ref_np = np.clip(base + rng.integers(-64, 64, size=(fh, fw)), 0, 1023)
    orig_np = np.clip(np.roll(ref_np, (3, -2), axis=(0, 1))
                      + rng.integers(-24, 24, size=(fh, fw)), 0, 1023)
    ref = jnp.asarray(ref_np.astype(np.int32).ravel())
    orig = jnp.asarray(orig_np.astype(np.int32).ravel())
    lam = jnp.float32(78.949063)

    # the shipped dispatch shape: fused 2CP->3CP pair programs with
    # telemetry, exactly as the pipeline and bench build them (shares
    # their compile-cache entries)
    stages = {
        mode: affine_plane.build_pair_stage(
            affine_plane.PlaneSpec(mode, 2, fw, fh, **knobs),
            affine_plane.PlaneSpec(mode, 3, fw, fh, **knobs),
            telemetry=True)
        for mode in ("full", "half")
    }
    zeros = {
        mode: affine_plane.zero_cpmvs(affine_plane.PlaneSpec(mode, 2, fw, fh))
        for mode in ("full", "half")
    }

    def one_pass():
        outs = []
        for mode in ("full", "half"):
            c2, _, c3, _, _, _ = stages[mode](ref, orig, lam, zeros[mode])
            outs.append((c2, c3))
        for c2, c3 in outs:
            np.asarray(c2)  # the only reliable barrier on the tunnel
            np.asarray(c3)

    one_pass()  # compile + first-run warmup outside the trace
    one_pass()

    with jax.profiler.trace(out_dir):
        one_pass()

    print(f"trace written under {out_dir}")
    _summarize(out_dir)


def _summarize(out_dir, top=32):
    """Per-op device SELF-time table from the trace.json.gz event dump.

    Device op events nest (while -> conditional -> branch fns -> ops), so
    naive per-name duration sums double-count every container; this walks
    each device lane as an interval stack and charges each span only its
    self time (duration minus direct children) — the device-time
    attribution the reference reads per kernel from
    clGetEventProfilingInfo (main.cpp:862-866).
    """
    paths = sorted(glob.glob(os.path.join(
        out_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        print("no trace.json.gz artifact found (xplane.pb only); "
              "inspect with tensorboard's profile plugin")
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if any(k in nm for k in ("TPU", "Device", "/device:")):
                dev_pids.add(e.get("pid"))
    lanes = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            lanes.setdefault((e["pid"], e.get("tid")), []).append(e)
    self_us = {}
    for evs in lanes.values():
        evs.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack = []
        for e in evs:
            ts, dur, nm = e["ts"], float(e["dur"]), e["name"]
            while stack and ts >= stack[-1][0] + stack[-1][1]:
                stack.pop()
            if stack:
                self_us[stack[-1][2]] = self_us.get(stack[-1][2], 0.0) - dur
            self_us[nm] = self_us.get(nm, 0.0) + dur
            stack.append((ts, dur, nm))
    total = sum(v for v in self_us.values() if v > 0)
    rows = sorted(self_us.items(), key=lambda kv: -kv[1])[:top]
    print(f"total device self-time: {total / 1e3:.1f} ms")
    width = max((len(k) for k, _ in rows), default=4)
    print(f"{'op (self time)':<{width}}  ms        share")
    for k, v in rows:
        print(f"{k:<{width}}  {v / 1e3:9.3f}  {100 * v / total:5.1f}%")


if __name__ == "__main__":
    main()
