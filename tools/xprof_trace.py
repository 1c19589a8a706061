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

    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    res = pos[0] if pos else "1920x1080"
    fw, fh = (int(v) for v in res.split("x"))
    out_dir = "/tmp/vvc_xprof"
    if "--out" in sys.argv:
        out_dir = sys.argv[sys.argv.index("--out") + 1]
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

    stages = {}
    for mode in ("full", "half"):
        for n_cp in (2, 3):
            spec = affine_plane.PlaneSpec(mode, n_cp, fw, fh, **knobs)
            stages[(mode, n_cp)] = affine_plane.build_stage(spec)
    zeros = {
        mode: affine_plane.zero_cpmvs(affine_plane.PlaneSpec(mode, 2, fw, fh))
        for mode in ("full", "half")
    }

    def one_pass():
        outs = []
        for mode in ("full", "half"):
            c2, p2 = stages[(mode, 2)](ref, orig, lam, zeros[mode])
            c3, p3 = stages[(mode, 3)](ref, orig, lam, p2)
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


def _summarize(out_dir):
    """Best-effort per-op table from the trace.json.gz event dump."""
    paths = sorted(glob.glob(os.path.join(
        out_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        print("no trace.json.gz artifact found (xplane.pb only); "
              "inspect with tensorboard's profile plugin")
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pick pids whose process name mentions TPU / device
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if any(k in nm for k in ("TPU", "Device", "/device:")):
                dev_pids.add(e.get("pid"))
    tot = {}
    for e in events:
        if e.get("ph") == "X" and (not dev_pids or e.get("pid") in dev_pids):
            nm = e.get("name", "?")
            tot[nm] = tot.get(nm, 0.0) + float(e.get("dur", 0.0))
    rows = sorted(tot.items(), key=lambda kv: -kv[1])[:25]
    width = max((len(k) for k, _ in rows), default=4)
    print(f"{'op':<{width}}  total_ms")
    for k, v in rows:
        print(f"{k:<{width}}  {v / 1e3:9.3f}")


if __name__ == "__main__":
    main()
