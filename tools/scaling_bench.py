"""Scaling-efficiency bench: the CTU-sharded dense stage over mesh sizes.

Strong-scaling measurement of the shipping plane engine
(`parallel.mesh.build_plane_stage_sharded`) at every requested chip count:
one fixed frame workload, timed per mesh size, with efficiency relative to
the smallest measured chip count n0 (eff(n) = n0*t_n0 / (n*t_n); n0 = 1
unless --chips starts higher).  The measured analogue of the scaling
argument in docs/scaling.md — the iteration loop has no collectives, so
efficiency is bounded only by replicated frame prep.  (The reference is
single-device; its scaling axis is the per-launch work-group count,
main.cpp:757,890 — this tool scales the same CTU axis over a TPU mesh.)

Run on hardware:

    python tools/scaling_bench.py [WxH] [--chips 1,2,4,8] [--mode full|half]

Plumbing check without TPUs (virtual 8-device CPU mesh; timings
meaningless):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    VVC_AFFINE_TPU_PLATFORM=cpu python tools/scaling_bench.py 256x128

Prints one JSON line per mesh size.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np


def _sync(out):
    import jax

    acc = None
    for x in jax.tree_util.tree_leaves(out):
        if hasattr(x, "dtype"):
            v = x.ravel()[0].astype("int32") if x.size else 0
            acc = v if acc is None else acc + v
    np.asarray(acc)  # device->host fetch: the only reliable barrier here


def timed(fn, *args, n=3):
    out = fn(*args)  # compile + warm
    _sync(out)
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        _sync(out)
        ts.append(time.time() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    from vvc_affine_tpu import geometry as G
    from vvc_affine_tpu.models import affine_plane
    from vvc_affine_tpu.parallel import mesh as pmesh

    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    res = pos[0] if pos else "1920x1080"
    fw, fh = (int(v) for v in res.split("x"))
    mode = "half" if "--mode" in sys.argv and sys.argv[
        sys.argv.index("--mode") + 1] == "half" else "full"
    devs = jax.devices()
    if "--chips" in sys.argv:
        chips = [int(c) for c in
                 sys.argv[sys.argv.index("--chips") + 1].split(",")]
    else:
        chips = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devs)]
    chips = [n for n in chips if n <= len(devs)]

    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.integers(0, 1024, (fh * fw,)).astype(np.int32))
    orig = jnp.asarray(rng.integers(0, 1024, (fh * fw,)).astype(np.int32))
    lam = jnp.float32(78.949063)
    spec = affine_plane.PlaneSpec(mode, 2, fw, fh)
    prev = affine_plane.zero_cpmvs(spec)
    n_ctus = G.frame_grid(fw, fh).num_ctus
    cus = n_ctus * G.layout(mode).cus_per_ctu

    t1 = None
    for n in chips:
        run = pmesh.build_plane_stage_sharded(spec, pmesh.make_mesh(devs[:n]))
        t = timed(run, ref, orig, lam, prev)
        if t1 is None:
            t1 = t
        print(json.dumps({
            "chips": n, "mode": mode, "resolution": res,
            "sec_per_stage": round(t, 4),
            "cus_per_sec": round(cus / t, 1),
            # baseline = the SMALLEST measured chip count (chips[0]), which
            # is 1 unless --chips starts higher
            "baseline_chips": chips[0],
            "speedup_vs_baseline": round(t1 / t, 3),
            "efficiency": round(t1 * chips[0] / (n * t), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
