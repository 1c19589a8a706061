"""Diagnose the tunnel's deferred first-execution build cost.

docs/verification.md: even on full compilation-cache hits, the first
execution of each executable pays a minutes-scale device program build on
this platform.  This probe measures, in ONE fresh process with a warm
persistent cache, the trace/lower/compile wall time and the FIRST-RUN and
second-run wall time of each of the four 1080p stages separately — telling
us whether the cost is per-executable (then fewer/merged programs fix warm
start) or per-process (then nothing in the framework can).

    python tools/warmstart_probe.py [WxH]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from vvc_affine_tpu.models import affine_plane

    res = sys.argv[1] if len(sys.argv) > 1 else "1920x1080"
    fw, fh = (int(v) for v in res.split("x"))
    rng = np.random.default_rng(2024)
    ref = jnp.asarray(rng.integers(0, 1024, size=(fh * fw,)).astype(np.int32))
    orig = jnp.asarray(
        rng.integers(0, 1024, size=(fh * fw,)).astype(np.int32))
    lam = jnp.float32(78.949063)

    # Platform-floor anchors: first-exec cost of a TRIVIAL jitted program
    # and of a small-but-real one, in this same fresh process.  Whatever a
    # trivial program pays is the per-program platform floor (client/tunnel
    # handshake + deferred device build) that no framework structure can
    # remove; the shipped stages' first-run cost minus these floors is the
    # framework's actual share.
    import jax

    for name, fn, args in (
        ("trivial (x+1)", jax.jit(lambda x: x + 1), (jnp.int32(1),)),
        ("small matmul", jax.jit(
            lambda a: jnp.dot(a, a, precision="highest")),
         (jnp.ones((256, 256), jnp.float32),)),
    ):
        t0 = time.time()
        out = fn(*args)
        t1 = time.time()
        np.asarray(out).ravel()[:1]
        t2 = time.time()
        out = fn(*args)
        np.asarray(out).ravel()[:1]
        t3 = time.time()
        print(f"floor {name}: dispatch {t1 - t0:7.2f}s  "
              f"first_run {t2 - t1:7.2f}s  second_run {t3 - t2:6.3f}s",
              flush=True)

    t_start = time.time()
    # the SHIPPED executables: fused 2CP->3CP pair programs with telemetry
    # (one per alignment mode — what the pipeline, bench, and its warm
    # child actually build, so this measures their cache entries)
    for mode in ("full", "half"):
        s2 = affine_plane.PlaneSpec(mode, 2, fw, fh)
        s3 = affine_plane.PlaneSpec(mode, 3, fw, fh)
        prev = affine_plane.zero_cpmvs(s2)
        t0 = time.time()
        stage = affine_plane.build_pair_stage(s2, s3, telemetry=True)
        out = stage(ref, orig, lam, prev)
        t1 = time.time()
        np.asarray(out[0].sum())       # first-run barrier
        t2 = time.time()
        out = stage(ref, orig, lam, prev)
        np.asarray(out[0].sum())
        t3 = time.time()
        print(f"{mode}_pair: dispatch(trace+lower+compile) "
              f"{t1 - t0:7.2f}s  first_run {t2 - t1:7.2f}s  "
              f"second_run {t3 - t2:6.3f}s", flush=True)
    print(f"total process warm start: {time.time() - t_start:.2f}s")


if __name__ == "__main__":
    main()
