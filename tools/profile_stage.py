"""Per-piece TPU timing of the dense engine's evaluate pipeline.

Times, via on-device scalar-reduction fetches (the only reliable barrier on
the tunnelled platform), the individual pieces of one 2CP evaluate at
1080p: MV/tap plane construction, the warp kernel at each dispatch rung,
the escape fix-up, the SATD/gradient/moment reductions, and the solver —
plus the full stage for reference.  Run on the TPU:

    python tools/profile_stage.py [WxH] [--half]

--half profiles the HALF (half-aligned CU) mode instead of FULL
(per-mode numbers recorded in docs/ab_r05.md section 5).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np


def timed(fn, *args, n=3, **kw):
    import jax.numpy as jnp

    out = fn(*args, **kw)   # compile + warm
    _sync(out)
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args, **kw)
        _sync(out)
        ts.append(time.time() - t0)
    return min(ts)


def _sync(out):
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    acc = None
    for x in leaves:
        if hasattr(x, "dtype"):
            v = x.ravel()[0].astype("int32") if x.size else 0
            acc = v if acc is None else acc + v
    np.asarray(acc)


def main():
    import jax
    import jax.numpy as jnp

    from vvc_affine_tpu.models import affine_plane as ap
    from vvc_affine_tpu.ops import warp as warp_ops

    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    res = pos[0] if pos else "1920x1080"
    fw, fh = (int(v) for v in res.split("x"))
    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.integers(0, 1024, size=(fh * fw,)).astype(np.int32))
    orig = jnp.asarray(rng.integers(0, 1024, size=(fh * fw,)).astype(np.int32))
    lam = jnp.float32(78.949063)

    # knob flags: --mxu / --no-mxu etc.; absent -> the shipped default
    knobs = {}
    for flag, name in (("mxu", "mxu_reduce"), ("i16taps", "i16_taps"),
                       ("f32", "f32_warp"), ("rebase", "rebase"),
                       ("mom", "plane_moments"), ("fused", "fused_reduce")):
        if f"--{flag}" in sys.argv:
            knobs[name] = True
        elif f"--no-{flag}" in sys.argv:
            knobs[name] = False
    mode = "half" if "--half" in sys.argv else "full"
    spec = ap.PlaneSpec(mode, 2, fw, fh, **knobs)
    i16 = spec.i16_taps
    t = ap.build_tables(spec)
    dyn = ap.dyn_tables(t)

    # the tunnel's fixed device->host scalar-fetch cost: subtract this
    # floor from every number below to get real execution time
    nullfn = jax.jit(lambda x: x + 1)
    print(f"fetch floor: {timed(nullfn, jnp.int32(1))*1e3:8.2f} ms")

    prep = jax.jit(lambda r, o: ap.prep_inputs(spec, t, r, o))
    print(f"prep_inputs: {timed(prep, ref, orig)*1e3:8.2f} ms")
    tiles, orig_pl, ref_pl = prep(ref, orig)
    orig_forms = ap._orig_forms(spec, orig_pl)

    # motion planes at a fixed small CPMV (rung-1 territory)
    cp = jnp.full((t.n_ctus, t.n_cus, 3, 2), 52, jnp.int32)  # 3.25 px

    mvfn = jax.jit(lambda c: ap._mv_planes(spec, t, dyn, c))
    print(f"mv_planes:   {timed(mvfn, cp)*1e3:8.2f} ms")
    dy, dx, fx, fy = mvfn(cp)
    td = jnp.int16 if i16 else jnp.int32
    tapfn = jax.jit(lambda a, b: (ap._tap_planes(a, td), ap._tap_planes(b, td)))
    print(f"tap_planes:  {timed(tapfn, fx, fy)*1e3:8.2f} ms")
    hc, vc = tapfn(fx, fy)

    for R in (2, 4, 8):
        kfn = jax.jit(lambda tl, a, b, c, d, R=R: ap._warp_kernel_only(
            spec, t, tl, a, b, c, d, R))
        ms = timed(kfn, tiles, dy, dx, hc, vc) * 1e3
        print(f"warp R={R}:    {ms:8.2f} ms")

    if spec.rebase:
        # the SHIPPED kernel pieces: per-slab base computation (the rebase
        # dispatch overhead) + the rebased kernel at every ladder rung
        mvv = jax.jit(lambda c: ap._mv_planes(spec, t, dyn, c,
                                              with_valid=True))
        _, _, _, _, val = mvv(cp)
        basefn = jax.jit(lambda a, b, v: ap._rebase_bases(
            spec.r_ladder, a, b, v))
        floor_s = timed(nullfn, jnp.int32(1))
        print(f"rebase_bases:{timed(basefn, dy, dx, val)*1e3:8.2f} ms")
        by0, bx0, dy_k, dx_k, _ = basefn(dy, dx, val)
        rung_ms = {}
        for R in spec.r_ladder:
            kfn = jax.jit(lambda tl, a, b, c, d, by, bx, R=R:
                          ap._warp_kernel_only(spec, t, tl, a, b, c, d, R,
                                               base_y=by, base_x=bx))
            ms = timed(kfn, tiles, dy_k, dx_k, hc, vc, by0, bx0) * 1e3
            rung_ms[R] = ms - floor_s * 1e3
            print(f"warp rb R={R}: {ms:8.2f} ms")
        # Dispatch-cost-model guard: units() is an interpolation over
        # MEASURED rung times; a kernel change that shifts the real rung
        # costs silently skews rung selection (perf only — escapes stay
        # exact), so flag any model point drifting >25% from this run.
        meas = {r: v * 10 for r, v in rung_ms.items()}   # ms -> model units
        drift = []
        for r in spec.r_ladder:
            want = ap.dispatch_units(r, spec.rebase_mode)
            rel = abs(meas[r] - want) / max(want, 1e-9)
            drift.append((r, want, meas[r], rel))
        worst = max(d[3] for d in drift)
        status = "OK" if worst <= 0.25 else "STALE — refit affine_plane.units()"
        print(f"cost model vs measured ({spec.rebase_mode}): "
              + ", ".join(f"R={r} model {w:.0f} meas {m:.0f}"
                          for r, w, m, _ in drift)
              + f" -> {status}")
    pred = jax.jit(lambda tl, a, b, c, d: ap._warp_kernel_only(
        spec, t, tl, a, b, c, d, 8))(tiles, dy, dx, hc, vc)

    fixfn = jax.jit(lambda p, a, b, c, d: ap._escape_fixup(
        spec, t, dyn, ref, p, a, b, c, d, jnp.int32(8)))
    print(f"escape_fix:  {timed(fixfn, pred, dy, dx, hc, vc)*1e3:8.2f} ms")

    redfn = jax.jit(lambda p: ap._reduce_pred(spec, t, p, orig_forms,
                                              dyn.within, True))
    print(f"reduce_pred: {timed(redfn, pred)*1e3:8.2f} ms")
    satdfn = jax.jit(lambda p: ap._reduce_pred(spec, t, p, orig_forms,
                                               dyn.within, False))
    print(f"  satd only: {timed(satdfn, pred)*1e3:8.2f} ms")

    _, M, rhs = redfn(pred)
    from vvc_affine_tpu.ops import solver as solver_ops
    solfn = jax.jit(lambda M, r: solver_ops.solve_affine(M, r, 2))
    print(f"solver:      {timed(solfn, M, rhs)*1e3:8.2f} ms")

    evfn = jax.jit(lambda c: ap._evaluate(spec, t, dyn, ref, tiles,
                                          orig_forms, c, True))
    print(f"evaluate:    {timed(evfn, cp)*1e3:8.2f} ms")

    # same evaluate with a single-rung ladder: the difference isolates the
    # adaptive-dispatch machinery (admax scan, switch, pass-2 merge)
    spec1 = ap.PlaneSpec(spec.mode, spec.n_cp, fw, fh, adaptive=False,
                         **knobs)
    t1 = ap.build_tables(spec1)
    dyn1 = ap.dyn_tables(t1)
    ev1 = jax.jit(lambda c: ap._evaluate(spec1, t1, dyn1, ref, tiles,
                                         orig_forms, c, True))
    print(f"eval R8-only:{timed(ev1, cp)*1e3:8.2f} ms")

    stage = ap.build_stage(spec)
    z = ap.zero_cpmvs(spec)
    print(f"full stage:  {timed(stage, ref, orig, lam, z, n=2)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
