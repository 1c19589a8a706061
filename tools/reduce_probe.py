"""Breakdown timing of the fused reduction path (round-5 tuning tool).

Times, on the real TPU: the blockreduce kernel alone (refine/satd-only),
the SATD consumption, the moment/term assembly, and _reduce_pred through
both the fused and unfused paths — so regressions localize to the kernel
or to the XLA-side consumption.

    python tools/reduce_probe.py [WxH]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from profile_stage import timed  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from vvc_affine_tpu.models import affine_plane as ap
    from vvc_affine_tpu.ops import blockreduce as br

    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    res = pos[0] if pos else "1920x1080"
    fw, fh = (int(v) for v in res.split("x"))
    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.integers(0, 1024, size=(fh * fw,)).astype(np.int32))
    orig = jnp.asarray(rng.integers(0, 1024, size=(fh * fw,)).astype(np.int32))

    spec = ap.PlaneSpec("full", 2, fw, fh, fused_reduce=True)
    spec_u = ap.PlaneSpec("full", 2, fw, fh, fused_reduce=False)
    t = ap.build_tables(spec)
    dyn = ap.dyn_tables(t)

    nullfn = jax.jit(lambda x: x + 1)
    floor = timed(nullfn, jnp.int32(1)) * 1e3
    print(f"fetch floor: {floor:8.2f} ms")

    prep = jax.jit(lambda r, o: ap.prep_inputs(spec, t, r, o))
    tiles, orig_pl, ref_pl = prep(ref, orig)
    of_f = ap._orig_forms(spec, orig_pl)
    of_u = ap._orig_forms(spec_u, orig_pl)

    pred = jnp.asarray(rng.integers(
        0, 1024, size=(t.n_ctus, t.n_bins, 128, 128)).astype(np.int16))
    masks = jnp.asarray(t.border_packed)
    act = jnp.asarray(t.slab_active)

    kfn = jax.jit(lambda p, o: br.reduce_pallas(p, o, masks, act, True))
    print(f"kernel refine:  {timed(kfn, pred, of_f.plane16)*1e3:8.2f} ms")
    ksfn = jax.jit(lambda p, o: br.reduce_pallas(p, o, masks, act, False))
    print(f"kernel satd:    {timed(ksfn, pred, of_f.plane16)*1e3:8.2f} ms")

    satd_l, moms_l = kfn(pred, of_f.plane16)

    import vvc_affine_tpu.planes as P

    def satd_consume(sl):
        sc = sl[..., 3::4]
        cols = []
        for ci, cp_tab in enumerate(t.cls):
            bi = int(t.bin_of[ci])
            cols.append(P.reduce_slots_to_cu(
                jnp, jnp.where(jnp.asarray(cp_tab.slot_valid),
                               sc[:, bi].astype(jnp.int64), 0), cp_tab))
        return jnp.where(jnp.asarray(t.within),
                         jnp.concatenate(cols, axis=1), 0)

    print(f"satd consume:   {timed(jax.jit(satd_consume), satd_l)*1e3:8.2f} ms")

    full_f = jax.jit(lambda p: ap._reduce_pred(spec, t, p, of_f,
                                               dyn.within, True))
    print(f"fused reduce:   {timed(full_f, pred)*1e3:8.2f} ms")
    full_u = jax.jit(lambda p: ap._reduce_pred(spec_u, t, p, of_u,
                                               dyn.within, True))
    print(f"unfused reduce: {timed(full_u, pred)*1e3:8.2f} ms")

    # cross-check exactness on hardware
    gf = full_f(pred)
    gu = full_u(pred)
    for name, a, b in (("satd", gf[0], gu[0]), ("M", gf[1], gu[1]),
                       ("rhs", gf[2], gu[2])):
        ok = bool(jnp.array_equal(a, b))
        print(f"parity {name}: {'OK' if ok else 'MISMATCH'}")

    # stage-level A/B
    for name, s in (("fused", spec), ("unfused", spec_u)):
        stage = ap.build_stage(s)
        z = ap.zero_cpmvs(s)
        lam = jnp.float32(78.949063)
        print(f"full stage {name}: "
              f"{timed(stage, ref, orig, lam, z, n=2)*1e3:8.2f} ms")


def tail_main():
    """Time the term-assembly tail + compaction variants in isolation."""
    import jax
    import jax.numpy as jnp

    from vvc_affine_tpu.models import affine_plane as ap
    import vvc_affine_tpu.planes as P

    pos = [a for a in sys.argv[2:] if not a.startswith("--")]
    res = pos[0] if pos else "1920x1080"
    fw, fh = (int(v) for v in res.split("x"))
    rng = np.random.default_rng(0)
    spec = ap.PlaneSpec("full", 2, fw, fh)
    t = ap.build_tables(spec)

    nullfn = jax.jit(lambda x: x + 1)
    print(f"fetch floor: {timed(nullfn, jnp.int32(1))*1e3:8.2f} ms")

    # block-compact moments (the unfused path's intermediate form)
    moms = jnp.asarray(rng.integers(
        -(1 << 28), 1 << 28,
        size=(t.n_ctus, t.n_bins, 5, 32, 32)).astype(np.int64))
    moms_l = jnp.asarray(rng.integers(
        -(1 << 26), 1 << 26,
        size=(t.n_ctus, t.n_bins, 5, 32, 128)).astype(np.int32))

    f_blk = jax.jit(lambda m: ap._assemble_equations(
        spec, t, [m[:, bi] for bi in range(t.n_bins)],
        jnp.asarray(t.within)))
    print(f"terms blk  i64: {timed(f_blk, moms)*1e3:8.2f} ms")

    # 4-lane fold + terms: the shipped fused consumption
    def fold_terms(m):
        mc = m[..., 0::4] + m[..., 1::4] + m[..., 2::4] + m[..., 3::4]
        return ap._assemble_equations(
            spec, t, [mc[:, bi].astype(jnp.int64) for bi in range(t.n_bins)],
            jnp.asarray(t.within))
    f_cmp2 = jax.jit(fold_terms)
    print(f"fold+terms blk: {timed(f_cmp2, moms_l)*1e3:8.2f} ms")

    # unfused moment construction alone (sobel+products+blocks16+sums)
    pred = jnp.asarray(rng.integers(
        0, 1024, size=(t.n_ctus, t.n_bins, 128, 128)).astype(np.int16))
    orig_pl = jnp.asarray(rng.integers(
        0, 1024, size=(t.n_ctus, 128, 128)).astype(np.int32))

    def unf_moments(pred, orig_pl):
        orig16 = ap._blocks16(orig_pl)
        out = []
        for bi in range(t.n_bins):
            plane = pred[:, bi]
            gx, gy = ap._sobel_replicated(
                plane, t.bin_row_top[bi], t.bin_row_bot[bi],
                t.bin_col_left[bi], t.bin_col_right[bi])
            pred16 = ap._blocks16(plane).astype(jnp.int32)
            err16 = orig16 - pred16
            gx16 = ap._blocks16(gx).astype(jnp.int32)
            gy16 = ap._blocks16(gy).astype(jnp.int32)
            prods = jnp.stack(
                [gx16 * gx16, gx16 * gy16, gy16 * gy16,
                 gx16 * err16, gy16 * err16], axis=1)
            out.append(prods.sum(-2).reshape(
                prods.shape[:2] + (32, 32)).astype(jnp.int64))
        return jnp.stack(out, 1)
    f_unf = jax.jit(unf_moments)
    print(f"unf moments:    {timed(f_unf, pred, orig_pl)*1e3:8.2f} ms")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "tail":
        tail_main()
    else:
        main()
