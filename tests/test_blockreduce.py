"""Fused Mosaic reduction kernel (ops.blockreduce) vs the unfused XLA path.

The fused kernel must produce bit-identical per-CU SATD and normal-equation
systems for any prediction plane — it replaces the sample-major _blocks16
relayout path (the round-4 profile's 56%-of-evaluate bottleneck) in the
shipped engine, with the unfused path kept as the exactness oracle.
Interpret mode on CPU; the TPU-compiled kernel is covered by
tools/tpu_parity.py and the bench goldens.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vvc_affine_tpu.models import affine_plane as ap

FW, FH = 384, 256


def _specs(mode, n_cp, **kw):
    fused = ap.PlaneSpec(mode, n_cp, FW, FH, use_pallas=True, interpret=True,
                         fused_reduce=True, **kw)
    ref = ap.PlaneSpec(mode, n_cp, FW, FH, use_pallas=False,
                       fused_reduce=False, **kw)
    return fused, ref


def _random_inputs(t, n_bins, seed=0):
    rng = np.random.default_rng(seed)
    pred = rng.integers(0, 1024, size=(t.n_ctus, n_bins, 128, 128))
    orig = rng.integers(0, 1024, size=(t.n_ctus, 128, 128))
    return (jnp.asarray(pred.astype(np.int16)),
            jnp.asarray(orig.astype(np.int32)))


@pytest.mark.parametrize("mode", ["full", "half"])
@pytest.mark.parametrize("refine", [True, False])
def test_reduce_pred_fused_matches_unfused(mode, refine):
    spec_f, spec_r = _specs(mode, 3)
    t = ap.build_tables(spec_f)
    pred, orig_pl = _random_inputs(t, t.n_bins)
    within = jnp.asarray(t.within)

    got = ap._reduce_pred(spec_f, t, pred, ap._orig_forms(spec_f, orig_pl),
                          within, refine)
    want = ap._reduce_pred(spec_r, t, pred, ap._orig_forms(spec_r, orig_pl),
                           within, refine)
    assert ap._fused_active(spec_f) and not ap._fused_active(spec_r)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    if refine:
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
        np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(want[2]))
    else:
        assert got[1] is None and want[1] is None


def test_reduce_pred_fused_one_bin_broadcast():
    """The zero-MV closed form passes a length-1 bin axis."""
    spec_f, spec_r = _specs("full", 2)
    t = ap.build_tables(spec_f)
    pred, orig_pl = _random_inputs(t, 1, seed=3)
    within = jnp.asarray(t.within)

    got = ap._reduce_pred(spec_f, t, pred, ap._orig_forms(spec_f, orig_pl),
                          within, True)
    want = ap._reduce_pred(spec_r, t, pred, ap._orig_forms(spec_r, orig_pl),
                           within, True)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_mxu_satd_variant_matches_rolls():
    """The MXU-dot horizontal Hadamard (mxu_satd, off by default for its
    deferred-build cost, docs/ab_r05.md) must stay bit-identical to the
    shipped lane-rotate form."""
    import jax.numpy as jnp

    from vvc_affine_tpu.ops import blockreduce as br

    spec = ap.PlaneSpec("full", 2, FW, FH, use_pallas=True, interpret=True)
    t = ap.build_tables(spec)
    pred, orig_pl = _random_inputs(t, t.n_bins, seed=7)
    orig16 = orig_pl.astype(jnp.int16)
    masks = jnp.asarray(t.border_packed)
    act = jnp.asarray(t.slab_active)
    a = br.reduce_pallas(pred, orig16, masks, act, True, interpret=True,
                         mxu_satd=False)
    b = br.reduce_pallas(pred, orig16, masks, act, True, interpret=True,
                         mxu_satd=True)
    # compare only defined outputs (active slabs' block rows), via the
    # same strided compaction the engine uses
    rowmask = jnp.asarray(t.slab_active).repeat(2, -1)[..., None]
    np.testing.assert_array_equal(np.asarray(a[0][..., 3::4] * rowmask),
                                  np.asarray(b[0][..., 3::4] * rowmask))
