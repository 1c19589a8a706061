"""ops.blockstat (MXU per-block reductions) must match the sample-major
VPU path bit-for-bit — both at the op level (SATD / block sums, including
the magnitude extremes that bound the float32-exactness argument) and
through a full _evaluate (SATD + normal-equation moments) of the dense
engine.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vvc_affine_tpu.models import affine_plane as ap
from vvc_affine_tpu.ops import blockstat
from vvc_affine_tpu.ops import satd as satd_ops

NB = blockstat.NB


def _legacy_satd(orig_pl, pred):
    s = satd_ops.satd_4x4(ap._blocks16(orig_pl)[:, None], ap._blocks16(pred),
                          sample_axis=-2)
    return s.reshape(s.shape[:-1] + (NB, NB))


def test_satd_blocks_matches_sample_major():
    rng = np.random.default_rng(7)
    orig = jnp.asarray(rng.integers(0, 1024, (2, 128, 128)).astype(np.int32))
    pred = jnp.asarray(rng.integers(0, 1024, (2, 3, 128, 128)).astype(np.int16))
    got = np.asarray(blockstat.satd_blocks(orig[:, None], pred))
    want = np.asarray(_legacy_satd(orig, pred.astype(jnp.int32)))
    np.testing.assert_array_equal(got, want)


def test_satd_blocks_extreme_difference():
    # |d| = 1023 everywhere: the largest transform magnitudes the
    # float32-exactness bounds in blockstat must cover
    orig = jnp.full((1, 128, 128), 1023, jnp.int32)
    pred = jnp.zeros((1, 1, 128, 128), jnp.int16)
    got = np.asarray(blockstat.satd_blocks(orig[:, None], pred))
    want = np.asarray(_legacy_satd(orig, pred.astype(jnp.int32)))
    np.testing.assert_array_equal(got, want)
    # alternating-sign worst case for the AC terms
    alt = ((np.indices((128, 128)).sum(0) % 2) * 1023).astype(np.int32)
    orig = jnp.asarray(alt[None])
    got = np.asarray(blockstat.satd_blocks(orig[:, None], pred))
    want = np.asarray(_legacy_satd(orig, pred.astype(jnp.int32)))
    np.testing.assert_array_equal(got, want)


def test_block_sums_i64_extremes():
    # full moment-product range: +-(4*1023)^2 = +-16744464 per sample
    m = 16744464
    rng = np.random.default_rng(3)
    cases = [
        rng.integers(-m, m + 1, (2, 5, 128, 128)),
        np.full((1, 1, 128, 128), m),
        np.full((1, 1, 128, 128), -m),
        ((np.indices((128, 128)).sum(0) % 2) * 2 * m - m)[None, None],
    ]
    for x in cases:
        x = x.astype(np.int32)
        got = np.asarray(blockstat.block_sums_i64(jnp.asarray(x)))
        want = x.astype(np.int64).reshape(
            x.shape[:-2] + (NB, 4, NB, 4)).sum(axis=(-3, -1))
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("mode,n_cp", [("full", 2), ("full", 3),
                                       ("half", 2), ("half", 3)])
def test_evaluate_parity_mxu(mode, n_cp):
    """_evaluate (SATD + M/rhs) with mxu_reduce is bit-identical."""
    fw, fh = 416, 240
    rng = np.random.default_rng(11)
    ref = jnp.asarray(rng.integers(0, 1024, (fh * fw,)).astype(np.int32))
    orig = jnp.asarray(rng.integers(0, 1024, (fh * fw,)).astype(np.int32))

    t0 = ap.build_tables(ap.PlaneSpec(mode, n_cp, fw, fh))
    cp = jnp.asarray(rng.integers(-64, 65, (t0.n_ctus, t0.n_cus, 3, 2))
                     .astype(np.int32))

    outs = []
    for mxu in (False, True):
        spec = ap.PlaneSpec(mode, n_cp, fw, fh, use_pallas=False,
                            mxu_reduce=mxu)
        t = ap.build_tables(spec)
        dyn = ap.dyn_tables(t)
        tiles, orig_pl, ref_pl = ap.prep_inputs(spec, t, ref, orig)
        forms = ap._orig_forms(spec, orig_pl)
        satd, M, rhs, _ = ap._evaluate(
            spec, t, dyn, ref, tiles, forms, cp, True)
        # the closed-form zero-CPMV evaluate exercises the broadcast
        # (one-bin) reduction path
        z_satd, z_M, z_rhs = ap._evaluate_zero(
            spec, t, ref_pl, forms, dyn.within, True)
        outs.append(tuple(np.asarray(x)
                          for x in (satd, M, rhs, z_satd, z_M, z_rhs)))
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_array_equal(a, b)
