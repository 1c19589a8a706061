"""Fused per-block reductions of (pred, orig) CTU planes in ONE Mosaic pass.

This is the round-5 structural fix for the dense engine's reduce_pred
bottleneck: the XLA reduction path re-lays the prediction planes out into
sample-major blocks (``affine_plane._blocks16`` — 3 full-plane transposes
per bin per evaluate) before computing SATD, Sobel gradients and the five
normal-equation moments; the device profile attributed 56% of an evaluate
to those relayouts (docs/ab_r04.md section 1).  The reference never pays
this at all: its kernel accumulates SATD and the gradient moments in
registers right after the interpolation filter, in the same pass
(affine.cl:208-393, reduction affine.cl:395-421).

This kernel is the TPU-native equivalent: one grid step per (CTU, bin)
consumes the predicted plane exactly once from VMEM and emits

* per-block-row SATD (VTM 4x4 Hadamard with the JVET_R0164 mean scaling,
  aux_functions.cl:1940-2043): the vertical 4-point butterflies run as
  sublane adds, the horizontal 4-point transform runs plane-level as
  masked lane-rotate butterflies (_hadamard_cols_rolls; an equivalent
  128x128 block-diagonal MXU matmul exists behind ``mxu_satd`` but is OFF:
  a dot inside this kernel made the composite stage program's deferred
  first-execution device build explode from ~16 s to ~123 s per 1080p
  pair executable on this platform, docs/ab_r05.md), and the within-block
  lane sums are two lane rotates — no sample-major relayout anywhere.
  The per-block result lands on lane 4b+3 of its block (other lanes
  zero), so the caller's per-CU reduction is a plain strided lane sum.
* the five moment planes (gx*gx, gx*gy, gy*gy, gx*err, gy*err) as
  per-block-row column sums [5, NB, 128]: Sobel gradients with the
  reference's per-CU border replication (affine.cl:472-540) are computed
  plane-level from lane/sublane rotates and per-bin packed border masks;
  per-block lane sums again fold into the caller's per-CU reduction.

Bit-exactness: every intermediate is an integer of magnitude < 2^24, so
the f32 arithmetic (the VPU has no native 32-bit integer multiply) is
exact: |gx|,|gy| <= 4*1023, products <= 4092^2 < 2^24, per-row sums are
converted to int32 BEFORE the 4-sample accumulation (whose total can pass
2^24); Hadamard coefficients are +-1 and butterfly partials <= 16*1023, so
the MXU matmul (precision=HIGHEST) is exact; the two arithmetic shifts of
the SATD finish become exact floor-scalings.  Garbage conventions match
the XLA path: outputs at inactive slabs / invalid slots are unspecified
and every consumer masks at CU level (see affine_plane.slab_activity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 32

# packed border-mask bits (affine_plane.build_tables)
TOP, BOT, LEFT, RIGHT = 1, 2, 4, 8


@functools.lru_cache(maxsize=1)
def _hadamard_block_diag():
    """[128, 128] f32 block-diagonal horizontal 4-point Hadamard.

    Net linear map of satd_4x4's stages 3+4 over the four lanes of each
    block: f0=e0+e1+e2+e3, f1=e0-e1-e2+e3, f2=e0+e1-e2-e3, f3=e0-e1+e2-e3.
    B[4b+ci, 4b+co] = T[ci][co]; coefficients are +-1 (bf16-exact), so the
    MXU product of integer inputs < 2^24 is exact at any TPU precision
    decomposition >= bf16_3x.
    """
    T = np.array([
        [1, 1, 1, 1],
        [1, -1, 1, -1],
        [1, -1, -1, 1],
        [1, 1, -1, -1],
    ], np.float32)
    # T[ci][co]: f_co = sum_ci e_ci * T[ci][co] -> columns as derived above
    B = np.zeros((128, 128), np.float32)
    for b in range(32):
        B[4 * b:4 * b + 4, 4 * b:4 * b + 4] = T
    return B


def _sobel_replicated_plane(Pf, mask):
    """Plane-level Sobel + per-CU border replication, f32 [128, 128].

    Matches affine_plane._sobel_replicated for every sample that survives
    downstream masking: raw gradients at plane rows/cols 0 and 127 read
    cyclically wrapped neighbours instead of the XLA path's zero padding,
    but those samples are provably replaced by the border replication or
    sit on invalid slots (plane edges are always CU borders when covered),
    so per-CU sums are bit-identical.
    """
    top = (mask & TOP) != 0
    bot = (mask & BOT) != 0
    left = (mask & LEFT) != 0
    right = (mask & RIGHT) != 0

    # lane/sublane rotates: pltpu.roll(x, s, a) -> out[i] = x[(i - s) mod n]
    PL = pltpu.roll(Pf, 1, 1)       # p[c-1]
    PR = pltpu.roll(Pf, 127, 1)     # p[c+1]
    D = PR - PL
    gx = pltpu.roll(D, 1, 0) + 2.0 * D + pltpu.roll(D, 127, 0)
    V = pltpu.roll(Pf, 127, 0) - pltpu.roll(Pf, 1, 0)   # p[r+1] - p[r-1]
    gy = pltpu.roll(V, 1, 1) + 2.0 * V + pltpu.roll(V, 127, 1)

    def repl(g):
        down = pltpu.roll(g, 127, 0)     # g[r+1]
        up = pltpu.roll(g, 1, 0)         # g[r-1]
        g = jnp.where(top, down, jnp.where(bot, up, g))
        rightv = pltpu.roll(g, 127, 1)   # g[c+1]
        leftv = pltpu.roll(g, 1, 1)      # g[c-1]
        return jnp.where(left, rightv, jnp.where(right, leftv, g))

    return repl(gx), repl(gy)


def _hadamard_cols_rolls(V):
    """Horizontal 4-point Hadamard over each 4-lane group, via lane rotates.

    Equivalent to V @ _hadamard_block_diag() (same stage-3+4 butterflies,
    satd_4x4 order) but in pure VPU ops: rev (lane reverse within the
    group) and sw (adjacent-lane swap) are masked selects over static lane
    rotates.  Exists because an MXU dot inside this kernel was measured to
    add ~106 s to the composite stage program's deferred first-execution
    device build on the tunnelled platform (docs/ab_r05.md), while the
    rolls cost <1 ms of extra VPU work per evaluate.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, V.shape, V.ndim - 1) & 3
    rev = jnp.where(
        lane == 0, pltpu.roll(V, 125, 1),
        jnp.where(lane == 1, pltpu.roll(V, 127, 1),
                  jnp.where(lane == 2, pltpu.roll(V, 1, 1),
                            pltpu.roll(V, 3, 1))))
    # rev[c] = e[3-c]: c=0 <- lane+3 (roll -3 = 125), c=1 <- +1 (127),
    # c=2 <- -1 (1), c=3 <- -3 (3)
    m = jnp.where(lane < 2, V + rev, rev - V)
    # m = [e0+e3, e1+e2, e1-e2, e0-e3]
    sw = jnp.where((lane & 1) == 0, pltpu.roll(m, 127, 1),
                   pltpu.roll(m, 1, 1))
    # sw[c] = m[c^1]
    return jnp.where((lane & 1) == 0, m + sw,
                     jnp.where(lane == 1, sw - m, m - sw))
    # f = [m0+m1, m0-m1, m2+m3, m3-m2]


def _make_kernel(refine: bool, mxu_satd: bool = False):
    def kernel(act_ref, pred_ref, orig_ref, mask_ref, *rest):
        if mxu_satd:
            B_ref, rest = rest[0], rest[1:]
        if refine:
            satd_ref, mom_ref, vscr = rest
        else:
            satd_ref, vscr = rest
        Pf = pred_ref[0, 0, :, :].astype(jnp.float32)
        Of = orig_ref[0, :, :].astype(jnp.float32)
        err = Of - Pf                                    # satd sign: orig-pred

        if refine:
            mask = mask_ref[0, :, :]
            gx, gy = _sobel_replicated_plane(Pf, mask)
            # products are < 2^24 in magnitude (f32-exact); convert to i32
            # BEFORE the 4-row sums, whose totals can exceed 2^24
            prods = (gx * gx, gx * gy, gy * gy, gx * err, gy * err)
            prods = tuple(p.astype(jnp.int32) for p in prods)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        c0 = (lane & 3) == 0
        c3 = (lane & 3) == 3

        # pass 1 per slab: vertical SATD butterflies into the scratch plane
        # + the per-block-row moment column sums
        for k in range(16):
            @pl.when(act_ref[0, 0, 0, k] != 0)
            def _(k=k):
                for j in range(2):
                    r = 8 * k + 4 * j
                    e0 = err[r:r + 1, :]
                    e1 = err[r + 1:r + 2, :]
                    e2 = err[r + 2:r + 3, :]
                    e3 = err[r + 3:r + 4, :]
                    m0 = e0 + e3
                    m1 = e1 + e2
                    m2 = e1 - e2
                    m3 = e0 - e3
                    vscr[r + 0:r + 1, :] = m0 + m1
                    vscr[r + 1:r + 2, :] = m2 + m3
                    vscr[r + 2:r + 3, :] = m0 - m1
                    vscr[r + 3:r + 4, :] = m3 - m2
                    if refine:
                        # row sums only — the within-block 4-lane fold
                        # stays OUTSIDE in XLA (4 strided slices + adds):
                        # folding here with two lane rotates per moment
                        # row was measured SLOWER (kernel 23.9 -> 40.8 ms
                        # at 4K: ~50 extra small ops x 8160 grid steps of
                        # per-op overhead vs 6.3 ms for XLA's fold of the
                        # same data; 1080p neutral) — tools/reduce_probe
                        # A/B, docs/ab_r05.md
                        for m in range(5):
                            q = prods[m]
                            s = (q[r:r + 1, :] + q[r + 1:r + 2, :]
                                 + q[r + 2:r + 3, :] + q[r + 3:r + 4, :])
                            mom_ref[0, 0, m, 2 * k + j:2 * k + j + 1, :] = s

        # horizontal 4-point transform of ALL block rows at once
        if mxu_satd:
            F = lax.dot_general(
                vscr[:, :], B_ref[:, :],
                (((1,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
        else:
            F = _hadamard_cols_rolls(vscr[:, :])
        A = jnp.abs(F)

        # pass 2 per slab: JVET_R0164 mean scaling + within-block lane sums
        for k in range(16):
            @pl.when(act_ref[0, 0, 0, k] != 0)
            def _(k=k):
                for j in range(2):
                    r = 8 * k + 4 * j
                    a0 = A[r:r + 1, :]
                    t = (a0 + A[r + 1:r + 2, :] + A[r + 2:r + 3, :]
                         + A[r + 3:r + 4, :])
                    # satd = sum|e| - |e0| + (|e0| >> 2); e0 sits on lane
                    # 4b+0 of row r
                    t = t + jnp.where(c0, jnp.floor(a0 * 0.25) - a0, 0.0)
                    r1 = t + pltpu.roll(t, 1, 1)
                    r2 = r1 + pltpu.roll(r1, 2, 1)       # lane 4b+3: block sum
                    s = jnp.where(c3, jnp.floor((r2 + 1.0) * 0.5), 0.0)
                    satd_ref[0, 0, 2 * k + j:2 * k + j + 1, :] = s.astype(
                        jnp.int32)

    return kernel


@functools.lru_cache(maxsize=None)
def _reduce_fn(n_ctu: int, n_bins: int, pred_bins: int, refine: bool,
               interpret: bool, mxu_satd: bool = False):
    kernel = _make_kernel(refine, mxu_satd)
    pred_im = ((lambda i, c: (i, c, 0, 0)) if pred_bins > 1
               else (lambda i, c: (i, 0, 0, 0)))
    in_specs = [
        pl.BlockSpec((1, 1, 1, 16), lambda i, c: (i, c, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 128, 128), pred_im, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 128, 128), lambda i, c: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 128, 128), lambda i, c: (c, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if mxu_satd:
        in_specs.append(pl.BlockSpec((128, 128), lambda i, c: (0, 0),
                                     memory_space=pltpu.VMEM))
    out_shapes = [jax.ShapeDtypeStruct((n_ctu, n_bins, NB, 128), jnp.int32)]
    out_specs = [pl.BlockSpec((1, 1, NB, 128), lambda i, c: (i, c, 0, 0),
                              memory_space=pltpu.VMEM)]
    if refine:
        out_shapes.append(
            jax.ShapeDtypeStruct((n_ctu, n_bins, 5, NB, 128), jnp.int32))
        out_specs.append(
            pl.BlockSpec((1, 1, 5, NB, 128), lambda i, c: (i, c, 0, 0, 0),
                         memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=(n_ctu, n_bins),
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((128, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def reduce_pallas(pred, orig16, border_packed, slab_active, refine: bool,
                  interpret: bool = False, mxu_satd: bool = False):
    """Fused SATD (+ moment) reduction of per-bin prediction planes.

    pred: int16 [nCtu, nBins | 1, 128, 128] (a length-1 bin axis broadcasts,
    e.g. the zero-MV closed form); orig16: int16 [nCtu, 128, 128];
    border_packed: int32 [nBins, 128, 128] per-bin CU border masks
    (TOP|BOT|LEFT|RIGHT bits); slab_active: int32 [nCtu, nBins, 16] — slabs
    with 0 are skipped and their output rows are unspecified.

    Returns satd int32 [nCtu, nBins, NB, 128] (per-block SATD on lane 4b+3
    of each block, zeros on the other lanes) and, when ``refine``, moments
    int32 [nCtu, nBins, 5, NB, 128] (per-block-row column sums of gx*gx,
    gx*gy, gy*gy, gx*err, gy*err).
    """
    n_ctu, pred_bins = pred.shape[:2]
    n_bins = slab_active.shape[1]
    assert pred.dtype == jnp.int16 and orig16.dtype == jnp.int16
    fn = _reduce_fn(n_ctu, n_bins, pred_bins, refine, interpret, mxu_satd)
    with jax.enable_x64(False):
        act = slab_active.reshape(n_ctu, n_bins, 1, 16).astype(jnp.int32)
        args = (act, pred, orig16, border_packed.astype(jnp.int32))
        if mxu_satd:
            args += (jnp.asarray(_hadamard_block_diag()),)
        out = fn(*args)
    if refine:
        return out[0], out[1]
    return out[0], None
