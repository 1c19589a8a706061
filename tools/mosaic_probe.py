"""Probe which dynamic-indexing mechanisms Mosaic accepts on this TPU.

The rebased warp kernel needs a per-slab dynamic (row, lane) window into the
reference tile.  A plain dynamic sublane ref-load failed to lower ("cannot
statically prove that index in dimension 1 is a multiple of 8"), so this
probes the alternatives on hardware, each in its own tiny kernel:

  a) dynamic row ref-load at an 8*k index wrapped in pl.multiple_of
  b) static taller ref-load + pltpu.roll with a DYNAMIC shift on axis 0
  c) static ref-load + pltpu.roll with a DYNAMIC shift on axis 1 (lanes)
  d) lax.dynamic_slice_in_dim on a loaded value (rows, then lanes)

Prints PASS/FAIL per mechanism with the error head on failure.

    python tools/mosaic_probe.py
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = 176, 256
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 1024, (H, W)).astype(np.int16))
    off8 = jnp.asarray([[2]], jnp.int32)    # row offset in units of 8
    offr = jnp.asarray([[13]], jnp.int32)   # raw row offset
    offl = jnp.asarray([[37]], jnp.int32)   # lane offset

    def run(name, kernel, *args):
        try:
            fn = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * (
                    len(args) - 1)
                + [pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            with jax.enable_x64(False):
                out = np.asarray(fn(*args))
            print(f"{name}: PASS  sum={out.sum()}", flush=True)
            return out
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:160]
            print(f"{name}: FAIL  {msg}", flush=True)
            return None

    def k_a(o8_ref, x_ref, o_ref):
        sb = pl.multiple_of(8 * o8_ref[0, 0], 8)
        o_ref[:, :] = x_ref[pl.ds(sb, 8), 0:128].astype(jnp.int32)

    def k_b(orow_ref, x_ref, o_ref):
        # pltpu.roll(x, s, axis): out[i] = x[(i + s) mod n] (shift-left by s).
        wide = x_ref[0:48, 0:128].astype(jnp.int32)
        rolled = pltpu.roll(wide, orow_ref[0, 0], 0)
        o_ref[:, :] = rolled[0:8, :]

    def k_c(olane_ref, x_ref, o_ref):
        wide = x_ref[0:8, :].astype(jnp.int32)
        rolled = pltpu.roll(wide, olane_ref[0, 0], 1)
        o_ref[:, :] = rolled[:, 0:128]

    def k_e(olane_ref, x_ref, o_ref):
        # dynamic LANE start on a direct ref load (rows static)
        o_ref[:, :] = x_ref[0:8, pl.ds(olane_ref[0, 0], 128)].astype(jnp.int32)

    def k_d_rows(orow_ref, x_ref, o_ref):
        wide = x_ref[0:48, 0:128].astype(jnp.int32)
        o_ref[:, :] = jax.lax.dynamic_slice_in_dim(wide, orow_ref[0, 0], 8, 0)

    def k_d_lanes(olane_ref, x_ref, o_ref):
        wide = x_ref[0:8, :].astype(jnp.int32)
        o_ref[:, :] = jax.lax.dynamic_slice_in_dim(
            wide, olane_ref[0, 0], 128, 1)

    xa = np.asarray(x).astype(np.int32)

    def whererow(out, block):
        # for out row 0, find which row of `block` it equals (or None)
        hits = [r for r in range(block.shape[0])
                if np.array_equal(out[0], block[r])]
        return hits

    def wherelane(out, block):
        # for out col 0 (8 rows), find which col of `block` it equals
        hits = [c for c in range(block.shape[1])
                if np.array_equal(out[:, 0], block[:, c])]
        return hits

    a = run("a_refload_mult8", k_a, off8, x)
    if a is not None:
        print("  a ok:", np.array_equal(a, xa[16:24, :128]))
    b = run("b_roll_rows_dyn", k_b, offr, x)
    if b is not None:
        print("  b expect row13; out row0 == src row",
              whererow(b, xa[:48, :128]))
    c = run("c_roll_lanes_dyn", k_c, offl, x)
    if c is not None:
        print("  c expect lane37; out col0 == src col",
              wherelane(c, xa[:8, :]))
    d1 = run("d_dynslice_rows", k_d_rows, offr, x)
    if d1 is not None:
        print("  d1 ok:", np.array_equal(d1, xa[13:21, :128]),
              whererow(d1, xa[:48, :128]))
    d2 = run("d_dynslice_lanes", k_d_lanes, offl, x)
    if d2 is not None:
        print("  d2 ok:", np.array_equal(d2, xa[:8, 37:165]),
              wherelane(d2, xa[:8, :]))
    e = run("e_refload_dynlane", k_e, offl, x)
    if e is not None:
        print("  e ok:", np.array_equal(e, xa[:8, 37:165]),
              wherelane(e, xa[:8, :]))
    print("probe done")


if __name__ == "__main__":
    main()
