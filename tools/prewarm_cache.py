"""One-shot compile-cache pre-warm for the cold test suite.

Compiles, in THIS process, the stage programs that dominate the suite's
cold wall time — the small-frame engine-parity shapes and the sharded
child-process shapes of test_sharding / test_multihost — so a cold tree
pays them once up front instead of inside fresh-process children.  With
the round-5 cache-key fix (jax_traceback_in_locations_limit=0,
vvc_affine_tpu/__init__.py) entries populated here are HIT by every later
process regardless of which script compiles vs runs them; before that fix
a pre-warm pass was impossible (every caller hashed its own copy).

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/prewarm_cache.py

Run it once per fresh checkout/cache; the suite itself needs nothing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "--xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from vvc_affine_tpu.models import affine_plane
    from vvc_affine_tpu.parallel import mesh as pmesh

    t_start = time.time()
    done = []

    def run(tag, fn, *args):
        t0 = time.time()
        out = fn(*args)
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf)
        done.append(tag)
        print(f"prewarm {tag}: {time.time() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)

    # the suite's heavy shapes: (mode, ncp, W, H, sharded?)
    shapes = [
        ("full", 2, 384, 256, False), ("full", 3, 384, 256, False),
        ("half", 2, 384, 256, False), ("half", 3, 384, 256, False),
        ("full", 2, 384, 320, True), ("full", 3, 384, 320, True),
        ("half", 2, 384, 320, True), ("half", 3, 384, 320, True),
        ("full", 2, 512, 512, True), ("full", 3, 512, 512, True),
        ("half", 2, 512, 512, True), ("half", 3, 512, 512, True),
    ]
    for mode, n_cp, fw, fh, sharded in shapes:
        spec = affine_plane.PlaneSpec(mode, n_cp, fw, fh)
        ref = jnp.asarray(
            rng.integers(0, 1024, (fh * fw,)).astype(np.int32))
        orig = jnp.asarray(
            rng.integers(0, 1024, (fh * fw,)).astype(np.int32))
        lam = jnp.float32(78.949063)
        prev = affine_plane.zero_cpmvs(spec)
        if sharded:
            mesh = pmesh.make_mesh()
            fn = pmesh.build_plane_stage_sharded(spec, mesh)
        else:
            fn = affine_plane.build_stage(spec)
        run(f"{mode}_{n_cp}cp_{fw}x{fh}{'_sharded' if sharded else ''}",
            fn, ref, orig, lam, prev)

    print(f"prewarmed {len(done)} programs in {time.time() - t_start:.1f}s")


if __name__ == "__main__":
    main()
