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
    lam = jnp.float32(78.949063)
    mesh = pmesh.make_mesh(jax.devices()[:8])

    def frames(fw, fh):
        return (jnp.asarray(rng.integers(0, 1024, (fh * fw,)).astype(
            np.int32)),
            jnp.asarray(rng.integers(0, 1024, (fh * fw,)).astype(np.int32)))

    # mirror tests/_child.py exactly: 'full' exercises the fused-pair
    # sharded builder, 'half' the per-stage one; both also build the
    # single-device stages they are compared against
    for fw, fh in ((384, 320), (512, 512)):
        ref, orig = frames(fw, fh)
        for mode in ("full", "half"):
            s2 = affine_plane.PlaneSpec(mode, 2, fw, fh)
            s3 = affine_plane.PlaneSpec(mode, 3, fw, fh)
            z = affine_plane.zero_cpmvs(s2)
            if mode == "full":
                run(f"full_pair_{fw}x{fh}_sharded",
                    pmesh.build_plane_pair_sharded(s2, s3, mesh),
                    ref, orig, lam, z)
            else:
                out2 = None

                def chain(ref, orig, lam, z, s2=s2, s3=s3):
                    c2, p2 = pmesh.build_plane_stage_sharded(s2, mesh)(
                        ref, orig, lam, z)
                    return pmesh.build_plane_stage_sharded(s3, mesh)(
                        ref, orig, lam, p2)

                run(f"half_stages_{fw}x{fh}_sharded", chain,
                    ref, orig, lam, z)

            def singles(ref, orig, lam, z, s2=s2, s3=s3):
                c2, p2 = affine_plane.build_stage(s2)(ref, orig, lam, z)
                return affine_plane.build_stage(s3)(ref, orig, lam, p2)

            run(f"{mode}_singles_{fw}x{fh}", singles, ref, orig, lam, z)

    # the engine-parity suite's small-frame stages
    for fw, fh in ((384, 256),):
        ref, orig = frames(fw, fh)
        for mode in ("full", "half"):
            s2 = affine_plane.PlaneSpec(mode, 2, fw, fh)
            s3 = affine_plane.PlaneSpec(mode, 3, fw, fh)
            z = affine_plane.zero_cpmvs(s2)

            def singles(ref, orig, lam, z, s2=s2, s3=s3):
                c2, p2 = affine_plane.build_stage(s2)(ref, orig, lam, z)
                return affine_plane.build_stage(s3)(ref, orig, lam, p2)

            run(f"{mode}_singles_{fw}x{fh}", singles, ref, orig, lam, z)

    print(f"prewarmed {len(done)} program groups in "
          f"{time.time() - t_start:.1f}s")


if __name__ == "__main__":
    main()
