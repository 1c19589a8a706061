import os

# XLA:CPU's compiler recurses deeply on the big stage graphs and SEGFAULTS
# with the default 8 MB stack.  setrlimit at runtime is NOT enough: the
# kernel places mmap_base from the stack rlimit AT EXEC TIME, so a
# late-raised limit still collides with existing mappings after ~8 MB of
# growth.  Re-exec the test process once with the raised limit so the
# address-space layout leaves room.  The exec happens in pytest_configure
# (below) so pytest's fd capture can be unwound first — exec'ing while
# fds 1/2 point into capture temp files would swallow all output.
import resource
import sys

_WANT_STACK = 1 << 29  # 512 MB


def pytest_configure(config):
    soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
    if (os.environ.get("_VVC_STACK_REEXEC") == "1"
            or soft == resource.RLIM_INFINITY or soft >= _WANT_STACK):
        return
    new = (_WANT_STACK if hard == resource.RLIM_INFINITY
           else min(_WANT_STACK, hard))
    try:
        resource.setrlimit(resource.RLIMIT_STACK, (new, hard))
    except (ValueError, OSError):
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    os.environ["_VVC_STACK_REEXEC"] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)

# Force a virtual 8-device CPU mesh for all tests: multi-chip sharding is
# validated without TPU hardware, and float64/int64 run natively.  The env
# var alone is not enough here — the axon harness pre-imports JAX with
# JAX_PLATFORMS=axon — so also flip the live config.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
