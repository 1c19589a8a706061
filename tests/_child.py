"""Quarantine heavy stage compiles to fresh child interpreters.

XLA:CPU's compiler segfaults deterministically on big in-parent stage
compiles late in a long pytest session (deep recursion + address-space
layout; see conftest.py).  Tests that eagerly trace/compile whole-engine
graphs are re-run in a fresh child pytest via @run_in_child — the same
pattern test_sharding/test_plane_engine use with inline child scripts,
packaged as a decorator so the test body stays readable.
"""

import functools
import os
import subprocess
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _raise_stack():
    import resource

    soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
    want = 1 << 29
    new = want if hard == resource.RLIM_INFINITY else min(want, hard)
    resource.setrlimit(resource.RLIMIT_STACK, (new, hard))


def run_in_child(fn):
    """Run this (non-parametrized) test in a fresh child pytest process."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if os.environ.get("_VVC_TEST_CHILD") == "1":
            return fn(*args, **kwargs)
        mod = sys.modules[fn.__module__]
        node = f"{os.path.abspath(mod.__file__)}::{fn.__name__}"
        env = dict(os.environ)
        env["_VVC_TEST_CHILD"] = "1"
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-x", "-q", "--no-header", node],
            env=env, cwd=_REPO_ROOT, capture_output=True, text=True,
            timeout=3600, preexec_fn=_raise_stack)
        assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])

    return wrapper
