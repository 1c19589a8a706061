"""ctypes loader for the native runtime library (vvc_native.cpp).

Compiles the shared library on first use (g++ -O3) and caches it next to the
source; callers fall back to pure-Python paths when no toolchain is present.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "vvc_native.cpp")
_SO = os.path.join(_HERE, "libvvcnative.so")
_HASH = _SO + ".srchash"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _src_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build(src_hash: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO + ".tmp", _SRC],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(_SO + ".tmp", _SO)
        with open(_HASH, "w") as f:
            f.write(src_hash)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The native library, building it if needed; None if unavailable.

    The binary is never shipped in version control; the build cache is keyed
    on a sha256 of the source, so a stale or foreign .so is always rebuilt.
    """
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src_hash = _src_hash()
        fresh = False
        if os.path.exists(_SO) and os.path.exists(_HASH):
            try:
                with open(_HASH) as f:
                    fresh = f.read().strip() == src_hash
            except OSError:
                fresh = False
        if not fresh and not _build(src_hash):
            import sys

            print(
                "vvc_affine_tpu.native: no verified libvvcnative.so and the "
                "rebuild failed (g++ missing?) — using the slower Python CSV "
                "parser", file=sys.stderr)
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.vvc_parse_luma_csv.restype = ctypes.c_int64
        lib.vvc_parse_luma_csv.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int64, ctypes.c_int64,
        ]
        lib.vvc_append_decision_rows.restype = ctypes.c_int64
        lib.vvc_append_decision_rows.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib
