"""Native runtime library (CSV ingest + decision-log writer) parity."""

import os

import numpy as np
import pytest

from vvc_affine_tpu import native
from vvc_affine_tpu.runtime import frames, reporting


@pytest.fixture
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no native toolchain")
    return lib


def test_native_csv_parse_matches_python(tmp_path, lib):
    rng = np.random.default_rng(1)
    data = rng.integers(0, 1024, size=(3, 48, 64)).astype(np.uint16)
    p = str(tmp_path / "f.csv")
    frames.write_frames_csv(p, data)
    got = frames.read_frames_csv(p, 64, 48, 3)
    assert np.array_equal(got, data)
    # truncated file errors cleanly
    with open(p) as f:
        lines = f.readlines()
    with open(p, "w") as f:
        f.writelines(lines[:100])
    with pytest.raises(ValueError):
        frames.read_frames_csv(p, 64, 48, 3)


def test_csv_rejects_out_of_range(tmp_path, lib):
    """Oversized fields fail loudly — including ones that would wrap uint32
    (2^32 -> 0) in the native digit accumulator, and via the pandas path."""
    for bad in ("70000", "4294967296"):  # > 65535; wraps to 0 at 2^32
        p = str(tmp_path / f"bad_{bad}.csv")
        with open(p, "w") as f:
            f.write("1,2,3,4\n")
            f.write(f"5,{bad},7,8\n")
        with pytest.raises(ValueError):
            frames.read_frames_csv(p, 4, 2, 1)


def test_python_fallback_rejects_out_of_range(tmp_path, monkeypatch):
    monkeypatch.setattr(native, "get_lib", lambda: None)
    p = str(tmp_path / "bad.csv")
    with open(p, "w") as f:
        f.write("1,2,3,4\n5,70000,7,8\n")
    with pytest.raises(ValueError):
        frames.read_frames_csv(p, 4, 2, 1)


def test_native_decision_rows_format(tmp_path, lib):
    import ctypes

    p = str(tmp_path / "log.csv")
    meta = np.array([[1, 0, 2, 3, 4, 128, 256]], np.int32)
    cost = np.array([-77], np.int64)
    cpmv = np.array([[1, -2, 3, -4, 5, -6]], np.int32)
    rc = lib.vvc_append_decision_rows(
        p.encode(), 1, 1,
        meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cpmv.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    assert rc == 0
    lines = open(p).read().splitlines()
    assert lines[0] == "POC,List,Ref,CTU,idx,X,Y,Cost,LT_X,LT_Y,RT_X,RT_Y,LB_X,LB_Y"
    assert lines[1] == "1,0,2,3,4,128,256,-77,1,-2,3,-4,5,-6"
