"""Frame ingest: CSV luma planes in the reference's interchange format.

Format (README.md:20, parse loop main.cpp:310-330): one CSV row per pixel
row, comma-separated unsigned-short luma samples, frames concatenated
vertically.  The original-frames file holds the frames to encode (POC 1..N);
the reference-frames file holds the reconstructed frames (POC 0..N-1).
"""

from __future__ import annotations

import numpy as np


def read_frames_csv(path: str, frame_w: int, frame_h: int, n_frames: int) -> np.ndarray:
    """Parse a concatenated-frames CSV -> uint16 [n_frames, frame_h, frame_w].

    Uses the native mmap parser (native/vvc_native.cpp — the analogue of the
    reference's C++ parse loop, main.cpp:310-330) when the toolchain is
    available, else pandas/NumPy.
    """
    rows_needed = frame_h * n_frames
    from vvc_affine_tpu import native

    lib = native.get_lib()
    if lib is not None:
        import ctypes

        out = np.empty((rows_needed, frame_w), np.uint16)
        rc = lib.vvc_parse_luma_csv(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            rows_needed, frame_w)
        if rc == 0:
            return out.reshape(n_frames, frame_h, frame_w)
        if rc <= -2:
            raise ValueError(
                f"{path}: malformed/oversized field or short file at row "
                f"{-(rc + 2)} (need {rows_needed} rows)")
        # rc == -1: IO error -> fall through to the Python parser
    try:
        import pandas as pd

        df = pd.read_csv(
            path, header=None, nrows=rows_needed, dtype=np.int64,
            usecols=range(frame_w), engine="c",
        )
        vals = df.to_numpy()
        # same loud out-of-range rejection as the native parser (no silent
        # uint16 truncation)
        if vals.size and (vals.min() < 0 or vals.max() > 65535):
            raise ValueError(f"{path}: sample value out of [0, 65535]")
        out = vals.astype(np.uint16)
    except ImportError:
        out = np.empty((rows_needed, frame_w), np.uint16)
        with open(path, "r") as f:
            for r in range(rows_needed):
                line = f.readline()
                if not line:
                    raise ValueError(
                        f"{path}: ran out of rows at {r} (need {rows_needed})"
                    )
                vals = np.array(line.rstrip("\n").rstrip(",").split(","), np.int64)
                out[r] = vals[:frame_w].astype(np.uint16)
    if out.shape[0] < rows_needed:
        raise ValueError(
            f"{path}: {out.shape[0]} rows, need {rows_needed} "
            f"({n_frames} frames x {frame_h})"
        )
    return out.reshape(n_frames, frame_h, frame_w)


def write_frames_csv(path: str, frames: np.ndarray) -> None:
    """Inverse of read_frames_csv (used to build test fixtures)."""
    n, h, w = frames.shape
    with open(path, "w") as f:
        for fr in range(n):
            for r in range(h):
                f.write(",".join(str(int(v)) for v in frames[fr, r]))
                f.write("\n")
