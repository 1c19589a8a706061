"""Decision-log CSV writer and timing report.

Behavioural spec: reportAffineResultsMaster_new
(main_aux_functions.h:387-525) — one CSV per (pred type, CU size string),
header ``POC,List,Ref,CTU,idx,X,Y,Cost,LT_X,LT_Y,RT_X,RT_Y,LB_X,LB_Y``, rows
appended per (poc, refIdx) in class order; half-aligned size groups sharing a
size string share a file.  removeOldTraces (main_aux_functions.h:1547-1585)
deletes stale logs before a run.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np

from vvc_affine_tpu import geometry as G

PRED_NAMES = ("FULL_2CPs", "FULL_3CPs", "HALF_2CPs", "HALF_3CPs")
PRED_MODES = ("full", "full", "half", "half")

_HEADER = "POC,List,Ref,CTU,idx,X,Y,Cost,LT_X,LT_Y,RT_X,RT_Y,LB_X,LB_Y\n"


def log_paths(prefix: str, pred: int):
    """All decision-log paths of one pred type (dedup preserves order)."""
    lay = G.layout(PRED_MODES[pred])
    seen = []
    for c in lay.classes:
        p = f"{prefix}_{PRED_NAMES[pred]}_{c.size_str}.csv"
        if p not in seen:
            seen.append(p)
    return seen


def remove_old_traces(prefix: str) -> None:
    for pred in range(4):
        for p in log_paths(prefix, pred):
            try:
                os.remove(p)
            except FileNotFoundError:
                pass


def write_headers(prefix: str, pred: int) -> None:
    for p in log_paths(prefix, pred):
        with open(p, "w") as f:
            f.write(_HEADER)


def report_results(
    prefix: Optional[str],
    pred: int,
    frame_w: int,
    costs: np.ndarray,      # int64 [nCtu, nCU] canonical order
    cpmvs: np.ndarray,      # int32 [nCtu, nCU, 3, 2]
    poc: int,
    ref: int,
    to_terminal: bool = False,
) -> None:
    """Append one (poc, refIdx, pred) result block to the decision logs."""
    if prefix is None and not to_terminal:
        return
    lay = G.layout(PRED_MODES[pred])
    n_ctus = costs.shape[0]
    ctu_cols = -(-frame_w // 128)

    if prefix is not None and poc == 1 and ref == 0:
        write_headers(prefix, pred)

    use_native = False
    if prefix is not None and not to_terminal:
        from vvc_affine_tpu import native

        use_native = native.get_lib() is not None

    handles: Dict[str, object] = {}
    try:
        for ci, cls in enumerate(lay.classes):
            stride = lay.return_strides[ci]
            path = f"{prefix}_{PRED_NAMES[pred]}_{cls.size_str}.csv" if prefix else None
            fh = None
            if path is not None and not use_native:
                if path not in handles:
                    handles[path] = open(path, "a")
                fh = handles[path]
            # vectorised row block: meta (POC,List,Ref,CTU,idx,X,Y), cost,
            # six CPMV components per row, CTU-major, CU raster within
            nc = cls.num_cus
            ctu_ids = np.arange(n_ctus, dtype=np.int32)
            off_x = (ctu_ids % ctu_cols) * 128
            off_y = (ctu_ids // ctu_cols) * 128
            meta = np.empty((n_ctus, nc, 7), np.int32)
            meta[..., 0] = poc
            meta[..., 1] = 0
            meta[..., 2] = ref
            meta[..., 3] = ctu_ids[:, None]
            meta[..., 4] = np.arange(nc, dtype=np.int32)[None, :]
            meta[..., 5] = off_x[:, None] + np.asarray(cls.xs, np.int32)[None, :]
            meta[..., 6] = off_y[:, None] + np.asarray(cls.ys, np.int32)[None, :]
            cost_blk = np.ascontiguousarray(
                costs[:, stride:stride + nc], np.int64)
            cpmv_blk = np.ascontiguousarray(
                cpmvs[:, stride:stride + nc].reshape(n_ctus, nc, 6), np.int32)

            if use_native:
                import ctypes

                from vvc_affine_tpu import native

                lib = native.get_lib()
                meta_c = np.ascontiguousarray(meta.reshape(-1, 7))
                rc = lib.vvc_append_decision_rows(
                    path.encode(), 0, meta_c.shape[0],
                    meta_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    cost_blk.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                    cpmv_blk.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
                if rc == 0:
                    continue
                # native IO failure: fall back to Python for this block
                if path not in handles:
                    handles[path] = open(path, "a")
                fh = handles[path]
            lines = []
            for ctu in range(n_ctus):
                for cu in range(nc):
                    m = meta[ctu, cu]
                    v = cpmv_blk[ctu, cu]
                    lines.append(
                        f"{m[0]},{m[1]},{m[2]},{m[3]},{m[4]},{m[5]},{m[6]},"
                        f"{cost_blk[ctu, cu]},"
                        f"{v[0]},{v[1]},{v[2]},{v[3]},{v[4]},{v[5]}\n"
                    )
            block = "".join(lines)
            if fh is not None:
                fh.write(block)
            if to_terminal:
                print(block, end="")
    finally:
        for fh in handles.values():
            fh.close()


class DeviceTraceSampler:
    """In-process ~1 ms device-memory activity sampler.

    Same trace CSV format as tools/power_trace.py, but sampling happens on
    a thread inside the engine process — required on platforms where a
    second device client is unsafe (the tunnelled TPU used here crashes the
    worker on concurrent clients).  Join with tools/energy_report.py.
    """

    def __init__(self, out_path: str, period_ms: float = 1.0) -> None:
        import threading

        self.out_path = out_path
        self.period_s = period_ms / 1e3
        self.rows: list = []
        self._stop = threading.Event()
        self._th = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        import jax

        dev = jax.devices()[0]
        while not self._stop.is_set():
            t = time.time()
            try:
                stats = dev.memory_stats() or {}
            except Exception:
                stats = {}
            self.rows.append((t, stats.get("bytes_in_use", 0),
                              stats.get("peak_bytes_in_use", 0)))
            time.sleep(self.period_s)

    def start(self) -> None:
        self._th.start()

    def stop(self) -> None:
        import csv

        self._stop.set()
        self._th.join(timeout=2)
        with open(self.out_path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["t_epoch", "bytes_in_use", "peak_bytes_in_use"])
            w.writerows(self.rows)
        print(f"device trace: {len(self.rows)} samples -> {self.out_path}")


class Timing:
    """Per-pred execution-time accumulator (ns) + wall-clock stamps.

    Mirrors kernelExecutionTime[4] / reportTimingResults
    (main_aux_functions.h:1416-1446) and print_timestamp (:59-68).
    """

    def __init__(self) -> None:
        self.exec_ns = [0.0, 0.0, 0.0, 0.0]
        self.pair_ns = {0: 0.0, 2: 0.0}   # fused 2CP+3CP dispatches
        self.escapes = 0
        self.max_groups = 0
        self.fallbacks = 0
        self.rung_hist = [0] * 8          # adaptive-dispatch rung choices
        self.t0 = time.time()

    def stamp(self, msg: str) -> None:
        t = time.time()
        print(f"{msg},{int(t)}.{int((t % 1) * 1e6):06d},")

    def add(self, pred: int, seconds: float) -> None:
        self.exec_ns[pred] += seconds * 1e9

    def add_pair(self, base_pred: int, seconds: float) -> None:
        """Fused-pair exec time (pipeline fused mode): one executable runs
        both nCP stages, so the split per pred type does not exist; the
        pair total is reported on its own line."""
        self.pair_ns[base_pred] += seconds * 1e9

    def add_escapes(self, n_escapes: int, max_groups: int,
                    n_fallbacks: int, rung_hist=None) -> None:
        """Escape-budget telemetry from the dense engine (per stage run).

        ``rung_hist`` (optional, iterable of ints) accumulates the
        adaptive-dispatch rung-choice histogram — the counter that exposed
        the escape-table pathology on realistic content (docs/ab_r04.md
        section 3), so production runs can see their dispatch distribution,
        not just the bench JSON.
        """
        self.escapes += n_escapes
        self.max_groups = max(self.max_groups, max_groups)
        self.fallbacks += n_fallbacks
        if rung_hist is not None:
            for i, v in enumerate(rung_hist):
                self.rung_hist[i] += int(v)

    def report(self, n_frames: int) -> None:
        print("=-" * 23)
        print("TIMING RESULTS (nanoseconds)")
        names = ("FULL_2CP", "FULL_3CP", "HALF_2CP", "HALF_3CP")
        for pred, name in enumerate(names):
            if self.pair_ns.get(pred & ~1):
                if pred % 2 == 0:
                    print(f"{name}+{names[pred + 1]}_EXEC,"
                          f"{self.pair_ns[pred]:f}")
                continue
            print(f"{name}_EXEC,{self.exec_ns[pred]:f}")
        total = sum(self.exec_ns) + sum(self.pair_ns.values())
        print(f"TOTAL_EXEC_TIME({n_frames}x),{total:f}")
        print(f"OVERALL({n_frames}x),{(time.time() - self.t0) * 1e9:f}")
        print(f"ESCAPE_BLOCKS,{self.escapes}")
        print(f"ESCAPE_MAX_GROUPS,{self.max_groups}")
        print(f"WHOLE_FRAME_FALLBACKS,{self.fallbacks}")
        print("RUNG_HIST," + ",".join(str(v) for v in self.rung_hist[:4]))
        print("=-" * 23)


def memory_report(frame_w: int, frame_h: int) -> str:
    """Per-stage device-buffer footprint table.

    Analogue of accessMemoryUsage/reportMemoryUsage
    (main_aux_functions.h:148-234, 1448-1471), which queries
    clGetMemObjectInfo for every kernel argument.  Here the buffers are the
    dense-engine arrays, whose sizes are static functions of the frame
    geometry; actual live allocation is also queried from the device when
    available.
    """
    import jax

    from vvc_affine_tpu import geometry as G2
    from vvc_affine_tpu import planes as P2
    from vvc_affine_tpu.ops import warp as W2

    grid = G2.frame_grid(frame_w, frame_h)
    n = grid.num_ctus
    hp, wp = W2.refpad_shape(grid.ctu_rows, grid.ctu_cols)
    lines = [f"MEMORY USAGE (bytes), frame {frame_w}x{frame_h}, {n} CTUs"]
    lines.append(f"ref/orig plane (int32): {frame_w * frame_h * 4}")
    lines.append(f"refpad plane (int16): {hp * wp * 2}")
    lines.append(
        f"per-CTU ref tiles (int16): {n * W2.TILE_H * W2.TILE_W * 2}"
        f" ({W2.TILE_H}x{W2.TILE_W} VMEM-resident per grid step)")
    for mode in ("full", "half"):
        lay = G2.layout(mode)
        bins, _ = P2.bin_layout(mode)
        nb = len(bins)
        lines.append(
            f"[{mode}] displacement/phase planes dy,dx,fx,fy (int32): "
            f"{4 * n * nb * 32 * 32 * 4}")
        lines.append(
            f"[{mode}] tap planes hc,vc lane-expanded (int32): "
            f"{2 * n * nb * 8 * 32 * 128 * 4}")
        lines.append(
            f"[{mode}] pred planes (int16): {n * nb * 128 * 128 * 2}")
        lines.append(
            f"[{mode}] per-CU cost/cpmvs out (int64+int32): "
            f"{n * lay.cus_per_ctu * (8 + 24)}")
        lines.append(
            f"[{mode}] equation systems M,rhs 2CP (int64): "
            f"{n * lay.cus_per_ctu * (16 + 4) * 8}")
        lines.append(
            f"[{mode}] equation systems M,rhs 3CP (int64): "
            f"{n * lay.cus_per_ctu * (36 + 6) * 8}")
    try:
        stats = jax.devices()[0].memory_stats() or {}
        lines.append(f"device bytes_in_use: {stats.get('bytes_in_use', 'n/a')}")
        lines.append(
            f"device peak_bytes_in_use: {stats.get('peak_bytes_in_use', 'n/a')}")
    except Exception:
        pass
    return "\n".join(lines)
