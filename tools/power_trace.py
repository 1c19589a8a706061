"""Run a workload while sampling device utilization/memory at ~1 ms.

TPU-native analogue of the reference's power harness
(powerTracer_Affine_NVIDIA.py:8-56 + computeEnergy_Affine_NVIDIA_v2.py):
the reference forks `nvidia-smi --query-gpu=power.draw -lms 1` alongside the
binary and joins the trace with stdout timestamps; TPUs expose no equivalent
host-side power counter, so this samples device memory stats (allocation
activity is the available utilization proxy) and joins the trace with the
same `print_timestamp` markers the engine emits.

Usage:
    python tools/power_trace.py --out trace.csv -- \
        python -m vvc_affine_tpu.cli -f 2 -s 1920x1080 -q 32 -o O.csv -r R.csv
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import csv
import re
import subprocess
import sys
import threading
import time


def sample_device(stop, rows, period_s):
    import jax

    dev = jax.devices()[0]
    while not stop.is_set():
        t = time.time()
        try:
            stats = dev.memory_stats() or {}
        except Exception:
            stats = {}
        rows.append((t, stats.get("bytes_in_use", 0), stats.get("peak_bytes_in_use", 0)))
        time.sleep(period_s)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="device_trace.csv")
    ap.add_argument("--period-ms", type=float, default=1.0)
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given")

    rows = []
    stop = threading.Event()
    th = threading.Thread(
        target=sample_device, args=(stop, rows, args.period_ms / 1e3), daemon=True
    )
    th.start()

    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True)
    t1 = time.time()
    stop.set()
    th.join(timeout=2)

    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr)

    # join: extract "<MARKER>,<epoch>," stamps from the workload stdout
    marks = re.findall(r"^([A-Z][A-Za-z0-9 ._]*),(\d+\.\d+),$", proc.stdout,
                       re.M)
    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["t_epoch", "bytes_in_use", "peak_bytes_in_use"])
        w.writerows(rows)
        w.writerow([])
        w.writerow(["marker", "t_epoch"])
        for name, t in marks:
            w.writerow([name, t])
    print(f"trace: {len(rows)} samples over {t1 - t0:.3f}s -> {args.out}")
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
