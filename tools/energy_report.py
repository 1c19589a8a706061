"""Join a device trace with engine timestamps into an activity report.

Analogue of the reference's computeEnergy_Affine_NVIDIA_v2.py:80-195, which
parses `print_timestamp` markers from the run log and joins them with the
1 ms nvidia-smi power trace to report average power, active-GPU time, and
energy.  TPUs expose no host-side power counter, so this reports the
available utilization proxies instead:

* per-phase **device duty cycle**: the fraction of each phase covered by
  the engine's own `START/FINISHED EXEC ...` dispatch windows (each window
  brackets a stage dispatch closed by a device fetch, so device execution
  is contained in them) — the active-GPU-time analogue, and the signal
  that works on THIS platform (the tunnelled TPU returns no memory/power
  counters, so the trace's bytes column reads zero);
* per-phase wall time and (where the platform reports it) device-memory
  activity from tools/power_trace.py / --DeviceTrace traces.

Usage:
    python -m vvc_affine_tpu.cli ... --DeviceTrace trace.csv | tee run.log
    python tools/energy_report.py --trace trace.csv --log run.log
"""

from __future__ import annotations

import argparse
import csv
import re
import sys

_STAMP = re.compile(r"^(START|FINISHED) ([A-Za-z0-9_ .+-]+?),(\d+)\.(\d+),")


def parse_stamps(log_path):
    """(label, t_start, t_end) phases from START/FINISHED marker pairs."""
    opens = {}
    phases = []
    with open(log_path) as f:
        for line in f:
            m = _STAMP.match(line.strip())
            if not m:
                continue
            kind, label, sec, usec = m.groups()
            t = int(sec) + int(usec) / 10 ** len(usec)
            if kind == "START":
                opens[label] = t
            elif label in opens:
                phases.append((label, opens.pop(label), t))
    return phases


def _merge(intervals):
    out = []
    for a, b in sorted(intervals):
        if out and a <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], b))
        else:
            out.append((a, b))
    return out


def duty_cycle(phases, a, b):
    """Fraction of [a, b] covered by EXEC dispatch windows.

    Each `EXEC ...` stamp pair brackets one stage dispatch closed by a
    device->host fetch, so device execution time is contained in (and on
    this engine, dominates) their union — the active-device-time proxy
    the reference derives from nvidia-smi power
    (computeEnergy_Affine_NVIDIA_v2.py:120-171).
    """
    execs = _merge([(s, e) for lbl, s, e in phases if lbl.startswith("EXEC")])
    cov = sum(min(b, e) - max(a, s) for s, e in execs
              if min(b, e) > max(a, s))
    return cov / (b - a) if b > a else 0.0


def parse_trace(trace_path):
    rows = []
    with open(trace_path) as f:
        for row in csv.reader(f):
            if not row or not row[0][:1].isdigit():
                continue
            rows.append((float(row[0]), int(row[1]), int(row[2])))
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", required=True, help="power_trace.py CSV")
    ap.add_argument("--log", required=True, help="engine stdout with stamps")
    args = ap.parse_args(argv)

    trace = parse_trace(args.trace)
    phases = parse_stamps(args.log)
    if not trace:
        print("empty trace", file=sys.stderr)
        return 1

    t0, t1 = trace[0][0], trace[-1][0]
    peak = max(r[2] for r in trace)
    print(f"trace: {len(trace)} samples over {t1 - t0:.3f}s, "
          f"peak device bytes {peak}")
    print("phase,seconds,duty_cycle_pct,avg_bytes_in_use,samples")
    # top-level phases (non-EXEC) get a device duty cycle from the union
    # of EXEC dispatch windows inside them; EXEC rows are the windows
    # themselves (duty 100 by definition of the proxy)
    for label, a, b in phases:
        in_phase = [r for r in trace if a <= r[0] <= b]
        avg = sum(r[1] for r in in_phase) / len(in_phase) if in_phase else 0
        duty = 100.0 if label.startswith("EXEC") else \
            100.0 * duty_cycle(phases, a, b)
        print(f"{label},{b - a:.6f},{duty:.1f},{avg:.0f},{len(in_phase)}")
    total = sum(b - a for _, a, b in phases)
    lo = min(a for _, a, _ in phases)
    hi = max(b for _, _, b in phases)
    print(f"TOTAL_PHASE_TIME,{total:.6f},"
          f"{100.0 * duty_cycle(phases, lo, hi):.1f},,")
    return 0


if __name__ == "__main__":
    sys.exit(main())
