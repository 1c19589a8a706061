"""Command-line entry point, flag-compatible with the reference binary.

Behavioural spec: main.cpp:58-86 (boost::program_options) — the same flags
drive the same run shape:

    python -m vvc_affine_tpu.cli -f 2 -s 1920x1080 -q 32 \
        -o original_frames.csv -r reconstructed_frames.csv -l decisions_log
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from vvc_affine_tpu import constants as C
from vvc_affine_tpu.models.pipeline import AffineMEPipeline, PipelineConfig
from vvc_affine_tpu.runtime import frames as frames_io
from vvc_affine_tpu.runtime import reporting


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="vvc_affine_tpu",
        description="TPU-native VVC Affine Motion Estimation engine",
    )
    p.add_argument("--DeviceIndex", type=int, default=0,
                   help="Index of the accelerator device (main.cpp:154-216)")
    p.add_argument("--NumChips", type=int, default=1,
                   help="Shard the CTU axis over this many devices "
                        "(TPU-native extension; 1 = single device)")
    p.add_argument("--Coordinator", type=str, default="",
                   help="host:port of the jax.distributed coordinator "
                        "(multi-host runs; one CLI invocation per host)")
    p.add_argument("--NumProcesses", type=int, default=1,
                   help="Total process count of the multi-host run")
    p.add_argument("--ProcessId", type=int, default=0,
                   help="This process's rank in the multi-host run")
    p.add_argument("-q", "--QP", type=int, required=True,
                   help="Quantization parameter")
    p.add_argument("-f", "--FramesToBeEncoded", type=int, required=True,
                   help="Number of frames to be processed")
    p.add_argument("--ExtraGradientIter", type=int, default=0,
                   help="Extra iterations during gradient-based Affine ME")
    p.add_argument("-s", "--Resolution", type=str, required=True,
                   help="Resolution of the video, e.g. 1920x1080")
    p.add_argument("-o", "--OriginalFrames", type=str, required=True,
                   help="CSV of original frame samples")
    p.add_argument("-r", "--ReferenceFrames", type=str, required=True,
                   help="CSV of reference frame samples")
    p.add_argument("-l", "--CpmvLogFile", type=str, default="",
                   help="Decision-log file prefix (empty: no logs)")
    p.add_argument("--ReportToTerminal", action="store_true")
    p.add_argument("--CheckpointDir", type=str, default="",
                   help="enable GOP-level checkpoint/resume in this directory")
    p.add_argument("--MemoryReport", action="store_true",
                   help="print the device-buffer footprint table")
    p.add_argument("--DeviceTrace", type=str, default="",
                   help="write a ~1ms in-process device activity trace CSV "
                        "(join with tools/energy_report.py)")
    p.add_argument("--SkipFull", action="store_true",
                   help="Skip aligned-CU prediction")
    p.add_argument("--SkipHalf", action="store_true",
                   help="Skip half-aligned-CU prediction")
    p.add_argument("--Engine", choices=("plane", "gather"), default="plane",
                   help="Compute engine: dense plane (fast) or gather "
                        "(reference-shaped); outputs are bit-identical")
    p.add_argument("--PerPredTiming", action="store_true",
                   help="Dispatch the 2CP/3CP stages as separate programs "
                        "for a per-pred-type timing split (the reference's "
                        "kernelExecutionTime[4]); default fuses each "
                        "mode's chain into one program (faster start-up, "
                        "pair-level timing)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    try:
        w, h = (int(v) for v in args.Resolution.lower().split("x"))
    except ValueError:
        print(f"Bad resolution {args.Resolution!r}; expected WxH", file=sys.stderr)
        return 1
    n = args.FramesToBeEncoded

    device = None
    mesh = None
    primary = True
    if args.Coordinator:
        from vvc_affine_tpu.runtime import distributed as dist

        dist.initialize(args.Coordinator, args.NumProcesses, args.ProcessId)
        mesh = dist.global_mesh()
        primary = dist.is_primary()
    elif args.NumChips > 1:
        import jax

        from vvc_affine_tpu.parallel import mesh as pmesh

        devs = jax.devices()
        if args.DeviceIndex + args.NumChips > len(devs):
            print(f"Need {args.NumChips} devices starting at index "
                  f"{args.DeviceIndex}, have {len(devs)}", file=sys.stderr)
            return 1
        mesh = pmesh.make_mesh(devs[args.DeviceIndex:
                                    args.DeviceIndex + args.NumChips])
    elif args.DeviceIndex:
        import jax

        devs = jax.devices()
        if args.DeviceIndex >= len(devs):
            print(f"DeviceIndex {args.DeviceIndex} out of range "
                  f"({len(devs)} devices)", file=sys.stderr)
            return 1
        device = devs[args.DeviceIndex]

    timing = reporting.Timing()
    timing.stamp("START HOST")

    timing.stamp("START READ .csv")
    orig = frames_io.read_frames_csv(args.OriginalFrames, w, h, n)
    ref = frames_io.read_frames_csv(args.ReferenceFrames, w, h, n)
    timing.stamp("FINISHED READ .csv")

    prefix = args.CpmvLogFile or None
    ckpt = None
    if args.CheckpointDir:
        from vvc_affine_tpu.runtime.checkpoint import (CheckpointManager,
                                                       FollowerCheckpoint)

        if primary:
            ckpt = CheckpointManager(args.CheckpointDir, prefix)
        if args.Coordinator:
            # every process must skip the same completed frames — the
            # sharded stages/gathers are collective, so a desynced resume
            # deadlocks the cluster
            from vvc_affine_tpu.runtime import distributed as dist

            done = dist.broadcast_scalar(
                ckpt.completed_poc() if primary else 0)
            if not primary:
                ckpt = FollowerCheckpoint(done)
    if prefix and primary and (ckpt is None or ckpt.completed_poc() == 0):
        reporting.remove_old_traces(prefix)

    cfg = PipelineConfig(
        frame_w=w, frame_h=h, qp=args.QP, extra_iters=args.ExtraGradientIter,
        test_full=not args.SkipFull, test_half=not args.SkipHalf,
        device=device, mesh=mesh, engine=args.Engine,
        fused=not args.PerPredTiming,
    )
    pipe = AffineMEPipeline(cfg)

    def on_result(r):
        if not (prefix or args.ReportToTerminal):
            return
        if args.Coordinator:
            from vvc_affine_tpu.runtime import distributed as dist

            costs = dist.gather_to_host(r.costs)
            cpmvs = dist.gather_to_host(r.cpmvs)
            if not primary:   # process 0 owns the decision logs
                return
        else:
            costs = np.asarray(r.costs)
            cpmvs = np.asarray(r.cpmvs)
        print(f"Reporting results POC={r.poc} refIdx={r.ref_idx} "
              f"PredType={r.pred}")
        reporting.report_results(
            prefix, r.pred, w, costs, cpmvs,
            r.poc, r.ref_idx, to_terminal=args.ReportToTerminal,
        )

    tracer = None
    if args.DeviceTrace:
        tracer = reporting.DeviceTraceSampler(args.DeviceTrace)
        tracer.start()
    try:
        pipe.encode(orig, ref, on_result=on_result, timing=timing,
                    checkpoint=ckpt)
    finally:
        if tracer is not None:
            tracer.stop()
    if args.MemoryReport:
        print(reporting.memory_report(w, h))
    timing.report(n)
    if args.Coordinator:
        from vvc_affine_tpu.runtime import distributed as dist

        dist.finalize()
    return 0


if __name__ == "__main__":
    sys.exit(main())
