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
                   help="Index of the accelerator device")
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
    p.add_argument("--SkipFull", action="store_true",
                   help="Skip aligned-CU prediction")
    p.add_argument("--SkipHalf", action="store_true",
                   help="Skip half-aligned-CU prediction")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    try:
        w, h = (int(v) for v in args.Resolution.lower().split("x"))
    except ValueError:
        print(f"Bad resolution {args.Resolution!r}; expected WxH", file=sys.stderr)
        return 1
    n = args.FramesToBeEncoded

    timing = reporting.Timing()
    timing.stamp("START HOST")

    timing.stamp("START READ .csv")
    orig = frames_io.read_frames_csv(args.OriginalFrames, w, h, n)
    ref = frames_io.read_frames_csv(args.ReferenceFrames, w, h, n)
    timing.stamp("FINISHED READ .csv")

    prefix = args.CpmvLogFile or None
    ckpt = None
    if args.CheckpointDir:
        from vvc_affine_tpu.runtime.checkpoint import CheckpointManager

        ckpt = CheckpointManager(args.CheckpointDir, prefix)
    if prefix and (ckpt is None or ckpt.completed_poc() == 0):
        reporting.remove_old_traces(prefix)

    cfg = PipelineConfig(
        frame_w=w, frame_h=h, qp=args.QP, extra_iters=args.ExtraGradientIter,
        test_full=not args.SkipFull, test_half=not args.SkipHalf,
    )
    pipe = AffineMEPipeline(cfg)

    def on_result(r):
        if prefix or args.ReportToTerminal:
            print(f"Reporting results POC={r.poc} refIdx={r.ref_idx} "
                  f"PredType={r.pred}")
            reporting.report_results(
                prefix, r.pred, w, np.asarray(r.costs), np.asarray(r.cpmvs),
                r.poc, r.ref_idx, to_terminal=args.ReportToTerminal,
            )

    pipe.encode(orig, ref, on_result=on_result, timing=timing, checkpoint=ckpt)
    if args.MemoryReport:
        print(reporting.memory_report(w, h))
    timing.report(n)
    return 0


if __name__ == "__main__":
    sys.exit(main())
