"""Frame-level encoding pipeline: the engine's host orchestration.

Behavioural spec: the frame loop of main.cpp:578-1010 — per frame:
POC/numRefs/lambda selection, reference-buffer update, then for each refIdx
the four stages FULL_2CP -> FULL_3CP (consuming the 2CP CPMVs) ->
HALF_2CP -> HALF_3CP, with results handed to the decision-log writer.

TPU-native differences: frames are device-resident jnp arrays handed out by
POC label (no device-to-device slot copies); stage dispatch is async (XLA
queues all four stages per ref without host round-trips); readback happens
once per (frame, ref) when results are consumed.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vvc_affine_tpu import constants as C
from vvc_affine_tpu.models import affine_me, affine_plane
from vvc_affine_tpu.runtime.refmanager import ReferenceBuffer

PRED_FULL_2CP, PRED_FULL_3CP, PRED_HALF_2CP, PRED_HALF_3CP = range(4)


@dataclass
class PipelineConfig:
    frame_w: int
    frame_h: int
    qp: int
    extra_iters: int = 0
    test_full: bool = True
    test_half: bool = True
    device: Optional[jax.Device] = None
    # multi-chip: a jax.sharding.Mesh with a 'ctu' axis; stages are built
    # CTU-sharded over it (parallel.mesh) and outputs stay bit-identical
    mesh: Optional[object] = None
    # 'plane' = dense gather-free engine (models.affine_plane, the fast
    # path); 'gather' = the original merged-group engine (models.affine_me).
    # Outputs are bit-identical.
    engine: str = "plane"
    # fuse each mode's 2CP->3CP chain into ONE jitted program (plane engine
    # only): halves the per-resolution executable count — and with it this
    # platform's per-executable deferred first-run build cost — and keeps
    # the CPMV handoff on-device.  Bit-identical outputs.  The trade-off is
    # timing granularity: exec time is attributed per (mode) pair instead
    # of per pred type; set False for the reference's per-pred timing split
    # (kernelExecutionTime[4], main_aux_functions.h:1416-1446).
    fused: bool = True


@dataclass
class StageResult:
    poc: int
    ref_idx: int
    pred: int
    costs: jnp.ndarray   # int64 [nCtu, nCU]
    cpmvs: jnp.ndarray   # int32 [nCtu, nCU, 3, 2]


class AffineMEPipeline:
    """Runs Affine ME over a GOP of frames."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.stages = {}
        self.pairs = {}
        for mode, on in (("full", cfg.test_full), ("half", cfg.test_half)):
            if not on:
                continue
            if cfg.engine == "plane" and cfg.fused:
                specs = tuple(
                    affine_plane.PlaneSpec(mode, n_cp, cfg.frame_w,
                                           cfg.frame_h, cfg.extra_iters)
                    for n_cp in (2, 3))
                if cfg.mesh is not None:
                    from vvc_affine_tpu.parallel import mesh as pmesh

                    self.pairs[mode] = pmesh.build_plane_pair_sharded(
                        *specs, cfg.mesh, telemetry=True)
                else:
                    self.pairs[mode] = affine_plane.build_pair_stage(
                        *specs, telemetry=True)
                continue
            for n_cp in (2, 3):
                if cfg.engine == "plane":
                    pspec = affine_plane.PlaneSpec(
                        mode, n_cp, cfg.frame_w, cfg.frame_h, cfg.extra_iters
                    )
                    # telemetry: escape-budget counters ride along and feed
                    # the timing report (VERDICT: budget observability)
                    if cfg.mesh is not None:
                        from vvc_affine_tpu.parallel import mesh as pmesh

                        self.stages[(mode, n_cp)] = \
                            pmesh.build_plane_stage_sharded(
                                pspec, cfg.mesh, telemetry=True)
                    else:
                        self.stages[(mode, n_cp)] = \
                            affine_plane.build_stage(pspec, telemetry=True)
                else:
                    spec = affine_me.StageSpec(
                        mode, n_cp, cfg.frame_w, cfg.frame_h, cfg.extra_iters
                    )
                    if cfg.mesh is not None:
                        from vvc_affine_tpu.parallel import mesh as pmesh

                        self.stages[(mode, n_cp)] = \
                            pmesh.build_stage_sharded(spec, cfg.mesh)
                    else:
                        self.stages[(mode, n_cp)] = affine_me.build_stage(spec)
        # replicated over the mesh: under a multi-host mesh every stage
        # input must be a global array (local arrays cannot cross into a
        # mesh-sharded jit)
        self._zeros = {
            mode: self._put_repl(np.asarray(affine_me.zero_cpmvs(
                affine_me.StageSpec(mode, 2, cfg.frame_w, cfg.frame_h))))
            for mode in ("full", "half")
        }
        self._exec = {}   # multi-process AOT executables (see _callable)

    PRED_LABEL = ("FULL_2CP", "FULL_3CP", "HALF_2CP", "HALF_3CP")

    def _align(self):
        """Multi-process: barrier before dispatch so a program's FIRST
        execution (which creates Gloo communicator contexts for its
        telemetry psums, ~30 s rendezvous window) never happens under
        cross-process compile skew.  Single-process: no-op."""
        if self.cfg.mesh is None:
            return
        from vvc_affine_tpu.runtime import distributed as dist

        dist.align_processes("stage")

    def _callable(self, kind, key, fn, args):
        """Resolve the stage callable, multi-process-safely.

        jit fuses compile into the first call, so under jax.distributed a
        program's first DISPATCH — the moment its Gloo communicator
        contexts rendezvous (hard ~30 s window) — would happen at
        whatever cross-process skew the minutes-long independent compiles
        left behind.  Multi-process: AOT-compile (fn.lower().compile()),
        then barrier, then hand back the compiled executable so dispatch
        happens in lockstep.  Single-process: the jitted fn unchanged.
        """
        if self.cfg.mesh is None or jax.process_count() <= 1:
            return fn
        k = (kind, key)
        if k not in self._exec:
            # sharded builders expose precompile(); it AOT-compiles and
            # pins the executable inside the wrapper, so the subsequent
            # call dispatches without compiling
            fn.precompile(*args)
            from vvc_affine_tpu.runtime import distributed as dist

            dist.align_processes("compiled")
            self._exec[k] = True
        return fn

    def _run_stage(self, key, pred, poc, ref_idx, ref_dev, orig_dev, lam,
                   prev, timing):
        """One stage dispatch with real per-pred timing.

        With timing enabled, the dispatch is bracketed by START/FINISHED
        EXEC stamps per (pred, refIdx, POC) and closed by a device->host
        scalar fetch — the analogue of the reference's per-kernel event
        profiling + exec-phase timestamps (main.cpp:764-955, 862-866).  A
        full-output fetch would serialize PCIe readback into the timing;
        the scalar reduction only waits for execution.  Without timing the
        dispatch stays fully async.
        """
        fn = self._callable("stage", key, self.stages[key],
                            (ref_dev, orig_dev, lam, prev))
        self._align()
        if timing is None:
            out = fn(ref_dev, orig_dev, lam, prev)
            return out[0], out[1]
        import time as _time

        label = f"EXEC {self.PRED_LABEL[pred]} POC {poc} ref {ref_idx}"
        timing.stamp(f"START {label}")
        t0 = _time.time()
        out = fn(ref_dev, orig_dev, lam, prev)
        cost, cp = out[0], out[1]
        # block_until_ready is a no-op on the tunnelled TPU platform; a
        # device->host fetch is the only reliable execution barrier
        np.asarray(cost.sum())
        t1 = _time.time()
        timing.stamp(f"FINISHED {label}")
        timing.add(pred, t1 - t0)
        if len(out) == 3 and hasattr(timing, "add_escapes"):
            telem = out[2]
            timing.add_escapes(int(np.asarray(telem.n_escapes)),
                               int(np.asarray(telem.max_groups)),
                               int(np.asarray(telem.n_fallbacks)),
                               np.asarray(telem.rung_hist))
        return cost, cp

    def _run_pair(self, mode, base, poc, ref_idx, ref_dev, orig_dev, lam,
                  timing):
        """One fused 2CP->3CP dispatch (cfg.fused).

        With timing, exec time is attributed to the PAIR (the two preds run
        inside one executable, so a per-pred split does not exist); stamps
        bracket the pair under a combined label."""
        prev = self._zeros[mode]
        fn = self._callable("pair", mode, self.pairs[mode],
                            (ref_dev, orig_dev, lam, prev))
        self._align()
        if timing is None:
            out = fn(ref_dev, orig_dev, lam, prev)
            return out[0], out[1], out[2], out[3]
        import time as _time

        lbl = (f"EXEC {self.PRED_LABEL[base]}+{self.PRED_LABEL[base + 1]} "
               f"POC {poc} ref {ref_idx}")
        timing.stamp(f"START {lbl}")
        t0 = _time.time()
        out = fn(ref_dev, orig_dev, lam, prev)
        np.asarray(out[0].sum())   # device->host fetch: the only barrier
        np.asarray(out[2].sum())
        t1 = _time.time()
        timing.stamp(f"FINISHED {lbl}")
        if hasattr(timing, "add_pair"):
            timing.add_pair(base, t1 - t0)
        else:
            timing.add(base, t1 - t0)
        if len(out) >= 6 and hasattr(timing, "add_escapes"):
            for telem in out[4:6]:
                timing.add_escapes(int(np.asarray(telem.n_escapes)),
                                   int(np.asarray(telem.max_groups)),
                                   int(np.asarray(telem.n_fallbacks)),
                                   np.asarray(telem.rung_hist))
        return out[0], out[1], out[2], out[3]

    def _put_repl(self, x) -> jnp.ndarray:
        """Replicate a (host-identical) value over the mesh / device.

        Multi-host: every process stages the same frame bytes, so the
        replicated global array needs no cross-host transfer beyond XLA's
        bookkeeping — this is the DCN-once-per-frame staging of SURVEY 2.4.
        """
        if self.cfg.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            return jax.device_put(
                x, NamedSharding(self.cfg.mesh, PartitionSpec()))
        if self.cfg.device is not None:
            return jax.device_put(x, self.cfg.device)
        return jnp.asarray(x)

    def _put(self, frame: np.ndarray) -> jnp.ndarray:
        return self._put_repl(
            np.ascontiguousarray(frame, np.int32).reshape(-1))

    def encode(
        self,
        orig_frames: np.ndarray,   # [N, H, W] (POC 1..N)
        ref_frames: np.ndarray,    # [N, H, W] (reconstructed POC 0..N-1)
        on_result: Optional[Callable[[StageResult], None]] = None,
        timing=None,
        checkpoint=None,           # runtime.checkpoint.CheckpointManager
    ) -> List[StageResult]:
        cfg = self.cfg
        n_frames = orig_frames.shape[0]
        refbuf = ReferenceBuffer()
        frames_by_poc: Dict[int, jnp.ndarray] = {}
        results: List[StageResult] = []

        done_poc = 0
        if checkpoint is not None:
            done_poc = checkpoint.completed_poc()
            checkpoint.prune_logs_after(done_poc)

        # stage the first original frame (prefetching happens per iteration)
        orig_dev = self._put(orig_frames[0])
        next_orig = None

        for curr in range(n_frames):
            poc = curr + 1
            num_refs = min(C.MAX_REFS, poc)
            lam = self._put_repl(np.float32(C.lambda_for(cfg.qp, poc)))

            # reference list update: recon frame (poc-1) enters slot 0
            frames_by_poc[poc - 1] = self._put(ref_frames[curr])
            refbuf.push(poc)
            ref_labels = refbuf.ref_list(poc)
            # drop frames no longer referenced (keeps device memory flat)
            live = set(ref_labels)
            frames_by_poc = {k: v for k, v in frames_by_poc.items() if k in live}

            # async prefetch of the next original frame (double buffering,
            # cf. main.cpp:711-715)
            if curr + 1 < n_frames:
                next_orig = self._put(orig_frames[curr + 1])

            if poc <= done_poc:
                # resumed run: frame already complete; only the reference
                # bookkeeping above was needed
                if next_orig is not None:
                    orig_dev, next_orig = next_orig, None
                continue

            for ref_idx in range(num_refs):
                ref_dev = frames_by_poc[ref_labels[ref_idx]]
                per_ref: List[StageResult] = []
                for mode, base in (("full", PRED_FULL_2CP), ("half", PRED_HALF_2CP)):
                    if mode in self.pairs:
                        cost2, cp2, cost3, cp3 = self._run_pair(
                            mode, base, poc, ref_idx, ref_dev, orig_dev,
                            lam, timing)
                    elif (mode, 2) in self.stages:
                        cost2, cp2 = self._run_stage(
                            (mode, 2), base, poc, ref_idx,
                            ref_dev, orig_dev, lam, self._zeros[mode], timing)
                        cost3, cp3 = self._run_stage(
                            (mode, 3), base + 1, poc, ref_idx,
                            ref_dev, orig_dev, lam, cp2, timing)
                    else:
                        continue
                    per_ref.append(StageResult(poc, ref_idx, base, cost2, cp2))
                    per_ref.append(StageResult(poc, ref_idx, base + 1, cost3, cp3))
                for r in per_ref:
                    results.append(r)
                    if on_result is not None:
                        on_result(r)

            if checkpoint is not None:
                checkpoint.mark_frame_done(poc)
            if next_orig is not None:
                orig_dev, next_orig = next_orig, None
        return results
