"""Reference-buffer schedule, CSV ingest, reporting, and CLI smoke tests."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from vvc_affine_tpu import constants as C
from vvc_affine_tpu import geometry as G
from vvc_affine_tpu.models import affine_me
from vvc_affine_tpu.models.pipeline import AffineMEPipeline, PipelineConfig
from vvc_affine_tpu.runtime import frames as frames_io
from vvc_affine_tpu.runtime import reporting
from vvc_affine_tpu.runtime.refmanager import ReferenceBuffer


def test_reference_buffer_schedule():
    """VTM low-delay GOP8 list: sliding window + retained POC%8==0 LT refs
    (main.cpp:578-707)."""
    expected = {
        1: [0],
        2: [1, 0],
        3: [2, 1, 0],
        4: [3, 2, 1, 0],
        5: [4, 3, 2, 0],
        6: [5, 4, 3, 0],
        7: [6, 5, 4, 0],
        8: [7, 6, 5, 0],
        9: [8, 7, 6, 0],
        10: [9, 8, 7, 0],
        11: [10, 9, 8, 0],
        12: [11, 10, 8, 0],
        13: [12, 11, 8, 0],
    }
    buf = ReferenceBuffer()
    for poc in range(1, 14):
        buf.push(poc)
        assert buf.ref_list(poc) == expected[poc], poc


def test_csv_roundtrip(tmp_path):
    frames = np.random.default_rng(0).integers(0, 1024, size=(3, 16, 24)).astype(np.uint16)
    path = str(tmp_path / "frames.csv")
    frames_io.write_frames_csv(path, frames)
    back = frames_io.read_frames_csv(path, 24, 16, 3)
    np.testing.assert_array_equal(back, frames)


def test_decision_log_format(tmp_path):
    prefix = str(tmp_path / "log")
    lay = G.layout("full")
    n_ctus = 2
    costs = np.arange(n_ctus * lay.cus_per_ctu, dtype=np.int64).reshape(n_ctus, -1)
    cpmvs = np.zeros((n_ctus, lay.cus_per_ctu, 3, 2), np.int32)
    cpmvs[1, 3] = [[1, -2], [3, -4], [5, -6]]
    reporting.report_results(prefix, 0, 256, costs, cpmvs, poc=1, ref=0)

    path = f"{prefix}_FULL_2CPs_64x64.csv"
    with open(path) as f:
        lines = f.read().splitlines()
    assert lines[0] == "POC,List,Ref,CTU,idx,X,Y,Cost,LT_X,LT_Y,RT_X,RT_Y,LB_X,LB_Y"
    # 64x64 stride is 5 (constants.cl:126-141): 4 CUs per CTU x 2 CTUs
    assert len(lines) == 1 + 2 * 4
    # CTU 1 of a 256-wide frame sits at x=128; CU1 of 64x64 at (64, 0)
    assert lines[1 + 4 + 1] == f"1,0,0,1,1,192,0,{costs[1, 5 + 1]},0,0,0,0,0,0"
    # the 3CP CPMV row content
    reporting.report_results(prefix, 1, 256, costs, cpmvs, poc=1, ref=0)
    with open(f"{prefix}_FULL_3CPs_64x128.csv") as f:
        rows = f.read().splitlines()
    # class 64x128 has stride 3: flat idx 3 is its CU 0
    assert rows[1 + 2] == f"1,0,0,1,0,128,0,{costs[1, 3]},1,-2,3,-4,5,-6"


def test_half_log_shared_files(tmp_path):
    prefix = str(tmp_path / "log")
    lay = G.layout("half")
    costs = np.zeros((1, lay.cus_per_ctu), np.int64)
    cpmvs = np.zeros((1, lay.cus_per_ctu, 3, 2), np.int32)
    reporting.report_results(prefix, 2, 128, costs, cpmvs, poc=1, ref=0)
    # 64x16 appears as G1 (8 CUs) and G2 (4 CUs) -> one shared file, 12 rows
    with open(f"{prefix}_HALF_2CPs_64x16.csv") as f:
        lines = f.read().splitlines()
    assert len(lines) == 1 + 8 + 4
    # 16x16 has G1-G4 + U123: 32+32+16+16+32 = 128 rows
    with open(f"{prefix}_HALF_2CPs_16x16.csv") as f:
        lines = f.read().splitlines()
    assert len(lines) == 1 + 128


def test_pipeline_matches_direct_stages():
    rng = np.random.default_rng(3)
    fw = fh = 128
    n = 2
    orig = rng.integers(0, 1024, size=(n, fh, fw)).astype(np.uint16)
    ref = rng.integers(0, 1024, size=(n, fh, fw)).astype(np.uint16)

    cfg = PipelineConfig(frame_w=fw, frame_h=fh, qp=32, test_half=False)
    pipe = AffineMEPipeline(cfg)
    results = pipe.encode(orig, ref)
    # POC1: 1 ref x 2 preds; POC2: 2 refs x 2 preds
    assert [(r.poc, r.ref_idx, r.pred) for r in results] == [
        (1, 0, 0), (1, 0, 1),
        (2, 0, 0), (2, 0, 1), (2, 1, 0), (2, 1, 1),
    ]

    # direct: POC2 refIdx0 must use recon frame POC1, refIdx1 recon POC0
    spec2 = affine_me.StageSpec("full", 2, fw, fh)
    run2 = affine_me.build_stage(spec2)
    lam2 = jnp.float32(C.lambda_for(32, 2))
    zeros = affine_me.zero_cpmvs(spec2)
    for ref_idx, recon in ((0, ref[1]), (1, ref[0])):
        cost, cp = run2(
            jnp.asarray(recon.astype(np.int32).ravel()),
            jnp.asarray(orig[1].astype(np.int32).ravel()),
            lam2, zeros,
        )
        r = next(x for x in results if (x.poc, x.ref_idx, x.pred) == (2, ref_idx, 0))
        np.testing.assert_array_equal(np.asarray(r.costs), np.asarray(cost))
        np.testing.assert_array_equal(np.asarray(r.cpmvs), np.asarray(cp))


def test_cli_end_to_end(tmp_path):
    from vvc_affine_tpu import cli

    rng = np.random.default_rng(5)
    fw = fh = 128
    orig = rng.integers(0, 1024, size=(2, fh, fw)).astype(np.uint16)
    ref = rng.integers(0, 1024, size=(2, fh, fw)).astype(np.uint16)
    opath = str(tmp_path / "orig.csv")
    rpath = str(tmp_path / "ref.csv")
    frames_io.write_frames_csv(opath, orig)
    frames_io.write_frames_csv(rpath, ref)
    prefix = str(tmp_path / "decisions")

    rc = cli.main([
        "-f", "2", "-s", f"{fw}x{fh}", "-q", "32",
        "-o", opath, "-r", rpath, "-l", prefix, "--SkipHalf",
    ])
    assert rc == 0
    # 12 aligned log files per pred type, each with header + rows for
    # (poc1,ref0) + (poc2,ref0) + (poc2,ref1)
    lay = G.layout("full")
    for ci, cls in enumerate(lay.classes):
        for pred in ("FULL_2CPs", "FULL_3CPs"):
            with open(f"{prefix}_{pred}_{cls.size_str}.csv") as f:
                lines = f.read().splitlines()
            assert len(lines) == 1 + 3 * cls.num_cus


def test_checkpoint_resume_bitexact_logs(tmp_path):
    """A run interrupted mid-frame resumes to byte-identical decision logs."""
    from vvc_affine_tpu.runtime import reporting
    from vvc_affine_tpu.runtime.checkpoint import CheckpointManager

    rng = np.random.default_rng(9)
    fw = fh = 128
    orig = rng.integers(0, 1024, size=(3, fh, fw)).astype(np.uint16)
    ref = rng.integers(0, 1024, size=(3, fh, fw)).astype(np.uint16)
    cfg = PipelineConfig(frame_w=fw, frame_h=fh, qp=32, test_half=False)
    pipe = AffineMEPipeline(cfg)

    def writer(prefix):
        def on_result(r):
            reporting.report_results(
                prefix, r.pred, fw, np.asarray(r.costs), np.asarray(r.cpmvs),
                r.poc, r.ref_idx)
        return on_result

    # golden: uninterrupted run
    gold = str(tmp_path / "gold")
    pipe.encode(orig, ref, on_result=writer(gold))

    # interrupted run: crash after the first (poc=2) block hits the logs
    res = str(tmp_path / "res")
    ck = CheckpointManager(str(tmp_path / "ck"), res)

    class Boom(Exception):
        pass

    def crashing(r):
        writer(res)(r)
        if r.poc == 2:
            raise Boom()

    try:
        pipe.encode(orig, ref, on_result=crashing, checkpoint=ck)
    except Boom:
        pass
    assert ck.completed_poc() == 1

    # resume: prunes the partial poc-2 rows and finishes the GOP
    pipe.encode(orig, ref, on_result=writer(res), checkpoint=ck)
    assert ck.completed_poc() == 3

    import vvc_affine_tpu.geometry as G2
    for cls in G2.layout("full").classes:
        for pred in ("FULL_2CPs", "FULL_3CPs"):
            a = open(f"{gold}_{pred}_{cls.size_str}.csv").read()
            b = open(f"{res}_{pred}_{cls.size_str}.csv").read()
            assert a == b
