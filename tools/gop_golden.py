"""Run a GOP golden diff on the real TPU and record the artifact.

The decision logs ARE the reference's product (main_aux_functions.h:387-525);
this drives the full CLI twice — shipping plane engine vs the
oracle-verified gather engine — on the same synthetic GOP, byte-diffs every
decision-log CSV, and writes a JSON artifact with the file list, timings,
and verdict.  4K (3840x2160 -> 510 CTUs, constants.h:73-79) is the headline
coverage target:

    python tools/gop_golden.py 3840x2160 --frames 1 --out docs/artifacts/gop_4k_golden.json

Sequential single-TPU-process discipline: each engine runs in its own
child, never concurrently.
"""

import hashlib
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = sys.argv[1:]
    skip = set()
    for opt in ("--out", "--frames"):
        for i, a in enumerate(args):
            if a == opt and i + 1 < len(args):
                skip.add(args[i + 1])
    pos = [a for a in args if not a.startswith("--") and a not in skip]
    res = pos[0] if pos else "3840x2160"
    fw, fh = (int(v) for v in res.split("x"))
    n = int(args[args.index("--frames") + 1]) if "--frames" in args else 1
    out_path = (args[args.index("--out") + 1] if "--out" in args
                else "docs/artifacts/gop_golden.json")

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", "tests"))
    from test_gop_parity import _fixture

    tmp = tempfile.mkdtemp(prefix="gop_golden_")
    opath, rpath = _fixture(tmp, fw, fh, n)
    env = dict(os.environ)
    env.pop("VVC_AFFINE_TPU_PLATFORM", None)
    env.pop("JAX_PLATFORMS", None)

    timings = {}
    for engine in ("plane", "gather"):
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-m", "vvc_affine_tpu.cli",
             "-f", str(n), "-s", f"{fw}x{fh}", "-q", "32",
             "-o", opath, "-r", rpath,
             "-l", os.path.join(tmp, f"{engine}_"),
             "--Engine", engine],
            env=env, capture_output=True, text=True)
        timings[engine] = round(time.time() - t0, 1)
        print(f"{engine}: rc={r.returncode} {timings[engine]}s", flush=True)
        if r.returncode != 0:
            print(r.stdout[-1500:], r.stderr[-3000:])
            return 1

    files = {}
    verdict = "byte-identical"
    plane_files = sorted(f for f in os.listdir(tmp) if f.startswith("plane_"))
    gather_files = sorted(
        f for f in os.listdir(tmp) if f.startswith("gather_"))
    # compare the SUFFIX SETS first: an engine writing fewer (or
    # differently named) logs must register as a mismatch, not pass
    # silently or crash on a missing counterpart
    psuf = {f[len("plane_"):] for f in plane_files}
    gsuf = {f[len("gather_"):] for f in gather_files}
    if psuf != gsuf:
        verdict = "MISMATCH"
        for suf in sorted(psuf ^ gsuf):
            files[suf] = {"match": False,
                          "only_in": "plane" if suf in psuf else "gather"}
    for pf in plane_files:
        if pf[len("plane_"):] not in gsuf:
            continue
        gf = "gather_" + pf[len("plane_"):]
        with open(os.path.join(tmp, pf), "rb") as fa, \
                open(os.path.join(tmp, gf), "rb") as fb:
            da, db = fa.read(), fb.read()
        same = da == db
        files[pf[len("plane_"):]] = {
            "bytes": len(da),
            "sha256": hashlib.sha256(da).hexdigest()[:16],
            "match": same,
        }
        if not same:
            verdict = "MISMATCH"

    artifact = {
        "workload": f"-f {n} -s {fw}x{fh} -q 32, all four pred types",
        "engines": "plane (shipping) vs gather (oracle-verified), full CLI",
        "date": time.strftime("%Y-%m-%d"),
        "device": "TPU v5e (tunnelled), one process per engine, sequential",
        "n_log_files": len(plane_files),
        "verdict": verdict,
        "wall_s": timings,
        "files": files,
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"{verdict}: {len(plane_files)} log files; artifact -> {out_path}")
    return 0 if verdict == "byte-identical" else 2


if __name__ == "__main__":
    sys.exit(main())
