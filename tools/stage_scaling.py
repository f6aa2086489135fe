"""Isolated dominant-stage scaling evidence: run ONLY the blocks stage
(shuffle + sort + Arrow encode — the build's compute core) at local[N]
and local[4N] over the SAME prebuilt postings table.

Full-build efficiency on this shared host is noise-dominated (see
BENCH/BASELINE.md); isolating the dominant stage removes the per-stage
fixed costs and most of the drift surface, measuring the part whose
scaling actually matters at 10^12 turns. Implementation: build the
index once, then per level copy the catalog, mark blocks/terms/metrics
incomplete in the manifest, and let the checkpoint-resume machinery
re-run exactly those stages.

Usage: python tools/stage_scaling.py [N] [replicas] [sf_dir]
Appends to BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, shutil, sys, time
sys.path.insert(0, {repo!r})
from bm25_pagerank_rpi_spark.session import get_spark
from bm25_pagerank_rpi_spark.plans.index_build import build_index
from bm25_pagerank_rpi_spark.sources.catalog import IndexCatalog

cores, src, work = int(sys.argv[1]), sys.argv[2], sys.argv[3]
spark = get_spark(cores=cores, app_name=f"stage_scaling_{{cores}}")
shutil.rmtree(work, ignore_errors=True)
shutil.copytree(src, work)
cat = IndexCatalog(spark, work)
empty = spark.range(0).selectExpr(
    "'c' as conv_id", "0 as turn_idx", "'u' as role", "'' as text",
    "'n' as tool", "current_timestamp() as ts")
# run the stage twice in this JVM: run 1 pays JIT/codegen/Python-worker
# spawn, run 2 is the measured warm observation
seconds = None
for _ in range(2):
    m = cat.read_manifest()
    for st in ("blocks", "terms", "metrics"):
        m["stages"].pop(st, None)
    cat.write_manifest(m)
    build_index(spark, empty, work, resume=True)
    seconds = cat.read_manifest()["stages"]["blocks"]["seconds"]
print(json.dumps({{"cores": cores, "blocks_seconds": seconds}}))
spark.stop()
"""


def run_worker(cores: int, src: str, work: str) -> dict:
    code = WORKER.format(repo=REPO)
    # equal fixed heap per leg — see tools/scaling.py round-5 heap note
    # (an oversized single-JVM heap measurably corrupts the hi leg)
    env = dict(os.environ, SPARK_DRIVER_MEM=os.environ.get("SCALING_HEAP", "16g"))
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), src, work],
        capture_output=True, text=True, cwd=REPO, env=env,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"worker cores={cores} produced no JSON")
    return json.loads(lines[-1])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    repeats = int(os.environ.get("SCALING_REPEATS", "3"))
    base = os.environ.get("SCALING_WORK_DIR", "/dev/shm/bm25_stage_scaling")

    # one-time: materialize corpus + full index at max cores
    src_index = f"{base}/src_index"
    if not os.path.exists(os.path.join(src_index, "_manifest.json")):
        env = dict(
            os.environ, SPARK_GRAFT_CPUS="32", SPARK_GRAFT_SF_DIR=sf_dir,
            BENCH_REPLICAS=str(replicas), BENCH_BUILD_ONLY="1",
            BENCH_INDEX_DIR=src_index,
        )
        subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, cwd=REPO, check=True,
        )

    lo_all, hi_all = [], []
    for _ in range(repeats):
        lo_all.append(run_worker(n, src_index, f"{base}/work_lo")["blocks_seconds"])
        hi_all.append(run_worker(4 * n, src_index, f"{base}/work_hi")["blocks_seconds"])
    lo, hi = min(lo_all), min(hi_all)
    eff = lo / (4.0 * hi)
    result = {
        "metric": "blocks_stage_scaling_efficiency_Nx4N",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_cores": n,
        "blocks_s_lo": lo,
        "blocks_s_hi": hi,
        "speedup": round(lo / hi, 2),
        "repeats": repeats,
        "blocks_s_lo_all": lo_all,
        "blocks_s_hi_all": hi_all,
    }
    print(json.dumps(result))
    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"""
## Isolated blocks-stage scaling run {stamp}

Only the blocks stage (shuffle on (term, range_id) + in-partition sort
+ Arrow numpy encode) re-runs over the SAME prebuilt postings table
(replicas={replicas}, {sf_dir}) via checkpoint-resume, at local[{n}]
and local[{4 * n}]; {repeats} interleaved repeats per level, minima
compared. Observations: N = {lo_all} s, 4N = {hi_all} s.

| level | cores | blocks stage s (min) |
| --- | --- | --- |
| N | {n} | {lo} |
| 4N | {4 * n} | {hi} |

- speedup {lo / hi:.2f}x, raw efficiency T(N)/(4*T(4N)) = **{eff:.3f}**
"""
        )


if __name__ == "__main__":
    main()
