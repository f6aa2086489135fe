"""Scaling-efficiency evidence (north_rule): run the SAME index build at
two parallelism levels — local[N] and local[4N] — and report throughput
at both plus efficiency = T(4N) / (4 * T(N)).

A real cluster is unavailable in this sandbox, so core count stands in
for executor count (the BASELINE.md methodology note). Each level runs
in its own subprocess because a local master is fixed per JVM.

Usage: python tools/scaling.py [N] [replicas] [sf_dir]
Writes/updates BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cores: int, replicas: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cores),
        SPARK_GRAFT_SF_DIR=sf_dir,
        BENCH_REPLICAS=str(replicas),
        BENCH_BUILD_ONLY="1",
        BENCH_INDEX_DIR=f"/tmp/bm25_scaling_index_c{cores}",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    lo = run_level(n, replicas, sf_dir)
    hi = run_level(4 * n, replicas, sf_dir)
    t_lo = lo["turns"] / lo["value"]
    t_hi = hi["turns"] / hi["value"]
    eff = t_hi / (4.0 * t_lo)
    result = {
        "metric": "index_build_scaling_efficiency_Nx4N",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_cores": n,
        "turns": lo["turns"],
        "sf_dir": sf_dir,
        "throughput_lo_tps": round(t_lo, 1),
        "throughput_hi_tps": round(t_hi, 1),
        "build_s_lo": lo["value"],
        "build_s_hi": hi["value"],
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    with open(md, "a") as f:
        f.write(
            f"""
## Scaling run {stamp}

Same input ({lo['turns']} turns synthesized from {sf_dir},
replicas={replicas}), same job (full index build: doc_meta -> postings
-> compressed blocks -> terms -> metrics), two parallelism levels.
local[N] cores stand in for N executors (no real cluster in sandbox).

| level | cores | build s | turns/sec |
| --- | --- | --- | --- |
| N | {n} | {lo['value']} | {t_lo:.1f} |
| 4N | {4 * n} | {hi['value']} | {t_hi:.1f} |

**Scaling efficiency T(4N)/(4*T(N)) = {eff:.3f}** (north_rule target >= 0.8)
"""
        )


if __name__ == "__main__":
    main()
