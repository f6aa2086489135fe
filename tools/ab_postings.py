"""Drift-aware A/B of postings-stage TF plans: string / hashed / fused.

Same protocol as tools/ab_blocks.py (the host's memory bandwidth wanders
>10x; interleave variants round-robin, probe memcpy before every
observation, compare min-of-rounds). Isolation rides the checkpoint
machinery: pop the ``postings`` entry from a prebuilt catalog's manifest
and re-run ``build_index`` with ``resume=True`` — exactly the postings
stage executes (doc_meta is complete, blocks/terms/metrics stay marked
complete), and its wall time lands in the manifest.

Variants:
  string   explode -> groupBy(term, doc_int) hash agg (term-string keys)
  hashed   explode -> groupBy(xxhash64(term), doc_int) + dict restore
  fused    mapInArrow tokenize+segmented-count (no explode, no global agg)

Usage: python tools/ab_postings.py [cores] [rounds] [--positions]
(--positions times the with_positions stage — posexplode+collect_list
agg plans vs the fused positions kernel — on a copy of the index dir)
Requires the scaling work dir (SCALING_WORK_DIR, default
/dev/shm/bm25_scaling) holding index_c{cores}_z8 + its _transcripts
parquet from a prior tools/scaling.py run.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def memcpy_mbps() -> float:
    a = np.empty(3_000_000, dtype=np.float64)
    a[:] = 1.0
    t0 = time.time()
    for _ in range(4):
        a.copy()
    return round(4 * a.nbytes / (time.time() - t0) / 1e6, 0)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    cores = int(args[0]) if len(args) > 0 else 8
    rounds = int(args[1]) if len(args) > 1 else 3

    os.environ.setdefault("SPARK_DRIVER_MEM", f"{max(4 * cores, 8)}g")

    from bm25_pagerank_rpi_spark.plans.index_build import build_index
    from bm25_pagerank_rpi_spark.session import get_spark
    from bm25_pagerank_rpi_spark.sources.catalog import IndexCatalog

    base = os.environ.get("SCALING_WORK_DIR", "/dev/shm/bm25_scaling")
    idx = f"{base}/index_c{cores}_z8"
    corpus_dir = f"{idx}_transcripts"
    if not os.path.exists(corpus_dir):
        raise SystemExit(f"no prebuilt corpus at {corpus_dir}; run tools/scaling.py first")

    # --positions: time the with_positions postings stage instead (the
    # posexplode+collect_list plans vs the fused positions kernel). Runs
    # on a COPY of the index dir so the shared positions-less index the
    # scaling protocol reuses is never rewritten with a wider schema.
    positions = "--positions" in sys.argv
    if positions:
        import shutil

        idx_pos = f"{idx}_pos_ab"
        if not os.path.exists(idx_pos):
            shutil.copytree(idx, idx_pos)
        idx = idx_pos

    spark = get_spark("ab_postings", cores=cores)
    transcripts = spark.read.parquet(corpus_dir)
    cat = IndexCatalog(spark, idx)

    variants = ["string", "hashed", "fused"]
    obs: dict[str, list[tuple[float, float]]] = {v: [] for v in variants}

    def run_one(plan: str) -> None:
        m = cat.read_manifest()
        m["stages"].pop("postings", None)
        cat.write_manifest(m)
        probe = memcpy_mbps()
        build_index(
            spark, transcripts, idx, resume=True, term_keys=plan,
            with_positions=positions,
        )
        sec = cat.read_manifest()["stages"]["postings"]["seconds"]
        obs[plan].append((sec, probe))
        print(f"  {plan:7s} {sec:8.2f}s  (memcpy {probe:.0f} MB/s)", flush=True)

    # warm the JVM + Python workers on a throwaway observation (not scored)
    print("warmup:", flush=True)
    run_one("string")
    obs["string"].clear()

    for r in range(rounds):
        print(f"round {r + 1}/{rounds}:", flush=True)
        for v in variants:
            run_one(v)

    summary = {
        v: {
            "min_s": round(min(s for s, _ in obs[v]), 2),
            "all_s": [round(s, 2) for s, _ in obs[v]],
            "probes": [p for _, p in obs[v]],
        }
        for v in variants
    }
    print(json.dumps({
        "cores": cores, "rounds": rounds, "positions": positions,
        "postings_ab": summary,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
