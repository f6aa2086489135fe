"""Drift-aware A/B of blocks-stage encode variants.

The shared host's memory bandwidth wanders by >10x day-long (see
BENCH/BASELINE.md host-drift protocol), so sequential phase timing is
meaningless across minutes. This tool interleaves the variants
round-robin and samples a single-core memcpy ceiling before every
observation, so each variant's time can be read against the window it
ran in; min-of-rounds per variant is the comparison number.

Variants (full blocks stage, noop sink — routing + shuffle [+ sort] +
encode, no write):
  sorted_pandas   repartition + JVM sortWithinPartitions + mapInPandas
  sorted_arrow    repartition + JVM sortWithinPartitions + mapInArrow
  unsorted_arrow  repartition only + dictionary-encode/lexsort in Python

Usage: python tools/ab_blocks.py [cores] [replicas] [rounds]
Requires the profile work dir built by tools/profile_blocks.py.
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
    dt = time.time() - t0
    return round(4 * a.nbytes / dt / 1e6, 0)


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    os.environ.setdefault("SPARK_DRIVER_MEM", f"{max(4 * cores, 8)}g")

    from pyspark.sql import functions as F

    from bm25_pagerank_rpi_spark import B, K1
    from bm25_pagerank_rpi_spark.plans import index_build
    from bm25_pagerank_rpi_spark.session import get_spark
    from bm25_pagerank_rpi_spark.sources.catalog import IndexCatalog

    spark = get_spark("ab_blocks", cores=cores)
    base = os.environ.get("SCALING_WORK_DIR", "/dev/shm/bm25_profile")
    cat = IndexCatalog(spark, f"{base}/idx_c{cores}_r{replicas}")
    cfg = cat.read_manifest()["config"]
    bs, rr, tdt = cfg["block_size"], cfg["range_rows"], cfg["tail_df_threshold"]
    bpr = rr // bs + 1
    _, avgdl = cat.scalar_stats()

    tfd, dl = F.col("tf").cast("double"), F.col("doc_length").cast("double")
    factor = (tfd * F.lit(K1 + 1.0)) / (
        tfd + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * (dl / F.lit(avgdl)))
    )
    ranged = index_build.with_range_routing(
        cat.postings().withColumn("factor", factor), rr, tdt
    ).select("term", "range_id", "doc_int", "tf", "factor")
    npart = max(spark.sparkContext.defaultParallelism * 2, 8)

    enc_pd = index_build._make_encode_partition_fn(bs, bpr)
    enc_ar = index_build._make_encode_arrow_fn(bs, bpr)
    enc_un = index_build._make_encode_unsorted_fn(bs, bpr)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(1 << 19))

    def run_sorted_pandas():
        (ranged.repartition(npart, "term", "range_id")
         .sortWithinPartitions("term", "range_id", "doc_int")
         .mapInPandas(enc_pd, schema=index_build.BLOCK_SCHEMA)
         .write.format("noop").mode("overwrite").save())

    def run_sorted_arrow():
        (ranged.repartition(npart, "term", "range_id")
         .sortWithinPartitions("term", "range_id", "doc_int")
         .mapInArrow(enc_ar, schema=index_build.BLOCK_SCHEMA)
         .write.format("noop").mode("overwrite").save())

    def run_unsorted_arrow():
        (ranged.repartition(npart * 2, "term", "range_id")
         .mapInArrow(enc_un, schema=index_build.BLOCK_SCHEMA)
         .write.format("noop").mode("overwrite").save())

    variants = {
        "sorted_pandas": run_sorted_pandas,
        "sorted_arrow": run_sorted_arrow,
        "unsorted_arrow": run_unsorted_arrow,
    }
    # warm-up all paths once (codegen, python workers)
    for fn in variants.values():
        fn()

    obs: dict[str, list] = {k: [] for k in variants}
    ceilings: list[float] = []
    for _ in range(rounds):
        for name, fn in variants.items():
            c = memcpy_mbps()
            ceilings.append(c)
            t0 = time.time()
            fn()
            obs[name].append(
                {"s": round(time.time() - t0, 3), "memcpy_mbps": c}
            )
    result = {
        "metric": "blocks_encode_ab",
        "cores": cores,
        "replicas": replicas,
        "npart": npart,
        "rounds": rounds,
        "observations": obs,
        "min_s": {k: min(o["s"] for o in v) for k, v in obs.items()},
        "memcpy_mbps_range": [min(ceilings), max(ceilings)],
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
