"""spark-submit entry point: build the inverted index over a transcript
parquet table and answer one BM25 top-k query — the north_rule's
deployment shape (``spark-submit --py-files <pkg.zip> tools/submit_job.py``).

The script imports the engine ONLY from the --py-files zip (it is not
run from the repo checkout on a cluster), creates no SparkSession config
of its own beyond what spark-submit provides, and prints one JSON line.

Usage:
  spark-submit [--master ...] --py-files dist/bm25_pagerank_rpi_spark.zip \
      tools/submit_job.py <transcripts_parquet> <index_dir> [query_text] [k]
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    transcripts_path = sys.argv[1]
    index_dir = sys.argv[2]
    query_text = sys.argv[3] if len(sys.argv) > 3 else "hash join table"
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    from pyspark.sql import SparkSession

    # spark-submit owns master/deploy config; the app only names itself
    spark = SparkSession.builder.appName("bm25_index_build_submit").getOrCreate()

    from bm25_pagerank_rpi_spark.operators import wand
    from bm25_pagerank_rpi_spark.plans.index_build import build_index

    t = spark.read.parquet(transcripts_path)
    t0 = time.time()
    cat = build_index(spark, t, index_dir)
    build_s = time.time() - t0

    queries = spark.createDataFrame(
        [("q1", query_text)], "query_id string, text string"
    )
    top = wand.wand_topk(cat, queries, k=k).orderBy("rank").collect()
    n_turns = t.count()
    print(
        json.dumps(
            {
                "turns": n_turns,
                "build_seconds": round(build_s, 3),
                "turns_per_sec": round(n_turns / build_s, 1),
                "query": query_text,
                "topk": [
                    {"rank": r.rank, "doc_id": r.doc_id, "bm25": round(r.bm25, 6)}
                    for r in top
                ],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
