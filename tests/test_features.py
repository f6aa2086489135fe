"""24-feature assembly (J2/J3/T3) and the S6 feature-log sink."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bm25_pagerank_rpi_spark.operators import features, pagerank, scorer


def _pipeline(spark):
    docs = spark.createDataFrame(
        [("d1", "spark hash join"), ("d2", "hash hash table"), ("d3", "unrelated words here")],
        "doc_id string, text string",
    )
    queries = spark.createDataFrame([("q1", "hash table")], "query_id string, text string")
    top = scorer.rank_documents(docs, queries, k=10)
    meta = spark.createDataFrame(
        [("d1", "c/0/user/none"), ("d2", "c/1/assistant/code"), ("d3", "c/2/user/none")],
        "doc_id string, url string",
    )
    nodes = spark.createDataFrame([("d1",), ("d2",), ("d3",)], "node string")
    edges = spark.createDataFrame([("d1", "d2"), ("d2", "d1"), ("d3", "d1")], "src string, dst string")
    prt = pagerank.pagerank_table(nodes, edges, iterations=5)
    return features.assemble(top, meta, prt)


def test_assemble_has_all_24_features(spark):
    out = _pipeline(spark)
    assert set(features.FEATURE_COLUMNS) <= set(out.columns)
    assert len(features.FEATURE_COLUMNS) == 24
    rows = {r.doc_id: r for r in out.collect()}
    # candidates are d1, d2 (contain query terms); d3 excluded
    assert set(rows) == {"d1", "d2"}
    r = rows["d2"]
    assert r.num_slashes_in_url == 3
    assert r.length_of_url == len("c/1/assistant/code")
    assert r.inlink_count == 1 and r.outlink_count == 1
    assert r.page_rank > 0.0
    assert r.covered_query_term_number == 2  # hash + table


def test_assemble_missing_pagerank_defaults_zero(spark):
    docs = spark.createDataFrame([("d1", "hash")], "doc_id string, text string")
    queries = spark.createDataFrame([("q1", "hash")], "query_id string, text string")
    top = scorer.rank_documents(docs, queries, k=10)
    meta = spark.createDataFrame([("d1", "u")], "doc_id string, url string")
    empty_pr = spark.createDataFrame(
        [], "node string, pagerank double, inlinks int, outlinks int"
    )
    r = features.assemble(top, meta, empty_pr).collect()[0]
    # reference logs the per-doc error and scores with zeros (ranker.go:40-42)
    assert r.page_rank == 0.0 and r.inlink_count == 0 and r.outlink_count == 0


def test_log_examples_sink_appends_partitioned(spark, tmp_path):
    out_dir = str(tmp_path / "feature_log")
    df = _pipeline(spark)
    features.log_examples(df, out_dir)
    features.log_examples(df, out_dir)  # second serve appends, never clobbers
    back = spark.read.parquet(out_dir)
    assert back.count() == 2 * df.count()
    assert back.filter(F.col("query_id") == "q1").count() == back.count()
    # partitioned by query_id on disk
    import os

    assert any(p.startswith("query_id=") for p in os.listdir(out_dir))


def test_save_features_csv_reference_header(spark, tmp_path):
    df = _pipeline(spark).withColumn("label", F.lit(1))
    out = str(tmp_path / "feat_csv")
    features.save_features_csv(df, out)
    import glob

    part = glob.glob(f"{out}/part-*.csv")[0]
    header = open(part).readline().strip().split(",")
    assert header == features.REFERENCE_CSV_HEADER
    back = spark.read.option("header", True).csv(out)
    assert back.count() == df.count()
