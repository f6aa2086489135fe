"""Segment merge (plans/index_merge.py): a merge of independently built
shard catalogs must be query-indistinguishable from a from-scratch build
of the union corpus — exact BM25 parity, recomputed df/idf, tombstones
purged. Lucene merge semantics over the S1 posting contract
(/root/reference/internal/ranking/data_getters.go:17-40)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from bm25_pagerank_rpi_spark.operators import query_exact, wand
from bm25_pagerank_rpi_spark.plans.index_build import build_index
from bm25_pagerank_rpi_spark.plans.index_merge import merge_catalogs
from bm25_pagerank_rpi_spark.streaming.deletes import delete_docs

ROWS = [
    ("c0", 0, "spark hash join table"),
    ("c0", 1, "merge sort join window"),
    ("c1", 0, "hash hash table scan"),
    ("c1", 1, "table table table spark scan extra"),
    ("c2", 0, "window filter key value merge"),
    ("c2", 1, "spark table key value"),
    ("c3", 0, "join join join hash"),
    ("c3", 1, "scan filter window sort"),
]


def _transcripts(spark, rows):
    return spark.createDataFrame(
        [
            (c, t, "user", text, "none", datetime.datetime(2025, 1, 1))
            for (c, t, text) in rows
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


def _queries(spark):
    return spark.createDataFrame(
        [("q1", "hash table spark"), ("q2", "merge window")],
        "query_id string, text string",
    )


def _topk(cat, spark, k=10):
    return {
        (r.query_id, r.doc_id): round(r.bm25, 9)
        for r in query_exact.rank_from_index(
            cat, _queries(spark), k=k
        ).collect()
    }


def test_merge_matches_fresh_build(spark, tmp_path):
    halves = [ROWS[0::2], ROWS[1::2]]
    cats = [
        build_index(
            spark, _transcripts(spark, h), str(tmp_path / f"shard{i}"),
            n_buckets=4,
        )
        for i, h in enumerate(halves)
    ]
    merged = merge_catalogs(spark, cats, str(tmp_path / "merged"))
    full = build_index(
        spark, _transcripts(spark, ROWS), str(tmp_path / "full"), n_buckets=4
    )

    # corpus stats recomputed over the union
    assert merged.scalar_stats() == full.scalar_stats()

    # per-term stats identical to a from-scratch build
    m_terms = {
        r.term: (r.df, round(r.idf, 9), round(r.max_factor, 9))
        for r in merged.terms().collect()
    }
    f_terms = {
        r.term: (r.df, round(r.idf, 9), round(r.max_factor, 9))
        for r in full.terms().collect()
    }
    assert m_terms == f_terms

    # exact BM25 parity, both exact-from-index and WAND paths
    assert _topk(merged, spark) == _topk(full, spark)
    got_w = {
        (r.query_id, r.doc_id): round(r.bm25, 9)
        for r in wand.wand_topk(merged, _queries(spark), k=10).collect()
    }
    assert got_w == _topk(full, spark)

    # resume: same inputs -> no re-merge (manifest fingerprint short-circuit)
    again = merge_catalogs(spark, cats, str(tmp_path / "merged"))
    assert again.read_manifest()["merged_from"] == [c.root for c in cats]


def test_merge_purges_tombstones(spark, tmp_path):
    halves = [ROWS[0::2], ROWS[1::2]]
    cats = [
        build_index(
            spark, _transcripts(spark, h), str(tmp_path / f"s{i}"),
            n_buckets=4,
        )
        for i, h in enumerate(halves)
    ]
    # tombstone one doc in shard 0 ("c1:0" is ROWS[2] -> shard 0)
    assert delete_docs(cats[0], ["c1:0"]) == 1
    merged = merge_catalogs(spark, cats, str(tmp_path / "m"))

    live = ROWS[:2] + ROWS[3:]
    full = build_index(
        spark, _transcripts(spark, live), str(tmp_path / "f"), n_buckets=4
    )
    assert merged.scalar_stats() == full.scalar_stats()
    assert merged.n_deletes() == 0
    assert (
        merged.doc_meta().filter(F.col("doc_id") == "c1:0").count() == 0
    )
    assert _topk(merged, spark) == _topk(full, spark)


def test_merge_rejects_overlapping_shards(spark, tmp_path):
    a = build_index(
        spark, _transcripts(spark, ROWS[:4]), str(tmp_path / "a"), n_buckets=4
    )
    b = build_index(
        spark, _transcripts(spark, ROWS[2:]), str(tmp_path / "b"), n_buckets=4
    )
    with pytest.raises(ValueError, match="share doc_ids"):
        merge_catalogs(spark, [a, b], str(tmp_path / "ab"))


# ---------------------------------------------------------------------------
# federated (unmerged multi-segment) search — operators/federated.py
# ---------------------------------------------------------------------------


def test_federated_matches_fresh_union_build(spark, tmp_path):
    from bm25_pagerank_rpi_spark.operators.federated import federated_rank

    halves = [ROWS[0::2], ROWS[1::2]]
    cats = [
        build_index(
            spark, _transcripts(spark, h), str(tmp_path / f"fshard{i}"),
            n_buckets=4,
        )
        for i, h in enumerate(halves)
    ]
    union_cat = build_index(
        spark, _transcripts(spark, ROWS), str(tmp_path / "funion"), n_buckets=4
    )
    fed = {
        (r.query_id, r.doc_id): round(r.bm25, 9)
        for r in federated_rank(cats, _queries(spark), k=10).collect()
    }
    assert fed == _topk(union_cat, spark)


def test_federated_single_catalog_equals_direct(spark, tmp_path):
    from bm25_pagerank_rpi_spark.operators.federated import federated_rank

    cat = build_index(
        spark, _transcripts(spark, ROWS), str(tmp_path / "fsolo"), n_buckets=4
    )
    fed = {
        (r.query_id, r.doc_id): round(r.bm25, 9)
        for r in federated_rank([cat], _queries(spark), k=10).collect()
    }
    assert fed == _topk(cat, spark)


def test_federated_respects_segment_tombstones(spark, tmp_path):
    from bm25_pagerank_rpi_spark.operators.federated import federated_rank

    halves = [ROWS[0::2], ROWS[1::2]]
    cats = [
        build_index(
            spark, _transcripts(spark, h), str(tmp_path / f"fdel{i}"),
            n_buckets=4,
        )
        for i, h in enumerate(halves)
    ]
    delete_docs(cats[1], ["c1:1"])  # the table-heavy doc lives in shard 1
    fed = {
        r.doc_id
        for r in federated_rank(cats, _queries(spark), k=10).collect()
    }
    assert "c1:1" not in fed
    assert "c1:0" in fed
