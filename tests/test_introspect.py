"""term_vectors / index_stats (operators/introspect.py): the
Lucene/ES-style read APIs over the posting contract
(/root/reference/internal/ranking/types.go:92-96,
data_getters.go:115-144)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bm25_pagerank_rpi_spark.operators import introspect

DOCS = [
    (1, "a b a c"),
    (2, "b b d"),
    (3, ""),
    (4, "a d d d"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_term_vectors_local_stats(docs):
    rows = {
        (r.doc_id, r.term): r
        for r in introspect.term_vectors(docs, [1, 2]).collect()
    }
    assert rows[(1, "a")].tf == 2
    assert rows[(1, "a")].positions == [0, 2]
    assert rows[(1, "b")].positions == [1]
    assert rows[(2, "b")].tf == 2
    # doc 4 not requested
    assert not any(d == 4 for d, _ in rows)


def test_term_vectors_corpus_stats(docs):
    rows = {
        (r.doc_id, r.term): r
        for r in introspect.term_vectors(docs, [1]).collect()
    }
    # df/ttf are corpus-wide even though only doc 1 was requested
    assert rows[(1, "a")].df == 2  # docs 1 and 4
    assert rows[(1, "a")].ttf == 3  # 2 in doc 1 + 1 in doc 4
    assert rows[(1, "b")].df == 2  # docs 1 and 2
    assert rows[(1, "b")].ttf == 3
    assert rows[(1, "c")].df == 1
    # terms absent from requested docs (d) are not reported
    assert (1, "d") not in rows


def test_term_vectors_empty_request_raises(docs):
    with pytest.raises(ValueError):
        introspect.term_vectors(docs, [])


def test_index_stats(docs):
    row = introspect.index_stats(docs).collect()[0]
    assert row.doc_count == 4
    assert row.empty_docs == 1
    assert row.total_tokens == 11
    assert row.distinct_terms == 4
    assert row.avg_doc_length == 11 / 4
    assert row.max_doc_length == 4
    assert row.max_tf == 3  # 'd' x3 in doc 4


# ---------------------------------------------------------------------------
# forward index + indexed twins (build_forward_index,
# term_vectors_from_index, index_stats_from_index)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def built_fwd(spark, tmp_path_factory):
    from bm25_pagerank_rpi_spark.plans.index_build import (
        build_forward_index,
        build_index,
    )

    rows = [
        ("conv_0", 0, "user", "a b a c", "none"),
        ("conv_0", 1, "assistant", "b b d", "search"),
        ("conv_1", 0, "user", "", "none"),
        ("conv_1", 1, "assistant", "a d d d", "code"),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    ).withColumn("ts", F.lit("2025-01-01 00:00:00").cast("timestamp"))
    out = str(tmp_path_factory.mktemp("fwd_index"))
    cat = build_index(spark, t, out, n_buckets=4, with_positions=True)
    return build_forward_index(cat, n_doc_buckets=2)


def test_forward_index_matches_raw_term_vectors(built_fwd, docs, spark):
    got = {
        (r.doc_id, r.term): r
        for r in introspect.term_vectors_from_index(
            built_fwd, ["conv_0:0", "conv_0:1"]
        ).collect()
    }
    # same corpus as the DOCS fixture: doc 1 = conv_0:0, doc 2 = conv_0:1
    raw = {
        (r.doc_id, r.term): r
        for r in introspect.term_vectors(docs, [1, 2]).collect()
    }
    assert {(1 if d == "conv_0:0" else 2, t) for d, t in got} == set(raw)
    for (d, t), r in got.items():
        rr = raw[(1 if d == "conv_0:0" else 2, t)]
        assert (r.tf, r.df, r.ttf) == (rr.tf, rr.df, rr.ttf), (d, t)
        assert list(r.positions) == list(rr.positions), (d, t)


def test_forward_index_resume_and_partitioning(built_fwd):
    import os

    from bm25_pagerank_rpi_spark.plans.index_build import build_forward_index

    # resume: second call is a no-op (manifest already records the stage)
    st = built_fwd.read_manifest()["stages"]["term_vectors"]
    build_forward_index(built_fwd, n_doc_buckets=2)
    assert built_fwd.read_manifest()["stages"]["term_vectors"] == st
    # partitioned layout on disk: doc_bucket=0/1 directories
    root = built_fwd.path("term_vectors")
    assert sorted(
        d for d in os.listdir(root) if d.startswith("doc_bucket=")
    ) == ["doc_bucket=0", "doc_bucket=1"]


def test_index_stats_from_index_matches_raw(built_fwd, docs):
    raw = introspect.index_stats(docs).collect()[0]
    idx = introspect.index_stats_from_index(built_fwd).collect()[0]
    assert idx.doc_count == raw.doc_count
    assert idx.empty_docs == raw.empty_docs
    assert idx.total_tokens == raw.total_tokens
    assert idx.distinct_terms == raw.distinct_terms
    assert idx.avg_doc_length == raw.avg_doc_length
    assert idx.max_doc_length == raw.max_doc_length
    assert idx.max_tf == raw.max_tf


def test_term_vectors_from_index_validates(built_fwd):
    with pytest.raises(ValueError):
        introspect.term_vectors_from_index(built_fwd, [])
    # unknown doc ids -> empty result, stable schema
    got = introspect.term_vectors_from_index(built_fwd, ["conv_9:9"])
    assert got.count() == 0
