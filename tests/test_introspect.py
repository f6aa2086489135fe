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
