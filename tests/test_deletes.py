"""Deletion / update (tombstone) semantics over a live index catalog.

Pinned contract (streaming/deletes.py):
- a tombstoned doc disappears from EVERY query path immediately (WAND,
  exact-from-index, positional phrase);
- between delete and compaction, surviving docs' WAND scores are
  UNCHANGED (frozen encode-time factors + df — the Lucene model), while
  the exact-from-index path recomputes live-truth BM25;
- compaction purges: the catalog becomes bit-identical in scores to a
  from-scratch build of the live corpus, and the tombstone table clears;
- update_docs replaces a turn's text atomically from the query side's
  point of view (old text unfindable, new text findable);
- a WandSession snapshot masks deletes from session open / refresh.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bm25_pagerank_rpi_spark.operators import query_exact, wand
from bm25_pagerank_rpi_spark.operators.phrase import phrase_topk_from_index
from bm25_pagerank_rpi_spark.plans.index_build import build_index
from bm25_pagerank_rpi_spark.streaming import deletes as dels
from bm25_pagerank_rpi_spark.streaming.incremental import compact
from tests.test_index_build import transcripts_df

CORPUS = {
    "c0:0": "spark hash join table",
    "c0:1": "merge sort join window",
    "c1:0": "hash hash table scan",
    "c1:1": "table table table spark scan extra",
    "c2:0": "window filter key value merge",
    "c2:1": "spark table probe build",
    "c3:0": "join table hash spark probe",
}


def _build(spark, corpus, path, **kw):
    kw.setdefault("n_buckets", 4)
    kw.setdefault("block_size", 4)
    kw.setdefault("range_rows", 8)
    return build_index(spark, transcripts_df(spark, corpus), str(path), **kw)


def _queries(spark):
    return spark.createDataFrame(
        [("q1", "hash table spark")], "query_id string, text string"
    )


def _wand_rows(cat, spark, k=10):
    return {
        r.doc_id: r.bm25
        for r in wand.wand_topk(cat, _queries(spark), k=k).collect()
    }


def test_delete_masks_all_query_paths(spark, tmp_path):
    cat = _build(spark, CORPUS, tmp_path / "idx", with_positions=True)
    before = _wand_rows(cat, spark)
    assert "c1:1" in before and "c0:0" in before

    n = dels.delete_docs(cat, ["c1:1", "c0:0", "nope:9"])
    assert n == 2
    # idempotent: second call adds nothing
    assert dels.delete_docs(cat, ["c1:1"]) == 0
    assert cat.n_deletes() == 2

    after_w = _wand_rows(cat, spark)
    assert "c1:1" not in after_w and "c0:0" not in after_w
    # frozen-factor model: survivors' WAND scores unchanged pre-compaction
    for d, s in after_w.items():
        assert s == pytest.approx(before[d], abs=1e-12)

    exact = {
        r.doc_id
        for r in query_exact.rank_from_index(cat, _queries(spark)).collect()
    }
    assert "c1:1" not in exact and "c0:0" not in exact

    ph = {r.doc_id for r in phrase_topk_from_index(cat, ["hash", "table"]).collect()}
    assert "c1:0" in ph  # "hash hash table scan" still matches
    assert "c1:1" not in ph and "c0:0" not in ph

    # live corpus stats shrank with the deletion
    n_docs, _ = cat.scalar_stats()
    assert n_docs == len(CORPUS) - 2


def test_compact_purges_to_fresh_build_parity(spark, tmp_path):
    cat = _build(spark, CORPUS, tmp_path / "idx")
    dels.delete_docs(cat, ["c1:1", "c2:0"])
    compact(cat)
    assert cat.n_deletes() == 0
    # physical purge: no tombstoned rows remain anywhere
    live = {r.doc_id for r in cat.doc_meta().select("doc_id").collect()}
    assert "c1:1" not in live and "c2:0" not in live
    gone_ints = cat.postings().join(
        cat.doc_meta().select("doc_int"), "doc_int", "left_anti"
    )
    assert gone_ints.count() == 0

    reduced = {k: v for k, v in CORPUS.items() if k not in ("c1:1", "c2:0")}
    fresh = _build(spark, reduced, tmp_path / "fresh")
    got = _wand_rows(cat, spark)
    want = _wand_rows(fresh, spark)
    assert got.keys() == want.keys()
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-12)


def test_delete_where_predicate(spark, tmp_path):
    cat = _build(spark, CORPUS, tmp_path / "idx")
    n = dels.delete_where(cat, F.col("conv_id") == "c1")
    assert n == 2
    left = _wand_rows(cat, spark)
    assert not any(d.startswith("c1:") for d in left)


def test_update_docs_replaces_text(spark, tmp_path):
    cat = _build(spark, CORPUS, tmp_path / "idx")
    new_rows = {"c0:0": "zebra quagga unique"}
    batch = transcripts_df(spark, new_rows)
    n = dels.update_docs(cat, batch)
    assert n == 1
    zq = spark.createDataFrame(
        [("qz", "zebra quagga")], "query_id string, text string"
    )
    hit = {r.doc_id for r in wand.wand_topk(cat, zq).collect()}
    assert hit == {"c0:0"}
    # the stale version no longer answers its old terms
    old = _wand_rows(cat, spark)
    assert "c0:0" not in old
    # exactly one live version in metadata
    assert cat.live_doc_meta().filter(F.col("doc_id") == "c0:0").count() == 1


def test_update_after_compact_matches_fresh(spark, tmp_path):
    cat = _build(spark, CORPUS, tmp_path / "idx")
    batch = transcripts_df(spark, {"c0:0": "spark spark table join"})
    dels.update_docs(cat, batch)
    compact(cat)
    updated = dict(CORPUS, **{"c0:0": "spark spark table join"})
    fresh = _build(spark, updated, tmp_path / "fresh")
    got, want = _wand_rows(cat, spark), _wand_rows(fresh, spark)
    assert got.keys() == want.keys()
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-12)


def test_delete_everything(spark, tmp_path):
    cat = _build(spark, CORPUS, tmp_path / "idx")
    n = dels.delete_docs(cat, list(CORPUS))
    assert n == len(CORPUS)
    assert wand.wand_topk(cat, _queries(spark)).count() == 0
    assert query_exact.rank_from_index(cat, _queries(spark)).count() == 0
    n_docs, avgdl = cat.scalar_stats()
    assert n_docs == 0 and avgdl == 0.0


def test_wand_session_delete_snapshot(spark, tmp_path):
    cat = _build(spark, CORPUS, tmp_path / "idx")
    with wand.WandSession(cat, preload_blocks=False) as s:
        assert "c1:1" in {r.doc_id for r in s.topk_text("q1", "table spark").collect()}
        dels.delete_docs(cat, ["c1:1"])
        # session snapshot: still visible until refresh
        assert "c1:1" in {r.doc_id for r in s.topk_text("q1", "table spark").collect()}
        s.refresh_deletes()
        assert "c1:1" not in {r.doc_id for r in s.topk_text("q1", "table spark").collect()}
