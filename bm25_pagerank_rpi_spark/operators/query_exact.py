"""Exact top-k over a built index catalog — the oracle-checkable query path.

Same scoring relations as operators/scorer.py, but reading the persisted
index tables instead of re-deriving them from raw text, with term-bucket
partition pruning on the postings scan (SURVEY.md §4: "only fetch postings
for query terms" becomes partition pruning + predicate pushdown).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import MAX_DOCUMENTS
from ..sources.catalog import IndexCatalog, term_bucket
from . import scorer


def _query_buckets(cat: IndexCatalog, queries: DataFrame, n_buckets: int) -> tuple[DataFrame, list[int]]:
    """Distinct query terms + the bucket ids they hash to (for pruning)."""
    qterms = scorer.query_term_occurrences(queries).select("term").distinct()
    rows = qterms.withColumn("bucket", term_bucket("term", n_buckets)).collect()
    return qterms, sorted({r.bucket for r in rows})


def pruned_postings(cat: IndexCatalog, queries: DataFrame) -> DataFrame:
    """Postings restricted to the query's terms: partition pruning on
    ``bucket`` (a filter on the parquet partition column) + term predicate
    pushdown, then a broadcast semi-join for exactness."""
    n_buckets = int(cat.read_manifest()["config"]["n_buckets"])
    qterms, buckets = _query_buckets(cat, queries, n_buckets)
    post = cat.postings().filter(F.col("bucket").isin(buckets))
    post = post.join(F.broadcast(qterms), "term")
    # tombstone masking (Lucene-style deletes, sources/catalog.py): a
    # broadcast anti-join on the bounded deletes table; no-op (and no
    # extra scan) when the manifest records zero live tombstones
    if cat.n_deletes():
        post = post.join(F.broadcast(cat.deletes()), "doc_int", "left_anti")
    return post


def rank_from_index(
    cat: IndexCatalog,
    queries: DataFrame,
    k: int = MAX_DOCUMENTS,
    with_meta: bool = False,
) -> DataFrame:
    """(query_id, doc_id, bm25, rank [, url features]) — exact path."""
    # pruned postings feed three consumers in score_candidates; persist so
    # the pruned scan + broadcast semi-join run once
    post = pruned_postings(cat, queries).persist()
    doc_tf = post.select("term", F.col("doc_int").alias("doc_id"), "tf")
    # doc lengths for candidate docs come off the pruned postings — no
    # join against the full doc_meta table before truncation
    doc_len = post.select(F.col("doc_int").alias("doc_id"), "doc_length").distinct()
    stats = cat.corpus_stats()
    scored = scorer.score_candidates(doc_tf, doc_len, stats, queries)
    top = scorer.topk(scored, k).withColumnRenamed("doc_id", "doc_int")
    meta_cols = ["doc_int", "doc_id"] + (["url"] if with_meta else [])
    meta = cat.doc_meta().select(*meta_cols)
    out = top.join(meta, "doc_int")
    if with_meta:
        out = out.withColumn(
            "num_slashes_in_url",
            (F.length("url") - F.length(F.replace(F.col("url"), F.lit("/"), F.lit("")))).cast("int"),
        ).withColumn("length_of_url", F.octet_length("url"))
    # k rows per query — materialize eagerly so the pruned-postings cache is
    # released per call instead of accumulating across a serving session
    out = out.localCheckpoint(eager=True)
    post.unpersist()
    return out
