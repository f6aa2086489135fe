"""Federated search over multiple independent index catalogs.

Lucene's MultiReader / Elasticsearch's multi-shard query semantics: N
segments built independently (each with its own doc_int space, manifest,
tombstones) are queried TOGETHER without running plans/index_merge.py —
and the scores must be identical to a single merged index, which demands
global statistic reconciliation:

- df(term)   = distinct docs holding the term across ALL segments
  (falls out of computing idf over the UNION of pruned postings);
- doc_count  = sum of per-segment live doc counts;
- avgdl      = doc-count-weighted mean of per-segment averages.

Per-segment doc_ints collide across independently built catalogs, so
candidate rows are keyed by a synthetic '<segment>:<doc_int>' string and
mapped back to real doc_ids through each segment's doc_meta AFTER top-k
truncation (k rows per segment join, not corpus-sized).

Plan shape: each segment contributes one partition-pruned postings scan
(query buckets only, tombstones anti-joined inside pruned_postings);
everything downstream is the unchanged exact scorer. This is the
query-time half of the segment lifecycle — serve new segments the moment
they land, run the expensive merge (plans/index_merge.py) in the
background, swap, repeat. Reference analogy: the S1 posting-fetch
contract (/root/reference/internal/ranking/data_getters.go:17-40) served
by many index shards at once.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import MAX_DOCUMENTS
from . import scorer
from .query_exact import pruned_postings


def federated_stats(cats: list) -> DataFrame:
    """1-row (doc_count, avg_doc_length) reconciled across segments."""
    u = reduce(
        lambda a, b: a.unionByName(b), [c.corpus_stats() for c in cats]
    )
    return u.agg(
        F.sum("doc_count").alias("doc_count"),
        (
            F.sum(F.col("doc_count") * F.col("avg_doc_length"))
            / F.sum("doc_count")
        ).alias("avg_doc_length"),
    )


def federated_rank(
    cats: list, queries: DataFrame, k: int = MAX_DOCUMENTS
) -> DataFrame:
    """(query_id, doc_id, bm25, rank) over N unmerged catalogs —
    score-identical to querying their merged union."""
    posts = []
    metas = []
    for i, cat in enumerate(cats):
        key = F.concat_ws(":", F.lit(str(i)), F.col("doc_int"))
        posts.append(
            pruned_postings(cat, queries).select(
                "term", key.alias("doc_key"), "tf", "doc_length"
            )
        )
        metas.append(
            cat.doc_meta().select(key.alias("doc_key"), "doc_id")
        )
    post = reduce(lambda a, b: a.unionByName(b), posts)
    doc_tf = post.select("term", F.col("doc_key").alias("doc_id"), "tf")
    doc_len = post.select(
        F.col("doc_key").alias("doc_id"), "doc_length"
    ).distinct()
    scored = scorer.score_candidates(
        doc_tf, doc_len, federated_stats(cats), queries
    )
    top = scorer.topk(scored, k).withColumnRenamed("doc_id", "doc_key")
    meta = reduce(lambda a, b: a.unionByName(b), metas)
    return top.join(meta, "doc_key").select(
        "query_id", "doc_id", "bm25", "rank"
    )
