"""Index-introspection APIs: per-document term vectors and corpus/index
statistics.

Lucene/Elasticsearch expose both as first-class read APIs
(``_termvectors``, ``_stats``); the reference exposes the same data
implicitly through its posting + metadata contracts
(/root/reference/internal/ranking/types.go:92-96 carries tf + positions
per posting, data_getters.go:115-144 the corpus statistics) — these
operators surface them as queryable relations instead of internal
structs.

Scale shape (both): ``term_vectors`` prunes the corpus scan to the
requested documents FIRST (an ``isin`` predicate that reaches the
parquet scan), so the expensive posexplode runs over a handful of rows;
the corpus-wide df/ttf statistics are computed over a token stream
pre-filtered to the requested docs' term set via one broadcast
semi-join — the full corpus is scanned once but only matching terms
survive to the (term)-keyed hash agg, so the exchange is vocabulary-of-
the-request sized, not corpus sized. ``index_stats`` is two hash aggs
(doc-level, term-level) reduced to 1-row frames and broadcast-joined —
the same shape as S4 corpus stats, and the term agg's map-side partial
collapses within-partition repeats before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col
from . import scorer


def term_vectors(
    docs: DataFrame,
    doc_ids: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, tf, positions, df, ttf) — the Elasticsearch
    ``_termvectors?term_statistics=true`` contract: for every term of
    every requested document, its within-doc frequency and 0-based
    positions plus the corpus-wide document frequency (df) and total
    term frequency (ttf).

    The per-doc half IS the reference posting contract
    (types.go:92-96: Frequency + documentIndex positions) restricted to
    the requested docs; the corpus half is the S1/S4 statistics join
    (data_getters.go:17-40,115-144) keyed by the requested docs' terms.

    ``positions`` is returned as the native array<int>; callers needing
    an engine-portable encoding (the driver pair) string-join it.
    """
    if not doc_ids:
        raise ValueError("term_vectors requires at least one doc_id")
    wanted = docs.filter(F.col(id_col).isin(list(doc_ids)))
    local = scorer.doc_term_positions(wanted, id_col, text_col)

    # Corpus statistics for exactly the requested docs' terms: broadcast
    # the (small) term set, filter the corpus token stream before the agg.
    term_set = local.select("term").distinct()
    occ = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens_col(text_col)).alias("term")
    ).join(F.broadcast(term_set), "term")
    stats = occ.groupBy("term").agg(
        F.countDistinct("doc_id").cast("int").alias("df"),
        F.count(F.lit(1)).cast("long").alias("ttf"),
    )
    return local.join(F.broadcast(stats), "term").select(
        "doc_id", "term", "tf", "positions", "df", "ttf"
    )


def index_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """1-row (doc_count, empty_docs, total_tokens, distinct_terms,
    avg_doc_length, max_doc_length, max_tf) — the ``_stats`` /
    CheckIndex-style corpus summary an operator console reads before
    sizing shards, caches, and WAND planning mode
    (operators/wand.py flips on vocab size using exactly the
    distinct_terms figure this op reports).

    Two independent single-pass hash aggs (doc-level lengths, term-level
    tf) reduced to 1-row frames and crossJoin-broadcast together —
    no corpus-sized exchange anywhere; the term agg shuffles one row
    per distinct (doc_id, term) after map-side partial aggregation.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("toks")
    )
    doc_side = toks.select(F.size("toks").alias("dl")).agg(
        F.count(F.lit(1)).alias("doc_count"),
        F.sum(F.when(F.col("dl") == 0, 1).otherwise(0)).alias("empty_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
        F.avg("dl").alias("avg_doc_length"),
        F.max("dl").alias("max_doc_length"),
    )
    term_side = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .agg(
            F.countDistinct("term").alias("distinct_terms"),
            F.max("tf").cast("int").alias("max_tf"),
        )
    )
    return doc_side.crossJoin(F.broadcast(term_side)).select(
        "doc_count",
        "empty_docs",
        "total_tokens",
        "distinct_terms",
        "avg_doc_length",
        "max_doc_length",
        "max_tf",
    )


def term_vectors_from_index(cat, doc_ids: list[str]) -> DataFrame:
    """(doc_id, term, tf[, positions], df, ttf) — the indexed serving
    path of term_vectors: reads the forward ``term_vectors`` table
    (plans.index_build.build_forward_index) partition-pruned to the
    requested docs' buckets, df from the persisted terms table, ttf from
    a term-bucket-pruned postings aggregation. NO corpus rescan — the
    raw-path version re-tokenizes the whole corpus for its statistics;
    this one touches request-sized partitions plus the needed terms'
    postings only.

    Planning state collected on the driver is bounded by the request:
    the requested docs' doc_ints (≤ len(doc_ids)) and the needed terms'
    bucket ids (≤ index n_buckets). Lucene parity note: like Lucene's
    docFreq, df/ttf come from the live segment statistics and do NOT
    subtract tombstoned docs (deletes only mask requested rows here;
    stats refresh at merge/compaction)."""
    if not doc_ids:
        raise ValueError("term_vectors_from_index requires at least one doc_id")
    mf = cat.read_manifest()
    n_doc_buckets = int(
        mf["stages"]["term_vectors"]["metrics"]["n_doc_buckets"]
    )
    meta = (
        cat.doc_meta()
        .filter(F.col("doc_id").isin(list(doc_ids)))
        .select("doc_id", "doc_int")
    )
    # bounded planning collect: one row per requested doc
    ints = [r.doc_int for r in meta.collect()]
    if not ints:
        return cat.spark.createDataFrame(
            [], "doc_id string, term string, tf int, df int, ttf long"
        )
    dbuckets = sorted({i % n_doc_buckets for i in ints})
    fwd = cat.read("term_vectors").filter(
        F.col("doc_bucket").isin(dbuckets) & F.col("doc_int").isin(ints)
    )
    if cat.n_deletes():
        fwd = fwd.join(F.broadcast(cat.deletes()), "doc_int", "left_anti")
    needed = fwd.select("term").distinct()
    tinfo = (
        cat.terms()
        .join(F.broadcast(needed), "term")
        .select("term", F.col("df").cast("int").alias("df"), "bucket")
    )
    # bounded planning collect: needed terms' bucket ids (≤ n_buckets)
    tbuckets = sorted(
        r.bucket for r in tinfo.select("bucket").distinct().collect()
    )
    post = (
        cat.postings()
        .filter(F.col("bucket").isin(tbuckets))
        .join(F.broadcast(needed), "term")
    )
    ttf = post.groupBy("term").agg(F.sum("tf").cast("long").alias("ttf"))
    out_cols = ["doc_id", "term", "tf"]
    if "positions" in fwd.columns:
        out_cols.append("positions")
    out_cols += ["df", "ttf"]
    return (
        fwd.join(F.broadcast(meta), "doc_int")
        .join(F.broadcast(tinfo.select("term", "df")), "term")
        .join(F.broadcast(ttf), "term")
        .select(*out_cols)
    )


def index_stats_from_index(cat) -> DataFrame:
    """1-row (doc_count, empty_docs, total_tokens, distinct_terms,
    avg_doc_length, max_doc_length, max_tf) — index_stats served from
    the catalog's persisted tables instead of a corpus rescan:
    doc-level figures from doc_meta (a metadata-sized scan of one int
    column), distinct_terms = |terms| (the vocabulary table), max_tf
    from a single-column columnar postings scan. The raw-path twin
    re-tokenizes every document; this touches zero text."""
    doc_side = cat.doc_meta().select("doc_length").agg(
        F.count(F.lit(1)).alias("doc_count"),
        F.sum(F.when(F.col("doc_length") == 0, 1).otherwise(0)).alias("empty_docs"),
        F.sum("doc_length").cast("long").alias("total_tokens"),
        F.avg("doc_length").alias("avg_doc_length"),
        F.max("doc_length").alias("max_doc_length"),
    )
    term_side = cat.terms().agg(F.count(F.lit(1)).alias("distinct_terms"))
    tf_side = cat.postings().agg(F.max("tf").cast("int").alias("max_tf"))
    return (
        doc_side.crossJoin(F.broadcast(term_side))
        .crossJoin(F.broadcast(tf_side))
        .select(
            "doc_count",
            "empty_docs",
            "total_tokens",
            "distinct_terms",
            "avg_doc_length",
            "max_doc_length",
            "max_tf",
        )
    )
