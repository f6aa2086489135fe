"""Full 24-dimensional LTR feature vector (reference types.go:50-89) and
the feature-log sink (S6).

The scorer (operators/scorer.py) produces the 19 index-derived features;
this module adds the metadata-derived five:

  num_slashes_in_url, length_of_url   — T3 (features.go:193-197):
      slash count and BYTE length of the URL (Go ``len`` is bytes).
  inlink_count, outlink_count, page_rank — J3 (features.go:246-253),
      joined from the native PageRank table (operators/pagerank.py).

Join order is the architectural win over the reference: its
initializeFeatures does one metadata RPC + one PageRank RPC PER DOCUMENT
(features.go:263-271, the N+1 anti-pattern); here both are bulk joins,
and they run AFTER top-k truncation because ranking sorts on BM25 alone
(ranker.go:44-51) — so at scale the joins see k<=1000 rows per query,
not the candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_COLUMNS = [
    # covered-term block (A8)
    "covered_query_term_number", "covered_query_term_ratio",
    # TF stats (A4)
    "sum_tf", "min_tf", "max_tf", "mean_tf", "var_tf",
    # stream length + normalized TF stats (A5)
    "stream_length", "sum_ntf", "min_ntf", "max_ntf", "mean_ntf", "var_ntf",
    # TF-IDF stats (A6)
    "sum_tfidf", "min_tfidf", "max_tfidf", "mean_tfidf", "var_tfidf",
    # BM25 (A7)
    "bm25",
    # URL (T3)
    "num_slashes_in_url", "length_of_url",
    # link analysis (J3/S5)
    "inlink_count", "outlink_count", "page_rank",
]


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append T3's two URL features. Pure string expressions — codegen'd."""
    u = F.col(url_col)
    return df.withColumn(
        "num_slashes_in_url",
        (F.length(u) - F.length(F.replace(u, F.lit("/"), F.lit("")))).cast("int"),
    ).withColumn("length_of_url", F.octet_length(u).cast("int"))


def assemble(
    scored: DataFrame,
    doc_meta: DataFrame,
    pagerank_table: DataFrame,
) -> DataFrame:
    """scored (scorer.score_candidates/topk output, keyed doc_id) ⋈
    doc_meta(doc_id, url) ⋈ pagerank_table(node, pagerank, inlinks,
    outlinks) -> one row per (query_id, doc_id) with FEATURE_COLUMNS.

    Missing PageRank rows default to 0 with preserved row — the reference
    *errors* per-doc and then scoring proceeds with zero-valued features
    (ranker.go:40-42); bulk-left-join + coalesce is the same observable
    semantics without the N+1 RPC."""
    meta = url_features(doc_meta.select("doc_id", "url"))
    pr = pagerank_table.select(
        F.col("node").alias("doc_id"),
        F.col("pagerank").alias("page_rank"),
        F.col("inlinks").alias("inlink_count"),
        F.col("outlinks").alias("outlink_count"),
    )
    out = (
        scored.join(meta, "doc_id", "left")
        .join(pr, "doc_id", "left")
        .withColumn("page_rank", F.coalesce("page_rank", F.lit(0.0)))
        .withColumn("inlink_count", F.coalesce("inlink_count", F.lit(0)))
        .withColumn("outlink_count", F.coalesce("outlink_count", F.lit(0)))
        .withColumn("num_slashes_in_url", F.coalesce("num_slashes_in_url", F.lit(0)))
        .withColumn("length_of_url", F.coalesce("length_of_url", F.lit(0)))
    )
    keys = [c for c in ("query_id", "doc_id", "rank") if c in out.columns]
    return out.select(*keys, *FEATURE_COLUMNS)


# reference CSV header (internal/datagen/data_loader.go:93-101): the 24
# Features fields in declaration order, then the label column "Y"
REFERENCE_CSV_HEADER = [
    "CoveredQueryTermNumber", "CoveredQueryTermRatio",
    "SumTermFrequency", "MinTermFrequency", "MaxTermFrequency",
    "MeanTermFrequency", "VarianceTermFrequency",
    "StreamLength", "SumStreamLengthNormalizedTF",
    "MinStreamLengthNormalizedTF", "MaxStreamLengthNormalizedTF",
    "MeanStreamLengthNormalizedTF", "VarianceStreamLengthNormalizedTF",
    "SumTFIDF", "MinTFIDF", "MaxTFIDF", "MeanTFIDF", "VarianceTFIDF",
    "BM25", "NumSlashesInURL", "LengthOfURL",
    "InlinkCount", "OutlinkCount", "PageRank", "Y",
]


def save_features_csv(features_df: DataFrame, path: str, label_col: str = "label") -> None:
    """S9 — CSV sink with the reference's exact 25-column header
    (data_loader.go:69-144): FEATURE_COLUMNS in declaration order renamed
    to the Go field names, label emitted last as ``Y``. A consumer of the
    reference's CSVs can read these unchanged."""
    cols = [
        F.col(src).alias(dst)
        for src, dst in zip(FEATURE_COLUMNS, REFERENCE_CSV_HEADER[:-1])
    ] + [F.col(label_col).alias("Y")]
    features_df.select(*cols).write.mode("overwrite").option("header", True).csv(path)


def log_examples(features_df: DataFrame, out_dir: str, query_id_col: str = "query_id") -> None:
    """S6 — the training-example sink. The reference gob-dumps the top-1000
    docs' feature vectors per served query to a uniquely-named file
    (internal/ranking/io.go:14-46, called from ranker.go:58-63); here the
    feature log is an append-mode parquet table partitioned by query_id —
    uniqueness comes from the partition key + Spark task attempt ids, and
    downstream training reads it as one table instead of globbing gob
    files."""
    features_df.write.mode("append").partitionBy(query_id_col).parquet(out_dir)
