"""Incremental index maintenance over an append-only transcript stream.

The reference is strictly request/response + offline batch (SURVEY.md
§2.7); this module is the Spark-native extra that makes the index keep
up with a growing corpus: Structured Streaming over the transcript
directory with ``Trigger.AvailableNow`` + ``foreachBatch``, each batch
appended as a SEGMENT (LSM-style):

  per batch (all incremental):
    - new docs get doc_ints ABOVE the current maximum, so segment doc
      ranges are disjoint and posting blocks stay doc-ordered per term;
    - doc_meta + postings are APPENDED (tokenize + TF agg touch only the
      new turns — the dominant cost at 10^12 turns stays proportional to
      the delta);
    - corpus_stats are recomputed (cheap single agg).
  then (full, but cheap relative to tokenize):
    - the ``blocks`` + ``terms`` stages re-encode from the postings
      table, because BM25's length normalizer avg_doc_length SHIFTS when
      docs arrive — stale per-block factors would silently break the
      rank-identical contract. Re-encode is one (term, range_id)
      applyInPandas pass with no wide shuffle; a production variant
      would re-encode only when avgdl drift exceeds an epsilon and lazily
      compact, trading exactness between compactions (Lucene-style).

Exactly-once: the streaming checkpoint (``checkpointLocation``) dedupes
input files across restarts, so a crashed ingest run resumes without
double-appending — the streaming twin of the batch build's stage
manifests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col
from ..sources.catalog import IndexCatalog, term_bucket
from ..sources.transcripts import TRANSCRIPT_SCHEMA, with_doc_identity


def stream_transcripts(spark: SparkSession, in_dir: str) -> DataFrame:
    """File-source stream over an append-only transcript directory."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(in_dir)
    )


def _next_doc_int(cat: IndexCatalog) -> int:
    try:
        row = cat.doc_meta().agg(F.max("doc_int").alias("m")).collect()[0]
        return int(row.m) + 1 if row.m is not None else 0
    except Exception:
        return 0


def append_segment(cat: IndexCatalog, batch: DataFrame, n_buckets: int = 32) -> int:
    """Append one micro-batch of transcripts as a new segment.
    Returns the number of turns appended."""
    spark = cat.spark
    base = _next_doc_int(cat)
    t = with_doc_identity(batch)
    dlen = t.select(
        "doc_id", "conv_id", "turn_idx", "role", "tool", "ts", "url",
        F.size(tokens_col("text")).alias("doc_length"),
    )
    w = Window.orderBy("doc_id")  # batch-local; micro-batches are bounded
    meta = dlen.withColumn(
        "doc_int", (F.lit(base) + F.row_number().over(w) - 1).cast("long")
    )
    meta.write.mode("append").parquet(cat.path("doc_meta"))

    toks = t.select("doc_id", F.explode(tokens_col("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).cast("int").alias("tf"))
    post = (
        tf.join(cat.doc_meta().filter(F.col("doc_int") >= base).select("doc_id", "doc_int", "doc_length"), "doc_id")
        .select("term", "doc_int", "tf", "doc_length", term_bucket("term", n_buckets).alias("bucket"))
    )
    post.write.mode("append").partitionBy("bucket").parquet(cat.path("postings"))

    stats = cat.doc_meta().agg(
        F.count(F.lit(1)).alias("doc_count"),
        F.avg("doc_length").alias("avg_doc_length"),
    )
    # write via temp + swap semantics: parquet overwrite is atomic enough
    # for a 1-row table under the single-writer ingest model
    stats.write.mode("overwrite").parquet(cat.path("corpus_stats"))
    n = batch.count()
    m = cat.read_manifest()
    m.setdefault("segments", []).append({"base_doc_int": base, "turns": n})
    cat.write_manifest(m)
    return n


def reencode_blocks(cat: IndexCatalog, block_size: int | None = None) -> None:
    """Re-run the blocks + terms stages from the postings table with the
    CURRENT corpus stats (factors depend on avg_doc_length)."""
    from ..index import codec
    from ..plans.index_build import BLOCK_SCHEMA, _make_encode_partition_fn
    from .. import B, K1

    cfg = cat.read_manifest().get("config", {})
    n_buckets = int(cfg.get("n_buckets") or 32)
    block_size = block_size or int(cfg.get("block_size") or codec.DEFAULT_BLOCK_SIZE)
    range_rows = int(cfg.get("range_rows") or 1 << 20)

    _, avgdl = cat.scalar_stats()
    post = cat.postings()
    tfd = F.col("tf").cast("double")
    dl = F.col("doc_length").cast("double")
    factor = (tfd * F.lit(K1 + 1.0)) / (
        tfd + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * (dl / F.lit(avgdl)))
    )
    blocks_per_range = range_rows // block_size + 1
    enc = _make_encode_partition_fn(block_size, blocks_per_range)
    ranged = post.withColumn("factor", factor).withColumn(
        "range_id", (F.col("doc_int") / F.lit(range_rows)).cast("long")
    )
    npart = max(cat.spark.sparkContext.defaultParallelism * 2, 8)
    blocks = (
        ranged.select("term", "range_id", "doc_int", "tf", "factor")
        .repartition(npart, "term", "range_id")
        .sortWithinPartitions("term", "range_id", "doc_int")
        .mapInPandas(enc, schema=BLOCK_SCHEMA)
        .withColumn("bucket", term_bucket("term", n_buckets))
    )
    blocks.write.mode("overwrite").partitionBy("bucket").parquet(cat.path("blocks"))

    stats = cat.corpus_stats()
    terms = (
        cat.blocks()
        .groupBy("term")
        .agg(
            F.sum("n_postings").alias("df"),
            F.max("max_factor").alias("max_factor"),
            F.min("min_factor").alias("min_factor"),
        )
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            "df",
            F.log(
                F.col("doc_count").cast("double") / (F.col("df") + F.lit(1)).cast("double")
            ).alias("idf"),
            "max_factor",
            "min_factor",
            term_bucket("term", n_buckets).alias("bucket"),
        )
    )
    terms.write.mode("overwrite").parquet(cat.path("terms"))


def run_incremental_build(
    spark: SparkSession,
    in_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    n_buckets: int = 32,
) -> IndexCatalog:
    """Ingest all currently-available transcript files (AvailableNow),
    appending segments per micro-batch, then re-encode blocks once at the
    end of the run. Re-running after new files appear ingests only the
    delta (checkpointed file source)."""
    cat = IndexCatalog(spark, index_dir)
    m = cat.read_manifest()
    m.setdefault("config", {}).setdefault("n_buckets", n_buckets)
    cat.write_manifest(m)
    appended = {"n": 0}

    def handle(batch: DataFrame, batch_id: int) -> None:
        appended["n"] += append_segment(cat, batch, n_buckets=n_buckets)

    q = (
        stream_transcripts(spark, in_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if appended["n"]:
        reencode_blocks(cat)
    return cat
