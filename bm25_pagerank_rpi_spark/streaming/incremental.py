"""Incremental index maintenance over an append-only transcript stream.

The reference is strictly request/response + offline batch (SURVEY.md
§2.7); this module is the Spark-native extra that makes the index keep
up with a growing corpus: Structured Streaming over the transcript
directory with ``Trigger.AvailableNow`` + ``foreachBatch``, each batch
appended as a SEGMENT (LSM-style). Cost is O(delta), not O(corpus):

  per batch (touches only the new turns):
    - new docs get doc_ints ABOVE the current maximum via the same
      range-partition + offset ordinal as the batch build (no
      single-partition window), so segment doc ranges are disjoint and
      posting blocks stay doc-ordered per term;
    - doc_meta + postings are APPENDED;
    - corpus_stats are recomputed (cheap single agg over doc lengths).
  per run (after all batches):
    - BM25's length normalizer avg_doc_length shifts as docs arrive.
      Re-encoding every block per append would be O(corpus), so the
      normalizer is FROZEN at the last compaction (``encode_avgdl`` in
      the manifest, Lucene-style): while relative drift stays under
      ``avgdl_epsilon`` only the NEW segments' postings are encoded
      (with the frozen normalizer, so all live blocks agree) and
      appended; per-term stats are re-aggregated from block METADATA
      (no decode, binary columns pruned from the scan). Scores between
      compactions are exact under the frozen normalizer — within an
      O(epsilon) band of true BM25.
    - when drift exceeds epsilon (or on the first run) the index
      COMPACTS: all blocks re-encode from the postings table with the
      current normalizer, restoring exact-BM25 parity with a
      from-scratch build.

Block identity across segments: every block stores its ``range_id``
(doc_int // range_rows), which is what the WAND path shards on — so a
doc interval's blocks land in one shard whether they came from the
batch build or a later segment. Delta-encoded blocks get block_ids in a
per-generation namespace (``gen * GEN_STRIDE``) so ids never collide
with earlier generations that already cover the same (term, range).

Exactly-once: the streaming checkpoint (``checkpointLocation``) dedupes
input files across restarts, so a crashed ingest run resumes without
double-appending — the streaming twin of the batch build's stage
manifests.
"""

from __future__ import annotations

from pyspark.errors.exceptions.base import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ordinal import dense_ordinal
from ..functions.tokenize import tokens_col
from ..sources.catalog import IndexCatalog, term_bucket
from ..sources.transcripts import TRANSCRIPT_SCHEMA, with_doc_identity

DEFAULT_AVGDL_EPSILON = 0.01
GEN_STRIDE = 1 << 40  # block_id namespace per delta generation


def stream_transcripts(spark: SparkSession, in_dir: str) -> DataFrame:
    """File-source stream over an append-only transcript directory."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(in_dir)
    )


def _next_doc_int(cat: IndexCatalog) -> int:
    """0 for a fresh catalog (doc_meta does not exist yet); any OTHER
    failure re-raises — silently re-basing at 0 on a transient read error
    would mint duplicate doc_ints and corrupt the doc-ordered segment
    invariant the WAND path depends on."""
    try:
        row = cat.doc_meta().agg(F.max("doc_int").alias("m")).collect()[0]
    except AnalysisException:
        return 0
    return int(row.m) + 1 if row.m is not None else 0


def append_segment(cat: IndexCatalog, batch: DataFrame, n_buckets: int = 32) -> int:
    """Append one micro-batch of transcripts as a new segment.
    Returns the number of turns appended."""
    base = _next_doc_int(cat)
    t = with_doc_identity(batch)
    dlen = t.select(
        "doc_id", "conv_id", "turn_idx", "role", "tool", "ts", "url",
        F.size(tokens_col("text")).alias("doc_length"),
    )
    # same distributed ordinal as the batch build stage 1 — no
    # single-partition Window even for a large backfill batch
    meta, n, pinned = dense_ordinal(dlen, "doc_id", "doc_int", base=base)
    meta.write.mode("append").parquet(cat.path("doc_meta"))
    pinned.unpersist()
    if n == 0:
        return 0

    toks = t.select("doc_id", F.explode(tokens_col("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).cast("int").alias("tf"))
    post = (
        tf.join(
            cat.doc_meta()
            .filter(F.col("doc_int") >= base)
            .select("doc_id", "doc_int", "doc_length"),
            "doc_id",
        )
        .select(
            "term", "doc_int", "tf", "doc_length",
            term_bucket("term", n_buckets).alias("bucket"),
        )
    )
    post.write.mode("append").partitionBy("bucket").parquet(cat.path("postings"))

    stats = cat.live_doc_meta().agg(
        F.count(F.lit(1)).alias("doc_count"),
        F.avg("doc_length").alias("avg_doc_length"),
    )
    # write via temp + swap semantics: parquet overwrite is atomic enough
    # for a 1-row table under the single-writer ingest model
    stats.write.mode("overwrite").parquet(cat.path("corpus_stats"))
    m = cat.read_manifest()
    m.setdefault("segments", []).append({"base_doc_int": base, "turns": n})
    cat.write_manifest(m)
    return n


def _encode_postings(
    cat: IndexCatalog,
    post: DataFrame,
    avgdl: float,
    block_size: int,
    range_rows: int,
    n_buckets: int,
    block_id_base: int = 0,
    tail_df_threshold: int | None = None,
) -> DataFrame:
    """(term, range_id)-grouped block encode of a postings relation under a
    FIXED normalizer — the shared kernel of compaction and delta append.
    Applies the SAME head/tail range routing as the batch blocks stage
    (``tail_df_threshold`` from the manifest), so a compacted or
    incrementally-grown index keeps the batch build's layout policy:
    zipf-tail terms stay collapsed in corpus-global blocks instead of
    re-fragmenting into singletons. Tail routing of a DELTA encode is
    decided on the delta's own df (most delta terms are tail-sized);
    a term may therefore hold both ranged and tail blocks across
    generations — the WAND path scores that mix exactly (has_tail +
    partial-sum merge)."""
    from .. import B, K1
    from ..plans.index_build import (
        BLOCK_SCHEMA,
        _make_encode_arrow_fn,
        with_range_routing,
    )

    tfd = F.col("tf").cast("double")
    dl = F.col("doc_length").cast("double")
    factor = (tfd * F.lit(K1 + 1.0)) / (
        tfd + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * (dl / F.lit(avgdl)))
    )
    blocks_per_range = range_rows // block_size + 1
    enc = _make_encode_arrow_fn(block_size, blocks_per_range, block_id_base)
    ranged = with_range_routing(
        post.withColumn("factor", factor), range_rows, tail_df_threshold
    )
    npart = max(cat.spark.sparkContext.defaultParallelism * 2, 8)
    return (
        ranged.select("term", "range_id", "doc_int", "tf", "factor")
        .repartition(npart, "term", "range_id")
        .sortWithinPartitions("term", "range_id", "doc_int")
        .mapInArrow(enc, schema=BLOCK_SCHEMA)
        .withColumn("bucket", term_bucket("term", n_buckets))
    )


def _refresh_terms(cat: IndexCatalog, n_buckets: int) -> None:
    """Rebuild per-term stats from block METADATA (df = sum of block
    posting counts, factor bounds = extrema over blocks) — column pruning
    keeps the encoded binary columns out of the scan, so this is a
    metadata aggregation, not a decode."""
    stats = cat.corpus_stats()
    terms = (
        cat.blocks()
        .groupBy("term")
        .agg(
            F.sum("n_postings").alias("df"),
            F.max("max_factor").alias("max_factor"),
            F.min("min_factor").alias("min_factor"),
            F.count(F.lit(1)).cast("int").alias("n_blocks"),
            F.max((F.col("range_id") == -1).cast("int")).alias("has_tail"),
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
            "n_blocks",
            "has_tail",
            term_bucket("term", n_buckets).alias("bucket"),
        )
    )
    terms.write.mode("overwrite").parquet(cat.path("terms"))


def _config(cat: IndexCatalog) -> tuple[int, int, int, int]:
    from ..index import codec

    cfg = cat.read_manifest().get("config", {})
    n_buckets = int(cfg.get("n_buckets") or 32)
    block_size = int(cfg.get("block_size") or codec.DEFAULT_BLOCK_SIZE)
    range_rows = int(cfg.get("range_rows") or 1 << 20)
    # default matches build_index: threshold = block_size
    tail_df_threshold = int(cfg.get("tail_df_threshold", block_size))
    return n_buckets, block_size, range_rows, tail_df_threshold


def compact(cat: IndexCatalog) -> None:
    """Full re-encode of every block under the CURRENT avg_doc_length —
    restores exact-BM25 parity with a from-scratch build of the LIVE
    corpus. O(corpus); runs only when drift exceeds epsilon (or on the
    first ingest). Purges tombstones first (streaming/deletes.py), so the
    re-encode below reads only live postings and the rebuilt terms table
    unfreezes df/idf to live values — the segment-merge half of the
    Lucene deletion model."""
    from .deletes import purge_deletes

    purge_deletes(cat)
    n_buckets, block_size, range_rows, tail_df_threshold = _config(cat)
    _, avgdl = cat.scalar_stats()
    blocks = _encode_postings(
        cat, cat.postings(), avgdl, block_size, range_rows, n_buckets,
        tail_df_threshold=tail_df_threshold,
    ).repartition(n_buckets, "bucket")
    blocks.write.mode("overwrite").partitionBy("bucket").parquet(cat.path("blocks"))
    _refresh_terms(cat, n_buckets)
    m = cat.read_manifest()
    m["encode_avgdl"] = avgdl
    m["delta_gens"] = 0
    m.setdefault("encodes", []).append({"type": "full", "avgdl": avgdl})
    cat.write_manifest(m)


def append_delta_blocks(cat: IndexCatalog, min_doc_int: int) -> None:
    """Encode ONLY postings with doc_int >= min_doc_int (the segments
    appended this run) under the FROZEN normalizer and append them.
    The doc_int predicate pushes down to the postings scan, and because
    segment files hold disjoint doc_int ranges, parquet row-group stats
    prune every pre-existing file — the encode cost is O(delta)."""
    n_buckets, block_size, range_rows, tail_df_threshold = _config(cat)
    m = cat.read_manifest()
    avgdl = float(m["encode_avgdl"])
    gen = int(m.get("delta_gens", 0)) + 1
    post = cat.postings().filter(F.col("doc_int") >= min_doc_int)
    blocks = _encode_postings(
        cat, post, avgdl, block_size, range_rows, n_buckets,
        block_id_base=gen * GEN_STRIDE,
        tail_df_threshold=tail_df_threshold,
    )
    blocks.write.mode("append").partitionBy("bucket").parquet(cat.path("blocks"))
    _refresh_terms(cat, n_buckets)
    m = cat.read_manifest()
    m["delta_gens"] = gen
    m.setdefault("encodes", []).append(
        {"type": "delta", "avgdl": avgdl, "min_doc_int": min_doc_int}
    )
    cat.write_manifest(m)


DEFAULT_MINOR_COMPACT_GENS = 8


def _make_merge_fn(block_size: int, blocks_per_range: int):
    """Group merger for minor compaction: decode a (term, range_id)
    group's fragmented blocks, doc-sort, re-encode as densely packed
    blocks in the base (gen-0) block_id namespace. The (doc, tf, factor)
    triples pass through UNCHANGED — no re-scoring."""
    import numpy as np
    import pandas as pd

    from ..index import codec

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        term, range_id = key
        ds, ts, fs = [], [], []
        for r in pdf.itertuples():
            d, t, f = codec.decode_block(r)
            ds.append(d)
            ts.append(t)
            fs.append(f)
        d = np.concatenate(ds)
        t = np.concatenate(ts)
        f = np.concatenate(fs)
        order = np.argsort(d, kind="stable")  # gens hold disjoint doc ranges
        rows = []
        for b in codec.blocks_for_term(
            d[order], t[order], f[order], block_size=block_size,
            first_block_id=int(range_id) * blocks_per_range,
        ):
            b["term"] = term
            b["range_id"] = int(range_id)
            b["n_postings"] = b.pop("count")
            rows.append(b)
        return pd.DataFrame(rows)

    return fn


def minor_compact(cat: IndexCatalog) -> int:
    """Collapse delta-generation block fragments per (term, range_id)
    WITHOUT re-scoring (VERDICT r2 #6): every live block was encoded
    under the same frozen normalizer, so merging is decode + doc-sort +
    re-encode of identical (doc, tf, factor) triples — scores stay
    bit-identical (pinned by test_minor_compaction_*). Only groups whose
    layout actually improves are decoded (more blocks than a dense
    packing needs); untouched blocks pass through as stored rows. Returns
    the number of merged groups. The rewrite goes through a temp
    directory + rename (single-writer ingest model, same as
    corpus_stats)."""
    import os
    import shutil

    from ..plans.index_build import BLOCK_SCHEMA

    n_buckets, block_size, range_rows, _ = _config(cat)
    blocks_per_range = range_rows // block_size + 1
    blk = cat.blocks()
    frag_keys = (
        blk.groupBy("term", "range_id")
        .agg(F.count(F.lit(1)).alias("_nb"), F.sum("n_postings").alias("_np"))
        .filter(F.col("_nb") > F.ceil(F.col("_np") / F.lit(block_size)))
        .select("term", "range_id")
    )
    n_frag = frag_keys.count()
    if n_frag == 0:
        return 0
    frag = blk.join(frag_keys, ["term", "range_id"])
    keep = blk.join(frag_keys, ["term", "range_id"], "left_anti")
    merged = (
        frag.groupBy("term", "range_id")
        .applyInPandas(_make_merge_fn(block_size, blocks_per_range), BLOCK_SCHEMA)
        .withColumn("bucket", term_bucket("term", n_buckets))
    )
    out = keep.select(*merged.columns).unionByName(merged)
    tmp = cat.path("blocks") + "._compacting"
    out.repartition(n_buckets, "bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(tmp)
    final = cat.path("blocks")
    shutil.rmtree(final)
    os.rename(tmp, final)
    _refresh_terms(cat, n_buckets)
    m = cat.read_manifest()
    m["delta_gens"] = 0
    m.setdefault("encodes", []).append({"type": "minor", "merged_groups": n_frag})
    cat.write_manifest(m)
    return n_frag


def refresh_blocks(
    cat: IndexCatalog,
    min_doc_int: int,
    epsilon: float,
    minor_compact_after: int = DEFAULT_MINOR_COMPACT_GENS,
) -> str:
    """Epsilon-gated encode step after an ingest run: delta-append while
    the frozen normalizer is within ``epsilon`` relative drift of the
    true avg_doc_length, full compaction otherwise; after
    ``minor_compact_after`` accumulated delta generations the fragments
    are merged in place (pure block merge under the frozen normalizer —
    see :func:`minor_compact`). Returns the action taken ("delta",
    "delta+minor", or "full")."""
    m = cat.read_manifest()
    frozen = m.get("encode_avgdl")
    _, avgdl = cat.scalar_stats()
    if frozen is not None and abs(avgdl - float(frozen)) <= epsilon * float(frozen):
        append_delta_blocks(cat, min_doc_int)
        if int(cat.read_manifest().get("delta_gens", 0)) >= minor_compact_after:
            minor_compact(cat)
            return "delta+minor"
        return "delta"
    compact(cat)
    return "full"


def run_incremental_build(
    spark: SparkSession,
    in_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    n_buckets: int = 32,
    avgdl_epsilon: float = DEFAULT_AVGDL_EPSILON,
    minor_compact_after: int = DEFAULT_MINOR_COMPACT_GENS,
) -> IndexCatalog:
    """Ingest all currently-available transcript files (AvailableNow),
    appending segments per micro-batch, then refresh blocks once at the
    end of the run (delta-append under the frozen normalizer, or full
    compaction when avg_doc_length drifted past ``avgdl_epsilon``).
    Re-running after new files appear ingests only the delta
    (checkpointed file source)."""
    cat = IndexCatalog(spark, index_dir)
    m = cat.read_manifest()
    m.setdefault("config", {}).setdefault("n_buckets", n_buckets)
    cat.write_manifest(m)
    run_base = _next_doc_int(cat)
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
        refresh_blocks(cat, run_base, avgdl_epsilon, minor_compact_after)
    return cat
