"""Transcript-corpus sources.

The engine's primary input (BASELINE.json input_hint) is a table of
multi-turn conversation / agent transcripts:
    (conv_id: string, turn_idx: int32, role: string, text: string,
     tool: string, ts: timestamp)

In this sandbox we synthesize that table DETERMINISTICALLY from the
driver-provided ``documents.parquet`` (TESTDATA.md) — fully distributed
(spark.range cross-join amplification, no driver-side loops), so the same
generator scales from 500 turns to hundreds of millions.

Document identity follows SURVEY.md §1.3:
    doc_id = concat(conv_id, ':', turn_idx)
    url    = concat(conv_id, '/', turn_idx, '/', role, '/', tool)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["none", "search", "code", "browser"]
TURNS_PER_CONV = 8

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def synthesize_transcripts(
    spark: SparkSession,
    sf_dir: str,
    replicas: int = 1,
    zipf_tokens: int = 0,
    zipf_vocab: int = 200_000,
) -> DataFrame:
    """Deterministic transcript table derived from documents.parquet.

    Each (document, replica) pair becomes one turn. ``replicas > 1``
    amplifies the corpus for throughput benchmarking; every replica gets a
    distinct marker token appended so posting lists grow realistically
    instead of collapsing into duplicates.

    ``zipf_tokens > 0`` appends that many extra tokens per turn drawn from
    a ~zipf(1) document-frequency distribution over ``zipf_vocab`` synthetic
    terms (token id = floor(exp(u * ln V)) via inverse-CDF on a per-(turn,
    slot) hash). The base corpus has a tiny vocabulary (documents.parquet
    is synthetic), which makes index-build benchmarks unrealistically easy
    on the sort/encode/tail-salt paths; the zipf extension reproduces the
    head-skew + long-tail term distribution real transcript corpora have.
    Off by default so headline bench numbers stay comparable across rounds.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("src_id"), "text"
    )
    if replicas > 1:
        reps = spark.range(replicas).select(F.col("id").alias("rep"))
        docs = docs.crossJoin(reps).withColumn(
            "text",
            F.concat_ws(" ", F.col("text"), F.concat(F.lit("rep"), F.col("rep"))),
        )
    else:
        docs = docs.withColumn("rep", F.lit(0))

    gid = (F.col("src_id") * replicas + F.col("rep")).alias("gid")
    if zipf_tokens > 0:
        import math as _math

        ln_v = _math.log(zipf_vocab)
        zs = []
        for i in range(zipf_tokens):
            u = (
                F.pmod(F.xxhash64(F.col("src_id") * replicas + F.col("rep"), F.lit(i)), F.lit(1_000_000))
                / F.lit(1_000_000.0)
            )
            zs.append(F.concat(F.lit("z"), F.floor(F.exp(u * F.lit(ln_v))).cast("long")))
        docs = docs.withColumn("text", F.concat_ws(" ", F.col("text"), *zs))
    # the small parquet read + broadcast crossJoin would otherwise leave ONE
    # partition, serializing every downstream map chain (tokenize/explode)
    # onto a single core until the first shuffle
    out = docs.select(gid, "text").repartition(
        spark.sparkContext.defaultParallelism * 2
    )
    turn = (F.col("gid") % TURNS_PER_CONV).cast("int")
    conv = F.format_string("conv_%08d", (F.col("gid") / TURNS_PER_CONV).cast("long"))
    return out.select(
        conv.alias("conv_id"),
        turn.alias("turn_idx"),
        F.element_at(F.array(*[F.lit(r) for r in ROLES]), (turn % 4) + 1).alias("role"),
        F.col("text"),
        F.element_at(
            F.array(*[F.lit(t) for t in TOOLS]), ((F.col("gid") % 16) / 4 + 1).cast("int")
        ).alias("tool"),
        (F.lit("2025-01-01 00:00:00").cast("timestamp") + (F.col("gid") * F.expr("INTERVAL 1 SECOND"))).alias("ts"),
    )


def with_doc_identity(transcripts: DataFrame) -> DataFrame:
    """Attach doc_id + url per SURVEY.md §1.3."""
    return transcripts.withColumn(
        "doc_id", F.concat_ws(":", "conv_id", "turn_idx")
    ).withColumn(
        "url", F.concat_ws("/", "conv_id", "turn_idx", "role", "tool")
    )
