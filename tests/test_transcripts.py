"""The input_hint's per-row invariant: per-turn text equality under
stable (conv_id, turn_idx) ordering.

The engine's primary input is the transcripts table (conv_id, turn_idx,
role, text, tool, ts). Everything downstream — doc identity, the index,
scoring — assumes that (conv_id, turn_idx) is a stable unique key and that
the text of a turn survives ingestion byte-for-byte. These tests pin that
contract on the synthesized table (sources/transcripts.py) and on the
doc-identity mapping the whole pipeline keys on (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bm25_pagerank_rpi_spark.sources.transcripts import (
    TURNS_PER_CONV,
    synthesize_transcripts,
    with_doc_identity,
)

SF_DIR = "/root/testdata/sf0.001"


def test_turn_key_is_unique_and_dense(spark):
    t = synthesize_transcripts(spark, SF_DIR, replicas=1)
    n = t.count()
    assert t.select("conv_id", "turn_idx").distinct().count() == n
    # turn_idx is dense in [0, TURNS_PER_CONV)
    mm = t.agg(F.min("turn_idx"), F.max("turn_idx")).first()
    assert mm[0] == 0 and mm[1] == TURNS_PER_CONV - 1


def test_per_turn_text_equality_under_stable_ordering(spark):
    """Ordering by (conv_id, turn_idx) reproduces the source documents
    ordered by doc_id, text byte-for-byte — synthesis is a bijective,
    order-preserving re-keying, not a transformation of the text."""
    src = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.col("doc_id").cast("long").alias("doc_id"), "text")
        .orderBy("doc_id")
        .collect()
    )
    turns = (
        synthesize_transcripts(spark, SF_DIR, replicas=1)
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    assert len(turns) == len(src)
    for row, exp in zip(turns, src):
        # gid == src doc_id at replicas=1; conv/turn encode it positionally
        gid = int(row.conv_id.removeprefix("conv_")) * TURNS_PER_CONV + row.turn_idx
        assert gid == exp.doc_id
        assert row.text == exp.text


def test_synthesis_is_deterministic(spark):
    a = synthesize_transcripts(spark, SF_DIR, replicas=2).orderBy(
        "conv_id", "turn_idx"
    )
    b = synthesize_transcripts(spark, SF_DIR, replicas=2).orderBy(
        "conv_id", "turn_idx"
    )
    assert a.schema == b.schema
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_doc_identity_round_trips_the_turn_key(spark):
    t = with_doc_identity(synthesize_transcripts(spark, SF_DIR, replicas=1))
    bad = t.filter(
        (F.split("doc_id", ":")[0] != F.col("conv_id"))
        | (F.split("doc_id", ":")[1].cast("int") != F.col("turn_idx"))
    )
    assert bad.count() == 0
    # doc_id is as unique as the key it encodes
    assert t.select("doc_id").distinct().count() == t.count()
