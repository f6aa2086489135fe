"""Streaming analytics over the transcript stream: watermarked windowed
aggregation and a custom stateful per-conversation operator.

The reference has no streaming surface (SURVEY.md §2.7 — request/response
+ offline batch only); these are the Spark-native operators a live
transcript firehose needs next to the incremental index ingest:

- :func:`windowed_turn_stats` — event-time tumbling-window rollup of
  turn/token volume per role, with a watermark bounding how late a turn
  may arrive: state for windows older than the watermark is evicted, so
  state size is O(active windows), not O(stream history). At 10^12 turns
  the aggregation state is bounded by (windows in watermark horizon x
  roles), independent of throughput.
- :func:`conversation_state` — ``applyInPandasWithState``: a running
  per-conversation accumulator (turns seen, token volume, max turn_idx,
  roles) that emits an updated row whenever a conversation receives new
  turns. State lives in the checkpointed state store, so an
  ``availableNow`` re-run RESUMES conversation counters instead of
  restarting them — the streaming twin of the batch build's manifests.

Both return unstarted streaming DataFrames; the caller owns the sink,
trigger, and checkpoint (tests use availableNow + a memory sink).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.tokenize import tokens_col


def windowed_turn_stats(
    stream: DataFrame,
    window: str = "5 minutes",
    watermark: str = "2 minutes",
) -> DataFrame:
    """(window, role, n_turns, n_tokens) tumbling event-time windows over
    ``ts``; turns arriving later than ``watermark`` behind the max seen
    event time are dropped (their window's state is already evicted)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("window"), "role")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.size(tokens_col("text"))).alias("n_tokens"),
        )
    )


CONV_STATE_SCHEMA = StructType(
    [
        StructField("n_turns", LongType()),
        StructField("n_tokens", LongType()),
        StructField("max_turn_idx", IntegerType()),
    ]
)

CONV_OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", LongType()),
        StructField("n_tokens", LongType()),
        StructField("max_turn_idx", IntegerType()),
    ]
)


def _conv_state_fn(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        n_turns, n_tokens, max_idx = state.get
    else:
        n_turns, n_tokens, max_idx = 0, 0, -1
    for pdf in pdfs:
        n_turns += len(pdf)
        n_tokens += int(pdf["n_tok"].sum())
        if len(pdf):
            max_idx = max(max_idx, int(pdf["turn_idx"].max()))
    state.update((n_turns, n_tokens, max_idx))
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "n_turns": [n_turns],
            "n_tokens": [n_tokens],
            "max_turn_idx": [max_idx],
        }
    )


def conversation_state(stream: DataFrame) -> DataFrame:
    """Running (conv_id, n_turns, n_tokens, max_turn_idx) — one updated
    row per conversation per micro-batch that touched it. Tokenization
    happens JVM-side BEFORE the stateful Python seam, so only (conv_id,
    turn_idx, n_tok) scalars cross into Arrow batches."""
    slim = stream.select(
        "conv_id", "turn_idx", F.size(tokens_col("text")).alias("n_tok")
    )
    return slim.groupBy("conv_id").applyInPandasWithState(
        _conv_state_fn,
        outputStructType=CONV_OUTPUT_SCHEMA,
        stateStructType=CONV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionized_stats(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 minutes",
    key: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessionization: merge a key's events into one session
    while consecutive events arrive less than ``gap`` apart (Spark
    ``session_window`` — state per OPEN session only; a session closes,
    emits, and frees its state once the watermark passes its end).

    Works unchanged on a batch DataFrame (the driver pair's oracle is the
    classic gaps-and-islands SQL: new island when ts - lag(ts) >= gap).

    Returns (key, session_start, session_end_ts, n_events, sum_value)
    where session_end_ts is the LAST EVENT's timestamp (engine-portable;
    the window's own end is last_ts + gap by definition).
    """
    src = stream
    if stream.isStreaming:
        src = stream.withWatermark("ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), key)
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end_ts"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            key, "session_start", "session_end_ts", "n_events", "sum_value"
        )
    )


def windowed_term_counts(
    stream: DataFrame,
    window: str = "5 minutes",
    watermark: str = "2 minutes",
) -> DataFrame:
    """(window, term, n) — per-window term frequencies over the turn
    stream: the aggregation half of trending-term detection. Streaming
    state is (windows in the watermark horizon x distinct terms seen in
    them); the explode runs map-side, the agg is one keyed shuffle.

    Top-k *within* a window is a rank over a completed window's rows —
    run :func:`trending_terms` on the sink table (rank windows are not
    allowed mid-stream because a window's counts keep changing until the
    watermark closes it; the batch twin IS the semantics once closed)."""
    return (
        stream.withWatermark("ts", watermark)
        .select("ts", F.explode(tokens_col("text")).alias("term"))
        .groupBy(F.window("ts", window).alias("window"), "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def trending_terms(term_counts: DataFrame, k: int = 5) -> DataFrame:
    """(window_start, term, n, rank): top-k terms per closed window by
    (count desc, term asc) — run over the windowed_term_counts sink (or
    its batch twin on a static table)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("window").orderBy(F.desc("n"), F.asc("term"))
    return (
        term_counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("window.start").alias("window_start"), "term", "n", "rank"
        )
    )
