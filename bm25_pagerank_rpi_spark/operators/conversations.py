"""Conversation-level transcript analytics.

The engine's primary input is multi-turn conversation/agent transcripts
(BASELINE.json input_hint); beyond per-turn retrieval, a transcript
corpus gets profiled at the CONVERSATION grain — role mix, tool usage,
token volume, wall-clock span — for curation (drop degenerate
conversations), mixture weighting, and ops dashboards.

One hash aggregate keyed by conv_id; every per-turn column is computed
map-side (tokenize is a codegen projection), so the shuffle carries one
row per conversation. At 10^12 turns / ~10^11 conversations this is the
same shape as doc_lengths — scan-bound with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col
from ..sources.transcripts import ROLES


def conversation_profile(transcripts: DataFrame) -> DataFrame:
    """Per-conversation profile over (conv_id, turn_idx, role, text,
    tool, ts) rows.

    Columns: n_turns, one n_role_<r> per transcript role, n_tool_calls
    (tool != 'none'), distinct_tools (likewise), total_tokens,
    avg_turn_tokens (6-dp), duration_s (epoch-seconds span)."""
    t = transcripts.select(
        "conv_id",
        "role",
        "tool",
        F.size(tokens_col("text")).alias("n_tokens"),
        F.unix_timestamp("ts").alias("epoch"),
    )
    role_counts = [
        F.sum(F.when(F.col("role") == r, 1).otherwise(0))
        .cast("long")
        .alias(f"n_role_{r}")
        for r in ROLES
    ]
    return t.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        *role_counts,
        F.sum(F.when(F.col("tool") != "none", 1).otherwise(0))
        .cast("long")
        .alias("n_tool_calls"),
        F.count_distinct(
            F.when(F.col("tool") != "none", F.col("tool"))
        ).cast("long").alias("distinct_tools"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 6).alias("avg_turn_tokens"),
        (F.max("epoch") - F.min("epoch")).alias("duration_s"),
    )
