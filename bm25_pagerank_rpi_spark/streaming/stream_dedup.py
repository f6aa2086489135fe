"""First-occurrence content dedup, batch + streaming twins.

The curation pipeline's "keep the first copy of every duplicated
document" rule as it applies to a live firehose: the batch operator pins
the value semantics (earliest (ts, id) per content key wins — fully
deterministic, independent of partitioning), and the streaming operator
is the watermark-stateful deployment of the same rule over an ordered
replay.

- :func:`keep_first` — batch: one rank window partitioned by the content
  hash (a single shuffle; the rn = 1 filter is a group-limit, so no
  per-group full sort materializes). Content key = portable 60-bit hash
  of the concatenated content columns, the same `phash` the exact-dedup
  operator uses (operators/dedup.py), so the two agree on what "same
  content" means.
- :func:`keep_first_stream` — streaming: ``dropDuplicatesWithinWatermark``
  on the content hash. State holds one entry per DISTINCT content key
  seen inside the watermark horizon and is evicted once the event-time
  watermark passes — O(distinct keys per horizon), not O(stream
  history). Within a micro-batch Spark keeps the first row in batch
  order; across an in-event-time-order replay (the test harness and any
  log-ordered source) the kept row is exactly the batch twin's earliest
  (ts, id) winner. Out-of-order arrivals INSIDE the watermark may keep a
  later-ts copy (first-arrival semantics — the documented streaming
  relaxation); the batch operator is the deterministic authority.

Reference analogy: the reference engine has no streaming surface; this
extends its batch-only dedup contract the same way incremental.py
extends the batch index build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import phash


def _content_hash(content_cols: list[str]):
    parts: list = []
    for c in content_cols:
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("\x00null")))
        parts.append(F.lit("\x1f"))
    return phash(F.concat(*parts[:-1]))


def keep_first(
    df: DataFrame,
    content_cols: list[str],
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Batch first-occurrence dedup: per content key, keep the row with
    the smallest (ts, id); output schema = input + content_hash."""
    w = Window.partitionBy("content_hash").orderBy(
        F.asc(ts_col), F.asc(id_col)
    )
    return (
        df.withColumn("content_hash", _content_hash(content_cols))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def keep_first_stream(
    stream: DataFrame,
    content_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming first-occurrence dedup (unstarted DataFrame; caller owns
    sink/trigger/checkpoint). One state entry per distinct content key
    within the watermark horizon; duplicates arriving after eviction are
    re-admitted (the standard bounded-state tradeoff — widen the
    watermark to widen the dedup horizon)."""
    return (
        stream.withColumn("content_hash", _content_hash(content_cols))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
