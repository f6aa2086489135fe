"""First-occurrence dedup: batch determinism + streaming watermark state
(streaming/stream_dedup.py)."""

from __future__ import annotations

import datetime

from bm25_pagerank_rpi_spark.streaming.stream_dedup import (
    keep_first,
    keep_first_stream,
)

SCHEMA = "event_id long, ts timestamp, payload string"


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2025, 1, 1, 10, minute)


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run(sdf, ckpt):
    rows = []

    def handle(batch, _bid):
        rows.extend(batch.collect())

    q = (
        sdf.writeStream.foreachBatch(handle)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rows


def test_keep_first_batch_earliest_wins(spark):
    df = spark.createDataFrame(
        [
            (3, _ts(5), "aaa"),
            (1, _ts(2), "aaa"),  # earliest ts for 'aaa' -> wins
            (2, _ts(2), "aaa"),  # same ts, higher id -> loses
            (4, _ts(0), "bbb"),
            (5, _ts(9), None),  # NULL payload is its own key
            (6, _ts(1), None),
        ],
        SCHEMA,
    )
    out = keep_first(df, ["payload"], ts_col="ts", id_col="event_id")
    kept = sorted(r["event_id"] for r in out.collect())
    assert kept == [1, 4, 6]
    # result independent of partitioning
    out2 = keep_first(
        df.repartition(7), ["payload"], ts_col="ts", id_col="event_id"
    )
    assert sorted(r["event_id"] for r in out2.collect()) == [1, 4, 6]


def test_keep_first_stream_dedups_across_batches(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    _write(spark, in_dir, [
        (1, _ts(0), "aaa"),
        (2, _ts(1), "aaa"),  # duplicate inside the first batch
        (3, _ts(1), "bbb"),
    ])
    stream = lambda: keep_first_stream(  # noqa: E731
        spark.readStream.schema(SCHEMA).parquet(in_dir),
        ["payload"],
        ts_col="ts",
        watermark="10 minutes",
    )
    out1 = _run(stream(), ckpt)
    assert sorted(r["event_id"] for r in out1) == [1, 3]
    # second availableNow run resumes state: the in-watermark duplicate
    # of 'aaa' is still dropped; a new key passes through
    _write(spark, in_dir, [
        (4, _ts(2), "aaa"),
        (5, _ts(3), "ccc"),
    ])
    out2 = _run(stream(), ckpt)
    assert sorted(r["event_id"] for r in out2) == [5]
