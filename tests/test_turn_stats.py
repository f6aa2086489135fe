"""Streaming turn analytics: watermark semantics (late turns dropped,
bounded state) and checkpointed per-conversation state that RESUMES
across availableNow runs."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from bm25_pagerank_rpi_spark.streaming.incremental import stream_transcripts
from bm25_pagerank_rpi_spark.streaming.turn_stats import (
    conversation_state,
    windowed_turn_stats,
)


def _write(spark, path, rows):
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    df.coalesce(1).write.mode("append").parquet(path)


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2025, 1, 1, 10, minute)


def _run_until_done(sdf, ckpt, mode):
    """Run one availableNow pass; return every emitted row (the memory
    sink cannot recover from a checkpoint, foreachBatch can)."""
    rows = []

    def handle(batch, _bid):
        rows.extend(batch.collect())

    q = (
        sdf.writeStream.foreachBatch(handle)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rows


def test_windowed_stats_watermark_drops_late(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    _write(spark, in_dir, [
        ("c0", 0, "user", "alpha beta", "none", _ts(0)),
        ("c0", 1, "assistant", "gamma", "none", _ts(1)),
        ("c1", 0, "user", "delta epsilon zeta", "none", _ts(8)),
    ])
    stats = lambda: windowed_turn_stats(  # noqa: E731
        stream_transcripts(spark, in_dir), window="5 minutes", watermark="2 minutes"
    )
    out1 = _run_until_done(stats(), ckpt, "update")
    rows = {
        (r.window.start.minute, r.role): (r.n_turns, r.n_tokens) for r in out1
    }
    assert rows[(0, "user")] == (1, 2)
    assert rows[(0, "assistant")] == (1, 1)
    assert rows[(5, "user")] == (1, 3)

    # watermark after run 1 = 10:08 - 2min = 10:06, PAST the [10:00,10:05)
    # window's end -> that window's state is evicted; a late turn for it
    # must be DROPPED, while a turn for the still-open 10:05 window lands
    _write(spark, in_dir, [
        ("c2", 0, "user", "late late", "none", _ts(1)),        # too late
        ("c2", 1, "user", "ok", "none", _ts(7)),               # in horizon
    ])
    out2 = _run_until_done(stats(), ckpt, "update")
    rows2 = {
        (r.window.start.minute, r.role): (r.n_turns, r.n_tokens) for r in out2
    }
    # only the updated [10:05,10:10) window is re-emitted this run; the
    # dropped 10:01 row updates nothing
    assert (0, "user") not in rows2
    assert rows2[(5, "user")] == (2, 4)


def test_conversation_state_resumes_across_runs(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    _write(spark, in_dir, [
        ("c0", 0, "user", "alpha beta", "none", _ts(0)),
        ("c0", 1, "assistant", "gamma delta epsilon", "none", _ts(1)),
        ("c1", 0, "user", "zeta", "none", _ts(2)),
    ])
    conv = lambda: conversation_state(stream_transcripts(spark, in_dir))  # noqa: E731
    got = {r.conv_id: r for r in _run_until_done(conv(), ckpt, "update")}
    assert got["c0"].n_turns == 2 and got["c0"].n_tokens == 5
    assert got["c0"].max_turn_idx == 1
    assert got["c1"].n_turns == 1 and got["c1"].n_tokens == 1

    # second availableNow run: counters RESUME from the state store
    # (only the delta file is read), and untouched conversations emit
    # nothing
    _write(spark, in_dir, [
        ("c0", 2, "user", "eta theta", "none", _ts(3)),
    ])
    got2 = {r.conv_id: r for r in _run_until_done(conv(), ckpt, "update")}
    assert set(got2) == {"c0"}
    assert got2["c0"].n_turns == 3
    assert got2["c0"].n_tokens == 7
    assert got2["c0"].max_turn_idx == 2


def test_sessionized_stats_batch_islands(spark):
    from bm25_pagerank_rpi_spark.streaming.turn_stats import sessionized_stats

    # user 1: events at 10:00, 10:10, 10:45 with 15-min gap ->
    #   {10:00,10:10} (diff 10 <= 15) | {10:45} (diff 35 > 15)
    # user 2: single event; boundary: diff EXACTLY == gap still MERGES
    # (session_window's window end is inclusive for the next event)
    rows = [
        (1, _ts(0), 1.0),
        (1, _ts(10), 2.0),
        (1, _ts(45), 4.0),
        (2, _ts(5), 8.0),
        (3, _ts(0), 1.0),
        (3, _ts(15), 1.0),  # exactly 15 min later -> SAME session
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r.user_id, r.session_start.minute): (
            r.session_end_ts.minute,
            r.n_events,
            r.sum_value,
        )
        for r in sessionized_stats(ev, gap="15 minutes").collect()
    }
    assert got == {
        (1, 0): (10, 2, 3.0),
        (1, 45): (45, 1, 4.0),
        (2, 5): (5, 1, 8.0),
        (3, 0): (15, 2, 2.0),
    }


def test_sessionized_stats_streaming_matches_batch(spark, tmp_path):
    from bm25_pagerank_rpi_spark.streaming.turn_stats import sessionized_stats

    in_dir = str(tmp_path / "sess_in")
    ckpt = str(tmp_path / "sess_ckpt")
    rows = [
        (1, "u", "a", "none", _ts(0)),
        (1, "u", "b", "none", _ts(10)),
        (1, "u", "c", "none", _ts(45)),
        (2, "u", "d", "none", _ts(5)),
        # sentinel far in the future: append mode only emits a session
        # once the watermark passes its END, so without this the last
        # real session would stay open (correct streaming semantics)
        (99, "u", "z", "none", datetime.datetime(2025, 1, 2, 10, 0)),
    ]
    df = spark.createDataFrame(
        [(str(u), 0, r, t, tool, ts) for u, r, t, tool, ts in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    ).select(
        F.col("conv_id").cast("long").alias("user_id"),
        "ts",
        F.lit(1.0).alias("value"),
    )
    df.coalesce(1).write.parquet(in_dir)

    batch = sessionized_stats(
        spark.read.parquet(in_dir), gap="15 minutes"
    ).collect()

    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).parquet(in_dir)
    out = _run_until_done(
        sessionized_stats(stream, gap="15 minutes", watermark="0 seconds"),
        ckpt,
        "append",
    )
    key = lambda r: (r.user_id, r.session_start)  # noqa: E731
    real = lambda rs: sorted(key(r) for r in rs if r.user_id != 99)  # noqa: E731
    assert real(out) == real(batch)


# ---------------------------------------------------------------------------
# streaming percolation: saved searches over a live document stream
# ---------------------------------------------------------------------------


def test_streaming_percolate_batches(spark, tmp_path):
    """percolate() works unchanged per micro-batch inside foreachBatch —
    the alerting deployment shape (stored queries broadcast; each batch
    contributes its own matches; checkpoint resume is foreachBatch's)."""
    from bm25_pagerank_rpi_spark.operators.retrieval_plus import percolate

    in_dir = str(tmp_path / "perc_in")
    ckpt = str(tmp_path / "perc_ckpt")
    sq = spark.createDataFrame(
        [("alert_hash_join", "hash join"), ("alert_window", "window")],
        "query_id string, text string",
    )
    _write(spark, in_dir, [
        ("c0", 0, "user", "hash join plan", "none", _ts(0)),
        ("c0", 1, "user", "window frame", "none", _ts(1)),
    ])
    matches = []

    def handle(batch, _bid):
        docs = batch.selectExpr(
            "concat(conv_id, ':', turn_idx) AS doc_id", "text"
        )
        matches.extend(
            (r["doc_id"], r["query_id"]) for r in percolate(docs, sq).collect()
        )

    def run():
        q = (
            stream_transcripts(spark, in_dir)
            .writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    assert set(matches) == {
        ("c0:0", "alert_hash_join"), ("c0:1", "alert_window"),
    }
    # second batch: only NEW docs are percolated (checkpoint advanced)
    matches.clear()
    _write(spark, in_dir, [
        ("c1", 0, "user", "join only", "none", _ts(2)),
        ("c1", 1, "user", "hash join window", "none", _ts(3)),
    ])
    run()
    assert set(matches) == {
        ("c1:1", "alert_hash_join"), ("c1:1", "alert_window"),
    }


def test_windowed_term_counts_and_trending(spark, tmp_path):
    from bm25_pagerank_rpi_spark.streaming.turn_stats import (
        trending_terms,
        windowed_term_counts,
    )

    in_dir = str(tmp_path / "trend_in")
    ckpt = str(tmp_path / "trend_ckpt")
    _write(spark, in_dir, [
        ("c0", 0, "user", "alpha alpha beta", "none", _ts(0)),
        ("c0", 1, "user", "alpha gamma", "none", _ts(1)),
        ("c1", 0, "user", "beta beta beta", "none", _ts(6)),
    ])
    counts = windowed_term_counts(
        stream_transcripts(spark, in_dir), window="5 minutes", watermark="2 minutes"
    )
    rows = _run_until_done(counts, ckpt, "update")
    got = {(r["window"].start.minute, r["term"]): r["n"] for r in rows}
    assert got[(0, "alpha")] == 3
    assert got[(0, "beta")] == 1
    assert got[(0, "gamma")] == 1
    assert got[(5, "beta")] == 3
    # batch rank over the (closed) windows
    tdf = spark.createDataFrame(
        [r for r in rows], schema=counts.schema
    )
    top = trending_terms(tdf, k=1).collect()
    by_w = {r["window_start"].minute: r["term"] for r in top}
    assert by_w == {0: "alpha", 5: "beta"}
