"""Streaming windowed aggregation (watermark/late-data) + custom
stateful operator (applyInPandasWithState) over a file-source stream."""

import datetime as dt

import pytest

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def _events(spark, rows, start_id=0):
    from mindocr_spark.streaming.windows import EVENTS_SCHEMA

    data = [
        (start_id + i, T0 + dt.timedelta(seconds=sec), uid, etype, float(v), "{}")
        for i, (sec, uid, etype, v) in enumerate(rows)
    ]
    return spark.createDataFrame(data, EVENTS_SCHEMA)


def test_windowed_counts_with_watermark_drops_late(spark, tmp_path):
    from mindocr_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_parquet,
        windowed_counts_stream,
    )

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    # batch 1: events up to t=2h establish watermark at 2h - 30min
    _events(spark, [
        (0, 1, "click", 1), (600, 1, "click", 1),       # window [0h,1h)
        (3700, 2, "view", 2), (7200, 2, "view", 2),     # [1h,2h) and [2h,3h)
    ]).write.mode("append").parquet(src)
    q = windowed_counts_stream(read_events_stream(spark, src))
    run_stream_to_parquet(q, out, ckpt, output_mode="append")

    # batch 2: one VERY late event (t=5min < watermark) must be dropped;
    # plus enough future events to finalize every earlier window
    _events(spark, [
        (300, 9, "click", 1),          # late → dropped
        (7300, 9, "view", 1),          # in-time, [2h,3h)
        (6 * 3600, 9, "tick", 1),      # advances watermark past 3h
    ], start_id=100).write.mode("append").parquet(src)
    run_stream_to_parquet(q, out, ckpt, output_mode="append")
    run_stream_to_parquet(q, out, ckpt, output_mode="append")  # flush finalized

    rows = spark.read.parquet(out).collect()
    got = {}
    for r in rows:
        got[(r["window_start"], r["event_type"])] = (
            got.get((r["window_start"], r["event_type"]), 0) + r["n_events"]
        )
    # finalized [0h,1h) click window: exactly the 2 on-time events — the
    # late batch-2 event never re-opened it
    assert got[(T0, "click")] == 2
    # in-time [2h,3h) view events both counted once finalized
    assert got[(T0 + dt.timedelta(hours=2), "view")] == 2


def test_stateful_sessionize_across_batches(spark, tmp_path):
    from pyspark.sql import functions as F
    from mindocr_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_parquet,
        running_session_stats,
    )

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    # batch 1: user 1 → two events 10 s apart (1 session);
    #          user 2 → two events 2 h apart (2 sessions)
    _events(spark, [
        (0, 1, "a", 1), (10, 1, "a", 1),
        (0, 2, "a", 1), (7200, 2, "a", 1),
    ]).write.mode("append").parquet(src)
    q = running_session_stats(read_events_stream(spark, src))
    run_stream_to_parquet(q, out, ckpt)
    latest = {
        r["user_id"]: r
        for r in spark.read.parquet(out)
        .withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("user_id").orderBy(F.col("batch_id").desc())
            ),
        )
        .where("rn = 1")
        .collect()
    }
    assert latest[1]["n_sessions"] == 1
    assert latest[2]["n_sessions"] == 2

    # batch 2: user 1 returns after a 3 h gap → state carries across
    # micro-batches and opens session #2
    _events(spark, [(7200 + 3 * 3600, 1, "a", 1)], start_id=50).write.mode(
        "append"
    ).parquet(src)
    run_stream_to_parquet(q, out, ckpt)
    rows = spark.read.parquet(out).where("user_id = 1").collect()
    final = max(rows, key=lambda r: r["batch_id"])
    assert final["n_sessions"] == 2            # gap crossed the batch boundary
    assert final["n_events"] == 1              # only the new event this batch


def test_stream_matches_batch_counts(spark, tmp_path):
    """Streaming windowed agg over a static dir equals the batch
    computation for every finalized window — the availableNow bounded-
    drain contract."""
    from pyspark.sql import functions as F
    from mindocr_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_parquet,
        windowed_counts_stream,
    )

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    ev = _events(spark, [(i * 300, i % 3, "t", 1) for i in range(40)])
    ev.write.mode("append").parquet(src)
    q = windowed_counts_stream(read_events_stream(spark, src))
    run_stream_to_parquet(q, out, ckpt, output_mode="append")
    streamed = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        (r["ws"], r["event_type"]): r["n"]
        for r in ev.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        ).agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n").collect()
    }
    assert streamed  # at least the fully-passed windows were finalized
    for key, n in streamed.items():
        assert batch[key] == n


def test_stream_dedup_within_watermark(spark, tmp_path):
    from mindocr_spark.streaming.windows import (
        dedup_events_stream,
        read_events_stream,
        run_stream_to_parquet,
    )

    src, out, ckpt = (str(tmp_path / d) for d in ("sd", "od", "cd"))
    # batch 1: e0, e1
    _events(spark, [(0, 1, "a", 1), (10, 2, "a", 1)]).write.mode(
        "append"
    ).parquet(src)
    q = dedup_events_stream(read_events_stream(spark, src),
                            watermark="30 minutes")
    run_stream_to_parquet(q, out, ckpt, output_mode="append")

    # batch 2: e0 re-delivered (same event_id, within the watermark) —
    # must be dropped even though it arrives in a LATER micro-batch —
    # plus a genuinely new e100
    _events(spark, [(0, 1, "a", 1)]).write.mode("append").parquet(src)
    _events(spark, [(60, 3, "b", 1)], start_id=100).write.mode(
        "append"
    ).parquet(src)
    run_stream_to_parquet(q, out, ckpt, output_mode="append")

    rows = spark.read.parquet(out).collect()
    ids = sorted(r["event_id"] for r in rows)
    assert ids == [0, 1, 100]  # exactly-once: the replay vanished


def test_session_windows_merge_across_micro_batches(spark, tmp_path):
    """A session split across two files (one file per micro-batch) must
    merge into ONE session via the session-window state store; a gap
    > the 30-min session gap must split; a boundary event at exactly
    prev+gap MERGES (Spark's session extent is closed at the gap
    boundary — this test pins that semantic for the batch oracle)."""
    from mindocr_spark.streaming.windows import (
        drain_to_memory,
        read_events_stream,
        session_windows_stream,
    )

    src = str(tmp_path / "src")
    # file 1: user 1 events at t=0 and t=600
    _events(spark, [(0, 1, "click", 1), (600, 1, "view", 1)]
            ).coalesce(1).write.mode("append").parquet(src)
    # file 2: user 1 at t=1200 (merges: 600+1800 > 1200); at t=3001
    # (> 1200+1800=3000 → new session); user 3 at t=0 and t=1800
    # exactly → the closed-boundary MERGE case
    _events(spark, [
        (1200, 1, "click", 1), (3001, 1, "click", 1),
        (0, 3, "view", 1), (1800, 3, "view", 1),
    ], start_id=100).coalesce(1).write.mode("append").parquet(src)

    out = drain_to_memory(
        session_windows_stream(
            read_events_stream(spark, src, max_files=1)),
        "sess_merge_test", "complete",
    ).collect()
    by_user = {}
    for r in sorted(out, key=lambda r: (r["user_id"], r["session_start"])):
        by_user.setdefault(r["user_id"], []).append(r)
    u1 = by_user[1]
    assert [r["n_events"] for r in u1] == [3, 1]
    assert u1[0]["session_start"] == T0
    assert u1[0]["session_end"] == T0 + dt.timedelta(seconds=1200 + 1800)
    u3 = by_user[3]
    assert [r["n_events"] for r in u3] == [2]  # exact-gap boundary merges
    assert u3[0]["session_end"] == T0 + dt.timedelta(seconds=1800 + 1800)


def test_stream_stream_join_state_spans_micro_batches(spark, tmp_path):
    """A view in micro-batch 1 must match a purchase arriving in
    micro-batch 2 (join state carried across triggers); a purchase
    outside the 1-hour interval must not match."""
    import pyspark.sql.functions as F

    from mindocr_spark.streaming.windows import (
        drain_to_memory,
        read_events_stream,
    )

    src = str(tmp_path / "src")
    _events(spark, [(0, 1, "view", 1)]
            ).coalesce(1).write.mode("append").parquet(src)
    _events(spark, [
        (1800, 1, "purchase", 1),   # inside the hour -> match
        (7200, 1, "purchase", 1),   # 2h later -> no match
    ], start_id=50).coalesce(1).write.mode("append").parquet(src)

    views = (read_events_stream(spark, src, max_files=1)
             .where(F.col("event_type") == "view")
             .select(F.col("user_id").alias("v_user"),
                     F.col("event_id").alias("view_id"),
                     F.col("ts").alias("v_ts"))
             .withWatermark("v_ts", "2 hours"))
    purchases = (read_events_stream(spark, src, max_files=1)
                 .where(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("p_user"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("p_ts"))
                 .withWatermark("p_ts", "2 hours"))
    joined = views.join(purchases, F.expr(
        "v_user = p_user AND p_ts >= v_ts"
        " AND p_ts <= v_ts + INTERVAL 1 HOUR"))
    out = drain_to_memory(
        joined.select("view_id", "purchase_id"),
        "ssj_state_test", "append").collect()
    assert [(r["view_id"], r["purchase_id"]) for r in out] == [(0, 50)]
