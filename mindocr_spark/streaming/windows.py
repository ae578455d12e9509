"""windows — watermarked windowed aggregation + custom stateful
operators over unbounded streams.

The reference's bounded producer/consumer pipeline has no late-data
notion (its queues preserve arrival order, parallel_pipeline.py:29-37);
the unbounded generalization needs exactly these two Spark primitives:

- :func:`windowed_counts_stream` — tumbling-window counts with a
  watermark: late events beyond the watermark are dropped, state is
  bounded (the streaming twin of `q_windowed_counts`).
- :func:`running_session_stats` — applyInPandasWithState: a custom
  per-key stateful operator (running session count with gap timeout) —
  the streaming re-expression of the CollectNode's per-doc partial-state
  bookkeeping (reference: collect_node.py:72-99, `image_sub_remaining`
  counters held until a doc completes).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def read_events_stream(spark, path: str, max_files: int | None = None) -> DataFrame:
    r = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files:
        r = r.option("maxFilesPerTrigger", max_files)
    return r.parquet(path)


def windowed_counts_stream(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window per-type counts with bounded state: the watermark
    lets Spark finalize+evict windows older than max(event time) −
    watermark; events arriving later than that are dropped (late-data
    policy). State size is O(active windows), not O(stream)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


_SESSION_STATE = "last_sec long, n_sessions int"
_SESSION_OUT = "user_id bigint, n_events int, n_sessions int"

SESSION_GAP_SEC = 1800


def _session_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user running sessionization: counts sessions split by >30 min
    gaps across micro-batches — state carries (last event sec, session
    count) between triggers."""
    last_sec, n_sessions = state.get if state.exists else (None, 0)
    # gather ALL Arrow chunks first, then sort once — a group can span
    # chunks, and per-chunk sorting would process events out of time
    # order (wrong session count, corrupted last_sec)
    all_secs: list = []
    for pdf in pdfs:
        all_secs.append(
            pdf["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000_000
        )
    secs = pd.concat(all_secs).sort_values() if all_secs else pd.Series([], dtype="int64")
    n_events = 0
    for s in secs:
        s = int(s)
        if last_sec is None or s - last_sec > SESSION_GAP_SEC:
            n_sessions += 1
        last_sec = s
        n_events += 1
    state.update((last_sec, n_sessions))
    yield pd.DataFrame(
        [dict(user_id=key[0], n_events=n_events, n_sessions=n_sessions)]
    )


def running_session_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running (events, sessions)
    emitted each micro-batch. Arrow-batched state function; state is one
    tuple per user — bounded and shuffle-partitioned by key."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=_SESSION_OUT,
            stateStructType=_SESSION_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_events_stream(
    events: DataFrame,
    watermark: str = "30 minutes",
    keys: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Watermark-scoped exactly-once dedup for at-least-once upstreams
    (crawler refetches, queue replays re-deliver the same record
    across micro-batches): keep ONE copy per key while Spark EVICTS
    seen-key state older than max(event time) − watermark. State is
    O(keys inside the watermark horizon), not O(stream history) — the
    Bloom-gate space/recall tradeoff made native: exact inside the
    horizon, and beyond it the upstream contract (a replay never lags
    the original by more than the watermark) carries the guarantee.

    Reference analog: the CollectNode drops re-delivered sub-results
    for an already-completed image (reference:
    deploy/py_infer/src/parallel/module/common/collect_node.py) —
    same idempotence, bounded by completion instead of time."""
    return events.withWatermark(
        "ts", watermark
    ).dropDuplicatesWithinWatermark(list(keys))


def run_stream_to_parquet(df: DataFrame, path: str, checkpoint: str,
                          output_mode: str = "update") -> None:
    """Drain the stream into parquet via foreachBatch, tagging rows with
    the micro-batch id. foreachBatch supports checkpoint recovery (the
    memory sink does not) AND update-mode output; the latest row per key
    = max(batch_id).

    Writes are IDEMPOTENT: foreachBatch is at-least-once, so a replayed
    micro-batch after a crash overwrites its own `batch_id=N` directory
    instead of appending duplicates; readers of `path` get `batch_id`
    back as a discovered partition column."""

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        bdf.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    (
        df.writeStream.foreachBatch(write_batch)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def session_windows_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Native streaming SESSION windows (`F.session_window`): per-user
    sessions that merge any events whose [ts, ts+gap) windows overlap
    — the dynamic-length counterpart of `windowed_counts_stream`'s
    tumbling windows, and the streaming twin of the batch lag/cumsum
    sessionize. A boundary event at exactly prev+gap DOES merge
    (Spark treats the session extent as closed at the gap boundary —
    verified by pytest, not assumed) — the batch oracle mirrors that
    with ``diff > gap`` as the session break.

    State is one open session per active user key, merged by Spark's
    session-window state store; the watermark finalizes+evicts
    sessions once event time passes session_end + watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            F.col("n_events").cast("bigint").alias("n_events"),
        )
    )


def drain_to_memory(
    df: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drain a finite stream through the memory sink with an
    availableNow trigger and hand back the materialized batch table —
    the harness-facing bridge that lets a STREAMING operator answer a
    batch oracle. Fixture-scale only by design (the memory sink
    collects to the driver): production drains via
    `run_stream_to_parquet`'s idempotent foreachBatch."""
    (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return df.sparkSession.table(name)
