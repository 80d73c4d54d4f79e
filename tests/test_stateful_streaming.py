"""Live-stream count-or-time flush: count path, timeout path, and the
no-loss invariant, on a real Structured Streaming query.

Note: these tests poll the memory sink instead of calling
``processAllAvailable()`` — with a ProcessingTimeTimeout armed, the
scheduler keeps planning no-data batches to fire timeouts, so
"all available processed" never settles.
"""

from __future__ import annotations

import time

from reactor_window_like_flink_spark.streaming.publisher import FileStreamInput
from reactor_window_like_flink_spark.streaming.stateful import (
    count_or_time_stateful,
)

SCHEMA = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"


def _rows(user: int, n: int, start: int = 0):
    from datetime import datetime, timezone

    return [
        (start + i, datetime(2024, 1, 1, tzinfo=timezone.utc), user, "e", 1.0)
        for i in range(n)
    ]


def _poll(predicate, timeout_s: float = 90.0, step: float = 0.5):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        result = predicate()
        if result:
            return result
        time.sleep(step)
    return predicate()


def test_count_timeout_and_conservation(spark, tmp_path):
    src = FileStreamInput(spark, SCHEMA, str(tmp_path / "in"))
    out = count_or_time_stateful(src.stream(), max_size=10, duration_seconds=2.0)
    query = (
        out.writeStream.format("memory")
        .queryName("t_cot")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # 35 rows for user 1: the count path must flush 3 full batches of
        # 10 immediately; the held 5 must flush via the timeout path once
        # the 2s window elapses — no further input required.
        src.publish(_rows(user=1, n=35))

        sized = _poll(
            lambda: (
                r
                if len(
                    r := spark.sql(
                        "SELECT * FROM t_cot WHERE flush_reason = 'size'"
                    ).collect()
                )
                >= 3
                else None
            )
        )
        assert sorted(r["n_events"] for r in sized) == [10, 10, 10]

        timed = _poll(
            lambda: spark.sql(
                "SELECT * FROM t_cot WHERE flush_reason = 'timeout'"
            ).collect()
        )
        assert [r["n_events"] for r in timed] == [5]

        # conservation (the reference's own invariant): 35 in, 35 out,
        # every batch within (0, max_size]
        all_rows = spark.sql("SELECT * FROM t_cot WHERE key = 1").collect()
        assert sum(r["n_events"] for r in all_rows) == 35
        assert max(r["n_events"] for r in all_rows) <= 10
        assert min(r["n_events"] for r in all_rows) >= 1
        assert sorted(r["batch_seq"] for r in all_rows) == [0, 1, 2, 3]
    finally:
        query.stop()


def test_trickle_still_time_flushes(spark, tmp_path):
    """Opened-based flush-on-time: under a steady sub-max_size trickle
    arriving faster than the window duration, a batch must still flush
    ~duration after it opened. (Inactivity-reset timing — re-arming the
    full duration on every arrival — never fires here, leaving latency
    unbounded; this is the reference's bufferTimeout contract.)"""
    src = FileStreamInput(spark, SCHEMA, str(tmp_path / "in"))
    out = count_or_time_stateful(src.stream(), max_size=100, duration_seconds=2.0)
    query = (
        out.writeStream.format("memory")
        .queryName("t_trickle")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        published = 0
        saw_mid_trickle = False
        deadline = time.time() + 45.0
        while time.time() < deadline:
            src.publish(_rows(user=7, n=2, start=published))
            published += 2
            if (
                spark.sql(
                    "SELECT count(*) c FROM t_trickle WHERE flush_reason = 'timeout'"
                ).collect()[0]["c"]
                > 0
            ):
                saw_mid_trickle = True  # fired while arrivals kept coming
                break
            time.sleep(0.5)
        assert saw_mid_trickle, "no timeout flush fired during a steady trickle"
        flushed = spark.sql(
            "SELECT * FROM t_trickle WHERE flush_reason = 'timeout'"
        ).collect()
        assert all(0 < r["n_events"] < 100 for r in flushed)
        # conservation: once quiet, the remaining open batch time-flushes too
        assert _poll(
            lambda: (
                spark.sql("SELECT sum(n_events) s FROM t_trickle").collect()[0]["s"]
                or 0
            )
            == published
        )
    finally:
        query.stop()


def test_idle_state_ttl_evicts_and_resets_seq(spark, tmp_path):
    """With idle_state_ttl_seconds, a key idle past the TTL after its
    last flush is evicted from the state store — bounded state for
    unbounded key spaces — and its batch_seq restarts at 0 on return
    (the documented trade; without the TTL, existing tests pin the
    monotonic 0,1,2,... sequence)."""
    src = FileStreamInput(spark, SCHEMA, str(tmp_path / "in"))
    out = count_or_time_stateful(
        src.stream(),
        max_size=10,
        duration_seconds=1.0,
        idle_state_ttl_seconds=3.0,
    )
    query = (
        out.writeStream.format("memory")
        .queryName("t_ttl")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        src.publish(_rows(user=1, n=10))  # exactly one count-path flush
        first = _poll(
            lambda: spark.sql(
                "SELECT * FROM t_ttl WHERE flush_reason = 'size'"
            ).collect()
        )
        assert [r["batch_seq"] for r in first] == [0]
        # idle well past the TTL: the armed timeout keeps no-data batches
        # coming, so the eviction fires without further input
        time.sleep(8.0)
        src.publish(_rows(user=1, n=10, start=100))
        both = _poll(
            lambda: (
                r
                if len(
                    r := spark.sql(
                        "SELECT * FROM t_ttl WHERE flush_reason = 'size'"
                    ).collect()
                )
                >= 2
                else None
            )
        )
        # state was evicted in between: the second flush restarts at 0
        assert [r["batch_seq"] for r in both] == [0, 0]
        assert sum(r["n_events"] for r in both) == 20
    finally:
        query.stop()


def test_late_data_dropped_by_watermark(spark, tmp_path):
    """Key 44: events older than the watermark never reach the aggregate
    (the deterministic upgrade over the reference's no-watermark design)."""
    from datetime import datetime, timezone

    from reactor_window_like_flink_spark.streaming.windows import stream_tumbling

    def ts(hour, minute):
        return datetime(2024, 1, 1, hour, minute, tzinfo=timezone.utc)

    src = FileStreamInput(spark, SCHEMA, str(tmp_path / "in"))
    out = stream_tumbling(src.stream(), watermark="10 minutes")
    query = (
        out.writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        src.publish([(1, ts(10, 0), 1, "click", 1.0), (2, ts(10, 2), 1, "click", 1.0)])
        query.processAllAvailable()
        # advance event time far past the first window + watermark,
        # finalizing the 10:00 window
        src.publish([(3, ts(12, 0), 1, "click", 1.0)])
        query.processAllAvailable()
        # a very late event for the long-finalized 10:00 window: dropped
        src.publish([(4, ts(10, 1), 1, "click", 99.0)])
        query.processAllAvailable()
        src.publish([(5, ts(14, 0), 1, "click", 1.0)])  # close the 12:00 window
        query.processAllAvailable()
        rows = spark.sql("SELECT * FROM t_late").collect()
        by_window = {r["window_start"]: r["n_events"] for r in rows}
        first_window = int(ts(10, 0).timestamp())
        assert by_window.get(first_window) == 2  # late event NOT counted
    finally:
        query.stop()
