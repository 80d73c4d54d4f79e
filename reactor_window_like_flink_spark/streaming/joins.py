"""Stream-stream and stream-static joins.

The reference delivers every window to one subscriber callback
(``WindowPublisher.java:132-150``); correlating two live streams is out of
its vocabulary entirely. Spark's watermarked interval join is the upgrade:
each purchase is matched to the clicks of the same user within a trailing
10-minute window, streaming-native, with state bounded by the watermark
(rows outside ``watermark + interval`` are evicted, so state is O(rate x
window), not O(history)).

Batch and stream share ONE expression tree (``_interval_join``): the batch
form is verified against the DuckDB oracle, the streaming form adds only
watermarks — same plan shape, so the oracle check covers the join
semantics and the streaming test covers state/late-data behavior.

Scale notes: a stream-stream join shuffles both sides by the equi key
(user_id) — the range predicate rides along as a post-join filter on the
co-partitioned state store, never a cross product. The stream-static
variant broadcasts the static dim per micro-batch, re-read each trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reactor_window_like_flink_spark.contract import Registry
from reactor_window_like_flink_spark.sources.tables import load

REG = Registry()

JOIN_INTERVAL = "10 minutes"


def _interval_join(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """purchases x clicks of the same user with click in the trailing
    10-minute interval — shared by the batch key and the stream builder."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    return p.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {JOIN_INTERVAL}"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
    ).select(
        "purchase_id",
        "click_id",
        "user_id",
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")
        ).alias("gap_s"),
    )


@REG.add(
    "q_stream_stream_join",
    """
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
           CAST(floor(epoch(p.ts)) - floor(epoch(c.ts)) AS BIGINT) AS gap_s
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 10 MINUTE
     AND c.ts <= p.ts
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click-to-purchase attribution join (batch form of the watermarked
    stream-stream interval join — identical expression tree)."""
    events = load(spark, sf_dir, "events")
    return _interval_join(
        events.filter(F.col("event_type") == "click"),
        events.filter(F.col("event_type") == "purchase"),
    )


def stream_interval_join(
    click_stream: DataFrame,
    purchase_stream: DataFrame,
    watermark: str = "20 minutes",
) -> DataFrame:
    """Streaming click/purchase attribution. Both sides are watermarked so
    the state store evicts clicks older than ``watermark + interval`` and
    purchases older than ``watermark`` — bounded state at any rate."""
    return _interval_join(
        click_stream.withWatermark("ts", watermark),
        purchase_stream.withWatermark("ts", watermark),
    )


def stream_static_join(
    event_stream: DataFrame, dim: DataFrame, on: str = "user_id"
) -> DataFrame:
    """Stream-static enrichment join: the static side is joined per
    micro-batch (re-planned each trigger, broadcast when small). No state
    store involved — the static side is the source of truth every batch."""
    return event_stream.join(F.broadcast(dim), on, "left")
