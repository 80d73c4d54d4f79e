"""Conservation tests — the reference's own correctness invariant
(``WindowPublisherTest.java:46``: every published element appears in
exactly one emitted window) translated to each windowing operator
(SURVEY.md §5.2 item 2)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from reactor_window_like_flink_spark.sources.tables import load


def _events_count(spark, sf_dir):
    return load(spark, sf_dir, "events").count()


def test_tumbling_no_loss(spark, sf_dir):
    """Every event lands in exactly one tumbling window."""
    total = _events_count(spark, sf_dir)
    agg = entry_mod.queries()["q_tumbling_window"](spark, sf_dir)
    assert agg.agg(F.sum("n_events")).first()[0] == total


def test_sliding_each_event_in_size_over_slide_windows(spark, sf_dir):
    """10-min windows sliding 5 min: every event in exactly 2 windows."""
    total = _events_count(spark, sf_dir)
    agg = entry_mod.queries()["q_sliding_window"](spark, sf_dir)
    assert agg.agg(F.sum("n_events")).first()[0] == 2 * total


def test_session_no_loss(spark, sf_dir):
    total = _events_count(spark, sf_dir)
    agg = entry_mod.queries()["q_session_window"](spark, sf_dir)
    assert agg.agg(F.sum("n_events")).first()[0] == total


def test_session_windows_disjoint_per_user(spark, sf_dir):
    """Sessions of one user never overlap: next start >= previous end - gap
    (end includes the +gap closure, so strict ordering is on starts)."""
    agg = entry_mod.queries()["q_session_window"](spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("session_start")
    overlap = (
        agg.withColumn("prev_end", F.lag("session_end").over(w))
        .filter(F.col("prev_end").isNotNull())
        # a new session only opens >= gap after the last event, and
        # prev_end = last_event + gap, so starts never precede prev_end - 0
        .filter(F.col("session_start") < F.col("prev_end") - 300)
    )
    assert overlap.count() == 0


def test_count_or_time_batches_invariants(spark, sf_dir):
    """The reference's exact A5 contract: no loss, max-size bound, no empty
    batches (``WindowPublisher.java:70-72``)."""
    total = _events_count(spark, sf_dir)
    batches = entry_mod.queries()["q_count_or_time_batches"](spark, sf_dir)
    stats = batches.agg(
        F.sum("n_events").alias("delivered"),
        F.max("n_events").alias("max_batch"),
        F.min("n_events").alias("min_batch"),
    ).first()
    assert stats["delivered"] == total  # assertEquals(itemCount, delivered)
    assert stats["max_batch"] <= 20  # flush at maxSize
    assert stats["min_batch"] >= 1  # filter(!it.isEmpty())
