"""reactor_window_like_flink_spark — a PySpark-native analytics engine.

A brand-new engine with the capability surface of the reference
``sofn/reactor-window-like-flink`` (see /root/repo/SURVEY.md), re-expressed
Spark-first: DataFrame/SQL logical plans optimized by Catalyst, Structured
Streaming for the windowed-stream core (the reference's
``WindowPublisher.java`` hybrid count-or-time window), plus the relational
and LLM-data-pipeline operator vocabulary declared in SURVEY.md §2 Part B.

Layout:
    session     SparkSession factory (AQE, shuffle sizing, UTC, Arrow)
    sources     batch table registry + streaming source builders
    operators   relational operators (scans, joins, aggregates, analytic)
    functions   scalar function surface + UDF/UDAF/UDTF + exact-math helpers
    streaming   event-time windows + the count-or-time WindowedPublisher
    llm         dedup / similarity / text-analysis pipeline operators
    plans       plan introspection (pushdown/broadcast assertions)
    contract    query-key registry consumed by __spark_entry__.py
"""

from reactor_window_like_flink_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
