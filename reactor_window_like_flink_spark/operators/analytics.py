"""Behavioral-analytics operators over the ``events`` stream: ordered
funnel conversion and weekly cohort retention — the product-analytics
surface (Flink's CEP-lite / every warehouse's funnel dashboard) expressed
as two-level aggregations.

Scale shape: both operators reduce to ONE keyed shuffle on ``user_id``
with map-side partial combine (per-user conditional mins / first-seen),
followed by aggregation over O(users) or O(weeks²) rows. No window over
raw events, no self-join of the fact table, no per-event state.

Reference parity note: the reference engine (``WindowPublisher.java``) has
no analytics surface; north-star scope from BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reactor_window_like_flink_spark.contract import Registry
from reactor_window_like_flink_spark.sources.tables import load

REG = Registry()

FUNNEL_STAGES = ("view", "click", "purchase")
WEEK_SECONDS = 7 * 24 * 3600


def funnel(events: DataFrame, stages: tuple[str, ...]) -> DataFrame:
    """Strictly-ordered funnel: a user converts stage k iff their FIRST
    stage-k event happens after their first stage-(k-1) event (classic
    first-touch funnel semantics; re-ordering visits don't double count).

    One groupBy(user_id) computes every stage's first-event time as a
    conditional min (map-side combined, shuffle carries one row per user
    per map partition); the conversion ladder is then a pure expression
    over that per-user row and a single tiny global aggregate. Times
    compare at microsecond precision on both engines."""
    aggs = [
        F.min(F.when(F.col("event_type") == s, F.unix_micros("ts"))).alias(
            f"_t{k}"
        )
        for k, s in enumerate(stages)
    ]
    per_user = events.groupBy("user_id").agg(*aggs)
    converted = [F.col("_t0").isNotNull()]
    for k in range(1, len(stages)):
        converted.append(
            converted[k - 1] & (F.col(f"_t{k}") > F.col(f"_t{k - 1}"))
        )
    counts = per_user.agg(
        *[
            F.sum(c.cast("long")).alias(f"_n{k}")
            for k, c in enumerate(converted)
        ]
    )
    # rates derive on the single aggregate row BEFORE the unpivot — no
    # window, no second pass
    for k in range(len(stages)):
        counts = counts.withColumn(
            f"_r{k}",
            F.round(F.col(f"_n{k}") / F.col("_n0").cast("double"), 4),
        )
    stack_args = ", ".join(
        f"{k + 1}, '{s}', _n{k}, _r{k}" for k, s in enumerate(stages)
    )
    return counts.select(
        F.expr(
            f"stack({len(stages)}, {stack_args})"
            " AS (stage, stage_name, n_users, conv_rate)"
        )
    ).select(
        "stage",
        "stage_name",
        F.col("n_users").cast("long").alias("n_users"),
        "conv_rate",
    )


@REG.add(
    "q_funnel",
    f"""
    WITH m AS (
      SELECT user_id,
             min(epoch_us(ts)) FILTER (event_type = '{FUNNEL_STAGES[0]}') AS t0,
             min(epoch_us(ts)) FILTER (event_type = '{FUNNEL_STAGES[1]}') AS t1,
             min(epoch_us(ts)) FILTER (event_type = '{FUNNEL_STAGES[2]}') AS t2
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT CAST(count(*) FILTER (t0 IS NOT NULL) AS BIGINT) AS n0,
             CAST(count(*) FILTER (t0 IS NOT NULL AND t1 > t0) AS BIGINT) AS n1,
             CAST(count(*) FILTER (t0 IS NOT NULL AND t1 > t0 AND t2 > t1)
                  AS BIGINT) AS n2
      FROM m
    )
    SELECT 1 AS stage, '{FUNNEL_STAGES[0]}' AS stage_name, n0 AS n_users,
           ROUND(CAST(n0 AS DOUBLE) / n0, 4) AS conv_rate FROM c
    UNION ALL
    SELECT 2, '{FUNNEL_STAGES[1]}', n1, ROUND(CAST(n1 AS DOUBLE) / n0, 4) FROM c
    UNION ALL
    SELECT 3, '{FUNNEL_STAGES[2]}', n2, ROUND(CAST(n2 AS DOUBLE) / n0, 4) FROM c
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase first-touch funnel over events (see
    ``funnel``)."""
    return funnel(load(spark, sf_dir, "events"), FUNNEL_STAGES)


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: users grouped by the ISO week of their
    first event; for each (cohort_week, week_offset) cell, how many of
    the cohort's users were active that week.

    Shape: per-user first-seen aggregate (one user_id shuffle) joined
    back onto the per-(user, week) distinct activity — both sides
    pre-shrunk to O(users) / O(users × weeks) before the join, so the
    join never touches raw events. Week arithmetic is integer epoch
    division on week-truncated timestamps: exact and identical across
    engines under the UTC session contract."""
    first = events.groupBy("user_id").agg(
        F.min(F.unix_micros("ts")).alias("_first_us")
    )
    cohort = first.select(
        "user_id",
        (
            F.unix_timestamp(
                F.date_trunc("week", F.timestamp_micros(F.col("_first_us")))
            )
        ).alias("_cw"),
    )
    active = events.select(
        "user_id",
        F.unix_timestamp(F.date_trunc("week", "ts")).alias("_aw"),
    ).distinct()
    joined = active.join(cohort, "user_id")
    return (
        joined.groupBy(
            F.date_format(
                F.timestamp_seconds(F.col("_cw")), "yyyy-MM-dd"
            ).alias("cohort_week"),
            ((F.col("_aw") - F.col("_cw")) / WEEK_SECONDS)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


@REG.add(
    "q_cohort_retention",
    f"""
    WITH first AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cw
      FROM events GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events
    )
    SELECT strftime(f.cw, '%Y-%m-%d') AS cohort_week,
           CAST((epoch(a.aw) - epoch(f.cw)) / {WEEK_SECONDS} AS INT)
             AS week_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM active a JOIN first f USING (user_id)
    GROUP BY cohort_week, week_offset
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention grid over events (see
    ``cohort_retention``)."""
    return cohort_retention(load(spark, sf_dir, "events"))
