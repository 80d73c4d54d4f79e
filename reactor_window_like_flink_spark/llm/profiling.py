"""Dataset profiling operators: per-column quality stats and fixed-width
value histograms — the "look at your data before you train on it" passes
of a large-scale pipeline (null-rate drift, cardinality explosions,
value-distribution shifts between crawl snapshots).

Scale shape: both operators are single-pass aggregations whose outputs are
O(columns) / O(buckets) rows regardless of input size. ``profile_columns``
computes every per-column stat in ONE aggregate (Spark plans the multiple
count-distincts via expand — ~(n_cols+1)× the scan rows through a
map-side-combined hash aggregate, never a per-column rescan); the wide
1-row result is then unpivoted driver-free with ``stack``. At 100 TB the
exact count-distinct expand is the oracle-exact form; the production swap
is ``approx_count_distinct`` (HLL, one pass, no expand), which drops the
expand factor entirely and is noted per-stat below.

Reference parity note: the reference engine (``WindowPublisher.java``) has
no profiling surface; north-star scope from BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reactor_window_like_flink_spark.contract import Registry
from reactor_window_like_flink_spark.sources.tables import load

REG = Registry()

# Histogram contract: fixed bounds keep the pass single-scan (a data-driven
# min/max would add a tiny 1-row pre-pass; fixed bounds are what a
# production pipeline pins in config so histograms compare across runs).
HIST_LO = 0.0
HIST_WIDTH = 5_000.0
HIST_BUCKETS = 22  # covers l_extendedprice's [901, 104998] domain


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-format per-column profile: (column, n_rows, n_nulls,
    n_distinct, min_val, max_val) with min/max cast to string so the
    schema is uniform across column types.

    One wide aggregate (4 stats x n_cols, single scan) unpivoted with
    ``stack`` — no driver-side loop over columns, no per-column job."""
    aggs = [F.count("*").alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nn_{c}"),
            F.countDistinct(c).alias(f"_nd_{c}"),
            F.min(c).cast("string").alias(f"_mn_{c}"),
            F.max(c).cast("string").alias(f"_mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}, _mn_{c}, _mx_{c}" for c in cols
    )
    return wide.select(
        F.col("_n").cast("long").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args})"
            " AS (column, n_nulls, n_distinct, min_val, max_val)"
        ),
    ).select(
        "column",
        "n_rows",
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_val",
        "max_val",
    )


@REG.add(
    "q_profile_stats",
    """
    WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM documents)
    SELECT 'lang' AS "column", n.n_rows,
           CAST(count(*) FILTER (lang IS NULL) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_distinct,
           CAST(min(lang) AS VARCHAR) AS min_val,
           CAST(max(lang) AS VARCHAR) AS max_val
    FROM documents, n GROUP BY n.n_rows
    UNION ALL
    SELECT 'source', n.n_rows,
           CAST(count(*) FILTER (source IS NULL) AS BIGINT),
           CAST(count(DISTINCT source) AS BIGINT),
           CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
    FROM documents, n GROUP BY n.n_rows
    UNION ALL
    SELECT 'n_chars', n.n_rows,
           CAST(count(*) FILTER (n_chars IS NULL) AS BIGINT),
           CAST(count(DISTINCT n_chars) AS BIGINT),
           CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
    FROM documents, n GROUP BY n.n_rows
    """,
)
def q_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-quality profile of ``documents`` (lang, source, n_chars):
    null counts, exact distinct cardinality, min/max — the pre-training
    sanity pass. Production swap at 100 TB: ``approx_count_distinct``
    instead of exact (drops the expand; documented in the module doc)."""
    docs = load(spark, sf_dir, "documents")
    return profile_columns(docs, ["lang", "source", "n_chars"])


def histogram(df: DataFrame, col: str, lo: float, width: float, n: int) -> DataFrame:
    """Fixed-width value histogram: one map-side-combined aggregate to
    O(n) rows. Out-of-range values clamp into the edge buckets so mass is
    conserved (a production run alerts on edge-bucket growth)."""
    x = F.col(col).cast("double")
    bucket = F.greatest(
        F.lit(0),
        F.least(F.lit(n - 1), F.floor((x - F.lit(lo)) / F.lit(width)).cast("int")),
    )
    return (
        df.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.round(F.sum(x), 2).alias("sum_val"),
        )
        .select(
            "bucket",
            F.round(F.lit(lo) + F.col("bucket") * F.lit(width), 2).alias("bucket_lo"),
            "n_rows",
            "sum_val",
        )
    )


@REG.add(
    "q_histogram",
    f"""
    SELECT bucket,
           ROUND({HIST_LO} + bucket * {HIST_WIDTH}, 2) AS bucket_lo,
           CAST(count(*) AS BIGINT) AS n_rows,
           ROUND(sum(CAST(l_extendedprice AS DOUBLE)), 2) AS sum_val
    FROM (
      SELECT l_extendedprice,
             GREATEST(0, LEAST({HIST_BUCKETS - 1},
               CAST(FLOOR((CAST(l_extendedprice AS DOUBLE) - {HIST_LO})
                          / {HIST_WIDTH}) AS INT))) AS bucket
      FROM lineitem
    ) GROUP BY bucket
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """22-bucket fixed-width histogram of ``l_extendedprice`` — the
    distribution-drift monitor; single aggregate, 22-row output at any
    scale."""
    li = load(spark, sf_dir, "lineitem")
    return histogram(li, "l_extendedprice", HIST_LO, HIST_WIDTH, HIST_BUCKETS)


OUTLIER_Z = 2.5  # |z| at/above this flags the row


def zscore_outliers(df: DataFrame, key: str, val: str) -> DataFrame:
    """Rows whose ``val`` deviates from their group's mean by more than
    ``OUTLIER_Z`` sample standard deviations — the statistical
    quality-filter pass (drop corrupt metric rows before training).

    Two-step shape: a tiny per-group (mean, stddev) aggregate — O(groups)
    rows, map-side combined — broadcast-joined back onto the scan, then a
    pure per-row predicate. The fact side never shuffles; at 100 TB this
    is one narrow pass plus an O(groups) broadcast."""
    stats = df.groupBy(key).agg(
        F.avg(val).alias("_m"), F.stddev_samp(val).alias("_sd")
    )
    # zero-variance groups have no outliers by definition; dropping them
    # here also keeps the division ANSI-safe (x/0 raises under ANSI mode)
    stats = stats.filter(F.col("_sd") > 0)
    z = (F.col(val) - F.col("_m")) / F.col("_sd")
    return (
        df.join(F.broadcast(stats), key)
        .filter(F.abs(z) > OUTLIER_Z)
        .select(
            "event_id",
            key,
            val,
            F.round(z, 3).alias("z"),
        )
    )


@REG.add(
    "q_outliers",
    f"""
    WITH s AS (
      SELECT event_type, avg(value) AS m, stddev_samp(value) AS sd
      FROM events GROUP BY event_type
      HAVING stddev_samp(value) > 0
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - s.m) / s.sd, 3) AS z
    FROM events e JOIN s USING (event_type)
    WHERE abs((e.value - s.m) / s.sd) > {OUTLIER_Z}
    """,
)
def q_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outliers over ``events.value`` (see
    ``zscore_outliers``)."""
    return zscore_outliers(load(spark, sf_dir, "events"), "event_type", "value")


# Robust (MAD) outlier contract: the Iglewicz-Hoaglin modified z-score —
# 0.6745 * (x - median) / MAD — flags at the standard 3.5 cutoff. Unlike
# the mean/stddev z-score above, one corrupt heavy row cannot drag the
# center/scale estimate and mask itself (50% breakdown point vs 0%).
MAD_SCALE = 0.6745
MAD_CUTOFF = 3.5


@REG.add(
    "q_anomaly_mad",
    f"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type
      HAVING quantile_cont(abs(e.value - m.med), 0.5) > 0
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND({MAD_SCALE} * (e.value - m.med) / d.mad, 3) AS mz
    FROM events e
    JOIN med m USING (event_type)
    JOIN mad d USING (event_type)
    WHERE abs({MAD_SCALE} * (e.value - m.med) / d.mad) > {MAD_CUTOFF}
    """,
)
def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection via the MAD modified z-score
    (Iglewicz & Hoaglin 1993): |{MAD_SCALE}*(x - median)/MAD| > {MAD_CUTOFF}
    over ``events.value`` per event_type — the quality filter that stays
    calibrated even when the contamination itself is extreme.

    Scale shape: two tiny O(groups) aggregates (median, then MAD of
    absolute deviations) each broadcast back onto the scan; the fact side
    never shuffles. Exact ``percentile`` keeps the oracle bit-matched; the
    100 TB swap is ``percentile_approx`` (mergeable sketch, no per-group
    sort), same as q_agg_quantile. Zero-MAD groups (>50% of rows at one
    value) are dropped — no deviation is measurable there and the division
    stays ANSI-safe."""
    events = load(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    with_med = events.join(F.broadcast(med), "event_type")
    mad = (
        with_med.groupBy("event_type")
        .agg(F.expr("percentile(abs(value - med), 0.5)").alias("mad"))
        .filter(F.col("mad") > 0)
    )
    mz = F.lit(MAD_SCALE) * (F.col("value") - F.col("med")) / F.col("mad")
    return (
        with_med.join(F.broadcast(mad), "event_type")
        .filter(F.abs(mz) > MAD_CUTOFF)
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(mz, 3).alias("mz"),
        )
    )


# Numeric-column correlation battery for the fact table. The +0.0 after
# rounding normalizes IEEE -0.0 (a near-zero correlation can round to
# negative zero in one engine and positive zero in the other).
CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@REG.add(
    "q_corr_matrix",
    "\nUNION ALL\n".join(
        f"""
    SELECT '{x}' AS col_x, '{y}' AS col_y,
           ROUND(corr({x}, {y}), 4) + 0.0 AS pearson_r
    FROM lineitem"""
        for i, x in enumerate(CORR_COLS)
        for y in CORR_COLS[i + 1 :]
    ),
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations among the lineitem numeric measures
    — the feature-redundancy / leakage screen run before any model sees
    the table (a |r| ~ 1 pair means one column is derivable from the
    other and should be dropped or flagged).

    Scale shape: ONE wide aggregate computes all C(n,2) co-moment pairs
    in a single scan (Spark's corr is a streaming one-pass co-moment
    update, map-side combined — no per-pair rescan, no row materialization
    of pairs), then a ``stack`` unpivot emits the O(n^2) tidy rows from
    the 1-row wide result. Adding a column costs n more expressions on
    the same scan, never another pass."""
    li = load(spark, sf_dir, "lineitem")
    pairs = [
        (x, y)
        for i, x in enumerate(CORR_COLS)
        for y in CORR_COLS[i + 1 :]
    ]
    wide = li.agg(
        *[
            (F.round(F.corr(x, y), 4) + F.lit(0.0)).alias(f"_c_{i}")
            for i, (x, y) in enumerate(pairs)
        ]
    )
    stack_args = ", ".join(
        f"'{x}', '{y}', _c_{i}" for i, (x, y) in enumerate(pairs)
    )
    return wide.select(
        F.expr(
            f"stack({len(pairs)}, {stack_args}) AS (col_x, col_y, pearson_r)"
        )
    )
