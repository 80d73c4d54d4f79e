"""Z-order (Morton-curve) data layout for multi-dimensional file skipping.

Parquet scans prune files/row-groups by min-max footer stats. Sorting by
one column gives perfect pruning on that column and NONE on any other; at
100 TB, where a table serves point/range filters on several columns
(user_id AND date, custkey AND orderdate), the standard fix is Z-ordering:
interleave the bits of the columns' bucket ranks so rows close on the
Morton curve are close on EVERY dimension, and each written file covers a
narrow min-max range of ALL clustered columns (Delta Lake OPTIMIZE ZORDER
BY / Databricks liquid clustering; the reference engine has no storage
layout surface — north-star scope).

Implementation is Spark-native end to end: per-column [min, max] comes
from one tiny global aggregate (two scalars per column collected
driver-side — index-side metadata, same class as IVF centroid ids);
bucket rank is the built-in ``width_bucket``; the bit interleave is a
16-step higher-order ``aggregate`` over JVM longs; the physical layout is
``repartitionByRange`` on the z-value (range exchange = the same shuffle a
global sort pays) + ``sortWithinPartitions`` so row groups inside each
file stay tight. No Python in the row path.

Uniform-width buckets (not quantiles) keep the rank computation a pure
expression; heavily skewed columns would use ``approxQuantile`` buckets
instead — same interleave, different boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 16 bits per dimension: 65k buckets per column, z fits in a long for 2-4
# columns (16*4 = 64 bits).
ZORDER_BITS = 16


def zorder_value(df: DataFrame, cols: list[str]) -> DataFrame:
    """Append a ``_z`` column: the Morton interleave of each column's
    ``width_bucket`` rank over its global [min, max]. Columns must be
    numeric / date / timestamp (anything castable to double)."""
    if not 2 <= len(cols) <= 64 // ZORDER_BITS:
        raise ValueError(
            f"zorder needs 2..{64 // ZORDER_BITS} columns, got {len(cols)}"
        )
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"min_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"max_{c}") for c in cols],
    ).first()
    nb = (1 << ZORDER_BITS) - 2  # width_bucket returns 0..nb+1 inclusive
    ranks = []
    for c in cols:
        lo, hi = stats[f"min_{c}"], stats[f"max_{c}"]
        if lo is None or hi is None or lo == hi:
            ranks.append(F.lit(0).cast("long"))
        else:
            ranks.append(
                F.expr(
                    f"width_bucket(CAST({c} AS DOUBLE), {lo!r}, {hi!r}, {nb})"
                ).cast("long")
            )
    zed = df
    for k, r in enumerate(ranks):
        zed = zed.withColumn(f"_r{k}", r)
    n = len(cols)
    # interleave: bit i of rank k lands at position i*n + k
    interleave = F.expr(
        f"aggregate(sequence(0, {ZORDER_BITS - 1}), 0L, (acc, i) -> acc | "
        + " | ".join(
            f"shiftleft(shiftright(_r{k}, i) & 1L, i * {n} + {k})"
            for k in range(n)
        )
        + ")"
    )
    return zed.withColumn("_z", interleave).drop(
        *[f"_r{k}" for k in range(n)]
    )


def zorder_write(
    df: DataFrame, cols: list[str], path: str, n_files: int
) -> None:
    """Write ``df`` as ``n_files`` parquet files Z-ordered on ``cols``:
    range-repartition on the Morton value (so files own contiguous curve
    segments), sort within each partition (tight row groups), drop the
    helper column at the writer."""
    (
        zorder_value(df, cols)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
