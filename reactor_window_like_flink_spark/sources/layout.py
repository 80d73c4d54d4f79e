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


def partitioned_write(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
) -> None:
    """Hive-style partitioned layout: ``path/col=value/part-*.parquet``.

    This is the coarse-grained skipping tier ABOVE z-order: a filter on a
    partition column prunes whole directories at planning time
    (``PartitionFilters`` in the scan node — zero footers opened), where
    z-order/min-max pruning still reads every footer. At 100 TB the two
    compose: partition by the always-filtered low-cardinality column
    (date, source), z-order within each partition on the range-probed ones.

    The ``repartition(partition_cols)`` before the writer is the
    anti-small-files guard: without it, every one of the N upstream tasks
    writes a file into every partition directory (N x P files); hashing
    rows to their partition first bounds output at
    ``files_per_partition`` x P. Skewed partitions that need more files
    add a salt column here — same shape as ``q_agg_salted``.

    The spread term is a DETERMINISTIC hash of the full row, never
    ``rand()``: repartitioning on a nondeterministic key corrupts data
    under task retry (a recomputed map task re-draws and routes rows to
    different reducers than the committed attempt — the SPARK-23207
    class of bug), silently dropping/duplicating rows.
    """
    n = max(1, files_per_partition)
    parts = [F.col(c) for c in partition_cols]
    spread = (
        F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n))
        if n > 1
        else F.lit(0)
    )
    (
        df.repartition(*parts, spread)
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def compact(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite a many-small-files parquet directory as ~target-sized files;
    returns the output file count.

    Small files are the silent 100 TB killer: a 1 M-file table costs a
    driver-side listing per query, a task per file (scheduler overhead
    dominates sub-8 MB tasks), and per-file footer reads that defeat
    min-max skipping. Streaming sinks (one file per micro-batch per
    partition) and over-parallel writers both produce them; periodic
    compaction is the standard fix (Delta OPTIMIZE / Iceberg rewrite).

    File count derives from the SOURCE's physical bytes (summed from the
    file index, no data read). The rewrite is one job: coalesce for the
    unsorted case (no shuffle — tasks read several small files each);
    range-partition + in-file sort when ``sort_cols`` is given, restoring
    min-max locality that the small files fragmented. Writes to a new
    directory — object stores have no atomic in-place rewrite; the caller
    swaps paths (or a catalog pointer) after success.
    """
    src = spark.read.parquet(src_path)
    # physical size from the file index (driver-side metadata, no scan)
    total_bytes = 0
    hconf = spark.sparkContext._jsc.hadoopConfiguration()  # noqa: SLF001
    jpath = spark._jvm.org.apache.hadoop.fs.Path(src_path)  # noqa: SLF001
    fs = jpath.getFileSystem(hconf)
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if name.startswith("part-"):
            total_bytes += status.getLen()
    if total_bytes == 0:
        # e.g. a hive-partitioned table (files live under col=value/
        # subdirectories): compact partition directories individually so
        # the rewrite can't silently collapse the table to one file
        raise ValueError(
            f"no part-* data files directly under {src_path!r}; "
            "compact() operates on flat parquet directories — for a "
            "partitioned table, compact each partition directory"
        )
    n_files = max(1, -(-total_bytes // target_file_bytes))
    if sort_cols:
        out = src.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        # coalesce is the no-shuffle path (tasks read several small files
        # each), but it can only MERGE partitions; splitting few large
        # files up to the target needs a real repartition
        current = src.rdd.getNumPartitions()
        out = (
            src.coalesce(n_files)
            if n_files <= current
            else src.repartition(n_files)
        )
    out.write.mode("overwrite").parquet(dst_path)
    # report what was actually written (coalesce/AQE may land fewer)
    jdst = spark._jvm.org.apache.hadoop.fs.Path(dst_path)  # noqa: SLF001
    return sum(
        1
        for status in jdst.getFileSystem(hconf).listStatus(jdst)
        if status.getPath().getName().startswith("part-")
    )
