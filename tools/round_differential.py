"""Adversarial cross-engine differential for the r15 safe-round form.

The migration's whole premise is: ``ROUND(x * 10^n, 0) / 10^n`` is
BIT-IDENTICAL between Spark (BigDecimal shortest-repr HALF_UP at scale
0) and DuckDB (binary-double rounding at scale 0) for every double,
because at scale 0 the two semantics coincide. The per-round sweeps
exercise whatever ratios the fixtures happen to contain; this tool
attacks the claim directly with millions of adversarial inputs:

- exact rationals p/q (the q_quality_score class — count/sum ratios),
- dyadic rationals k/2^m (exactly representable, repr ends in ...5),
- half-neighborhoods (k + 0.5) / 10^n nudged by ±ulps,

computes the scaled round at n = 1, 2, 4, 6 in BOTH engines over the
same parquet file, and compares bit-exactly (plus the pytest model
``tests/_round.py::rhalf`` on a subsample).

Coverage is proven, not assumed: the tool also counts rows where the
OLD form ``ROUND(x, n)`` diverges between the engines' semantics (the
shortest-repr-vs-binary boundary class). A nonzero count shows the
stress actually probes the class the migration removed; those same
rows must STILL agree under the scaled form.

Usage: python tools/round_differential.py [n_rows] (default 2_000_000)
       python tools/round_differential.py --sums [n_rows] [n_groups]
Prints one JSON line; exit 1 on any engine mismatch.

``--sums`` demonstrates the r15 sf1 finding (q_tpch_q5/q9) as a
controlled experiment: N exact-2-decimal "prices" summed per group as
(a) a plain double SUM — Spark's 32-partition partial aggregation adds
in a different order than DuckDB's sequential scan, so the group sums
drift apart and some drift past a half-cent (the ROUND(,2) guard
breaks) — and (b) the exact integer-cent SUM (the
``exact_units`` pattern), which must agree bit-for-bit. The report
counts groups where (a) differs raw, where (a) still differs AFTER the
cent rounding (the driver-visible class), and asserts (b) has zero.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from decimal import ROUND_HALF_UP, Decimal

here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(here, ".."))
sys.path.insert(0, os.path.join(here, "..", "tests"))

SCALES = (1, 2, 4, 6)


def old_spark_round(x: float, nd: int) -> float:
    """The PRE-r15 Spark semantics: HALF_UP on the shortest decimal repr."""
    return float(
        Decimal(repr(x)).quantize(Decimal(1).scaleb(-nd), rounding=ROUND_HALF_UP)
    )


def old_duck_round(x: float, nd: int) -> float:
    """The PRE-r15 DuckDB semantics: HALF_UP on the exact binary value."""
    return float(
        Decimal(x).quantize(Decimal(1).scaleb(-nd), rounding=ROUND_HALF_UP)
    )


def sums_experiment(n_rows: int, n_groups: int) -> int:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(915)
    # exact-2dp "prices" in TPC-H's magnitude range, heavy group sums
    cents = rng.integers(90_000, 10_500_000, size=n_rows)
    price = cents.astype("float64") / 100.0
    grp = rng.integers(0, n_groups, size=n_rows)
    tmp = tempfile.mkdtemp(prefix="sum_diff_")
    path = os.path.join(tmp, "t.parquet")
    pq.write_table(pa.table({"g": grp, "x": price}), path)

    t0 = time.time()
    from pyspark.sql import functions as F

    from reactor_window_like_flink_spark.session import get_spark

    spark = get_spark(app_name="sum_differential", shuffle_partitions=32)
    # 32 input partitions => 32-way partial aggregation, the execution
    # shape a real cluster has (repartition by row hash, NOT by group)
    df = spark.read.parquet(path).repartition(32)
    s_pdf = (
        df.groupBy("g")
        .agg(
            F.sum("x").alias("raw"),
            (F.round(F.sum("x") * 100, 0) / 100.0).alias("rounded"),
            F.sum(F.round(F.col("x") * 100, 0).cast("long")).alias("u2"),
        )
        .toPandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    import duckdb

    con = duckdb.connect()
    d_pdf = (
        con.sql(
            f"""SELECT g, SUM(x) AS raw,
                       (ROUND(SUM(x) * 100, 0) / 100.0) AS rounded,
                       CAST(SUM(CAST(ROUND((x) * 100, 0) AS BIGINT)) AS BIGINT) AS u2
                FROM '{path}' GROUP BY g ORDER BY g"""
        )
        .df()
        .reset_index(drop=True)
    )
    raw_diff = int((s_pdf["raw"].to_numpy() != d_pdf["raw"].to_numpy()).sum())
    rounded_diff = int(
        (s_pdf["rounded"].to_numpy() != d_pdf["rounded"].to_numpy()).sum()
    )
    u2_diff = int(
        (s_pdf["u2"].to_numpy().astype("int64") != d_pdf["u2"].to_numpy().astype("int64")).sum()
    )
    print(
        json.dumps(
            {
                "metric": "sum_differential",
                "n_rows": n_rows,
                "n_groups": n_groups,
                "rows_per_group": n_rows // n_groups,
                "raw_double_sum_groups_differ": raw_diff,
                "cent_rounded_sum_groups_differ": rounded_diff,
                "exact_unit_sum_groups_differ": u2_diff,
                "wall_s": round(time.time() - t0, 1),
            }
        )
    )
    return 1 if u2_diff else 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--sums":
        n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
        n_groups = int(sys.argv[3]) if len(sys.argv) > 3 else 200
        return sums_experiment(n_rows, n_groups)
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(20260816)
    third = n_rows // 3
    # exact rationals p/q, small-to-mid denominators (count ratios)
    p = rng.integers(1, 20001, size=third).astype("float64")
    q = rng.integers(1, 20001, size=third).astype("float64")
    rationals = np.minimum(p, q) / np.maximum(p, q)
    # dyadic rationals k / 2^m — exactly representable, reprs end in 5s
    k = rng.integers(1, 1 << 20, size=third).astype("float64")
    m = rng.integers(1, 21, size=third)
    dyadics = k / np.exp2(m).astype("float64")
    # half-neighborhoods: (k + 0.5) / 10^n nudged 0..3 ulps either way
    rest = n_rows - 2 * third
    kk = rng.integers(0, 100000, size=rest).astype("float64")
    nn = 10.0 ** rng.integers(1, 7, size=rest)
    halves = (kk + 0.5) / nn
    nudge = rng.integers(-3, 4, size=rest)
    for _ in range(3):  # apply up to |3| ulp steps
        step = np.sign(nudge).astype("float64")
        halves = np.where(
            nudge != 0, np.nextafter(halves, halves + step), halves
        )
        nudge = nudge - np.sign(nudge)
    xs = np.concatenate([rationals, dyadics, halves])

    tmp = tempfile.mkdtemp(prefix="round_diff_")
    path = os.path.join(tmp, "xs.parquet")
    pq.write_table(pa.table({"x": xs}), path)

    t0 = time.time()
    from pyspark.sql import functions as F

    from reactor_window_like_flink_spark.session import get_spark

    spark = get_spark(app_name="round_differential", shuffle_partitions=8)
    df = spark.read.parquet(path)
    spark_pdf = (
        df.select(
            "x",
            *[
                (F.round(F.col("x") * 10**n, 0) / float(10**n)).alias(f"v{n}")
                for n in SCALES
            ],
        )
        .toPandas()
        .sort_values("x", kind="stable")
        .reset_index(drop=True)
    )

    import duckdb

    exprs = ", ".join(
        f"(ROUND((x) * {10**n}, 0) / {10**n}.0) AS v{n}" for n in SCALES
    )
    con = duckdb.connect()  # must outlive .df() — a temporary gets GC-closed
    duck_pdf = (
        con.sql(f"SELECT x, {exprs} FROM '{path}' ORDER BY x")
        .df()
        .reset_index(drop=True)
    )

    report: dict = {
        "metric": "round_differential",
        "n_rows": n_rows,
        "scales": list(SCALES),
        "mismatches": {},
        "old_form_divergences": {},
        "model_mismatches": {},
        "wall_s": None,
    }
    rc = 0
    for n in SCALES:
        col = f"v{n}"
        s = spark_pdf[col].to_numpy()
        d = duck_pdf[col].to_numpy()
        mism = int((s != d).sum())
        report["mismatches"][col] = mism
        if mism:
            rc = 1
            bad = spark_pdf["x"].to_numpy()[s != d][:5]
            report.setdefault("examples", {})[col] = [repr(v) for v in bad]

    # Coverage: how many inputs sit ON the boundary class the migration
    # removed (old Spark repr-rounding != old DuckDB binary-rounding)?
    sample = spark_pdf["x"].to_numpy()[:: max(1, n_rows // 200_000)]
    for n in SCALES:
        div = sum(
            1 for v in sample if old_spark_round(float(v), n) != old_duck_round(float(v), n)
        )
        report["old_form_divergences"][f"v{n}"] = {
            "sampled": len(sample),
            "divergent": div,
        }

    # Model check on a subsample (Decimal is slow): rhalf must equal
    # BOTH engines bit-for-bit.
    from _round import rhalf

    idx = np.arange(0, len(spark_pdf), max(1, n_rows // 100_000))
    for n in SCALES:
        col = f"v{n}"
        vals = spark_pdf["x"].to_numpy()[idx]
        eng = spark_pdf[col].to_numpy()[idx]
        mm = sum(1 for v, e in zip(vals, eng) if rhalf(float(v), n) != e)
        report["model_mismatches"][col] = {"sampled": len(idx), "mismatched": int(mm)}
        if mm:
            rc = 1

    report["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(report))
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
