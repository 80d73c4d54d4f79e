"""Z-order layout: written files must have narrow min-max footer ranges
on EVERY clustered column (multi-dimensional skipping), where a linear
sort is perfect on its sort key and useless on the other column. The
assertion reads real parquet footers via pyarrow — the same stats a scan
prunes with."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from reactor_window_like_flink_spark.sources.layout import (
    compact,
    partitioned_write,
    zorder_value,
    zorder_write,
)
from reactor_window_like_flink_spark.sources.tables import load

N_FILES = 16


def _file_ranges(path: str, col: str) -> list[tuple[float, float]]:
    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        schema_idx = {
            md.row_group(0).column(i).path_in_schema: i
            for i in range(md.row_group(0).num_columns)
        }[col]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(schema_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        out.append((min(mins), max(maxs)))
    return out


def _candidates(ranges, probes) -> float:
    """Avg fraction of files a point filter must read."""
    hits = [
        sum(1 for lo, hi in ranges if lo <= p <= hi) for p in probes
    ]
    return sum(hits) / len(hits) / len(ranges)


def test_zorder_prunes_both_dimensions(spark, sf_dir, tmp_path):
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    zorder_write(orders, ["o_custkey", "o_totalprice"], zpath, N_FILES)
    # comparator: classic single-column sort layout
    (
        orders.repartitionByRange(N_FILES, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    rows = orders.agg(
        *[
            f(c).alias(f"{n}_{c}")
            for c in ("o_custkey", "o_totalprice")
            for n, f in (("min", F.min), ("max", F.max))
        ]
    ).first()
    for col in ("o_custkey", "o_totalprice"):
        lo, hi = rows[f"min_{col}"], rows[f"max_{col}"]
        probes = [lo + (hi - lo) * k / 10.0 for k in range(11)]
        z_frac = _candidates(_file_ranges(zpath, col), probes)
        l_frac = _candidates(_file_ranges(lpath, col), probes)
        # z-order: every dimension prunes to a strict subset
        assert z_frac < 0.8, (col, z_frac)
        if col == "o_custkey":
            # linear layout wins its own sort key — that's fine
            assert l_frac <= z_frac + 1e-9
        else:
            # ...but reads most files on the other dimension (not ~all:
            # at sf0.001 a 16-file split is small enough that random
            # per-file ranges leave gaps); z-order must beat it decisively
            assert l_frac > 0.5, (col, l_frac)
            assert z_frac < l_frac / 2, (col, z_frac, l_frac)


def test_partitioned_write_prunes_directories(spark, sf_dir, tmp_path):
    events = load(spark, sf_dir, "events")
    path = str(tmp_path / "by_type")
    partitioned_write(events, path, ["event_type"])
    back = spark.read.parquet(path)
    one = back.filter(F.col("event_type") == "click")
    # planning-time pruning: the scan's partition filters carry the
    # predicate, and only the matching directory's files are opened
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    # inputFiles() lists the whole relation; the files actually READ come
    # from input_file_name() at execution time
    files = [
        r["f"]
        for r in one.select(F.input_file_name().alias("f")).distinct().collect()
    ]
    assert files and all("event_type=click" in f for f in files)
    # round trip is lossless
    assert back.count() == events.count()
    # anti-small-files guard: one file per partition value, not one per
    # upstream task per partition value
    n_types = events.select("event_type").distinct().count()
    assert len(back.inputFiles()) == n_types


def test_dynamic_partition_pruning_over_partitioned_layout(
    spark, sf_dir, tmp_path
):
    """The join-driven analog of directory pruning: when the partition
    column is a join key and the other side is selective, Catalyst injects
    a runtime ``dynamicpruningexpression`` into the scan's PartitionFilters
    — the fact scan reads only the partitions the dim side survives. At
    100 TB this is THE mechanism that keeps star joins from scanning the
    fact table (no literal filter needed on the fact side)."""
    events = load(spark, sf_dir, "events")
    path = str(tmp_path / "dpp")
    partitioned_write(events, path, ["event_type"])
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("click", 1), ("view", 2)], "event_type string, w int"
    ).filter("w = 1")
    joined = fact.join(dim, "event_type")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan
    # executed evidence: only the surviving partition's files are opened
    # (capture input_file_name at scan time — post-join it loses lineage)
    tagged = fact.withColumn("f", F.input_file_name()).join(dim, "event_type")
    files = {r["f"] for r in tagged.select("f").distinct().collect() if r["f"]}
    assert files and all("event_type=click" in f for f in files)


def test_compact_rewrites_to_target_sizes(spark, sf_dir, tmp_path):
    events = load(spark, sf_dir, "events")
    frag = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    events.repartition(64).write.parquet(frag)
    assert len(spark.read.parquet(frag).inputFiles()) == 64
    # pick a target that should land at 2+ files for the sf0.001 table
    total = sum(
        pq.ParquetFile(f).metadata.serialized_size
        + sum(
            pq.ParquetFile(f).metadata.row_group(i).total_byte_size
            for i in range(pq.ParquetFile(f).metadata.num_row_groups)
        )
        for f in glob.glob(f"{frag}/part-*.parquet")
    )
    n = compact(spark, frag, out, target_file_bytes=max(1, total // 3))
    back = spark.read.parquet(out)
    assert len(back.inputFiles()) == n <= 8
    assert back.count() == events.count()


def test_compact_sorted_restores_minmax_locality(spark, sf_dir, tmp_path):
    events = load(spark, sf_dir, "events").select("event_id", "user_id")
    frag = str(tmp_path / "frag_sorted")
    out = str(tmp_path / "sorted")
    # fragment with round-robin so every small file spans the id range
    events.repartition(32).write.parquet(frag)
    compact(spark, frag, out, target_file_bytes=8 * 1024, sort_cols=["event_id"])
    ranges = _file_ranges(out, "event_id")
    assert len(ranges) > 1
    # sorted compaction → files own disjoint id ranges (allow touching ends)
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert lo_next >= hi_prev
    lo, hi = min(r[0] for r in ranges), max(r[1] for r in ranges)
    probes = [lo + (hi - lo) * k / 10.0 for k in range(11)]
    assert _candidates(ranges, probes) <= 2 / len(ranges) + 1e-9


def test_zorder_value_locality(spark):
    # adjacent z-values must differ only in low-order interleaved bits:
    # check the interleave against a pure-Python morton model
    rows = [(a, b) for a in range(8) for b in range(8)]
    df = spark.createDataFrame(rows, "x LONG, y LONG")
    got = {
        (r["x"], r["y"]): r["_z"]
        for r in zorder_value(df, ["x", "y"]).collect()
    }
    nb = (1 << 16) - 2

    def bucket(v):  # width_bucket over [0, 7] with nb buckets
        if v == 7:
            return nb + 1
        return int(v / 7.0 * nb) + 1

    def morton(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in got.items():
        assert z == morton(bucket(x), bucket(y)), (x, y)


def test_zorder_two_column_skipping_at_sf01(spark, tmp_path):
    """Scale measurement (the BASELINE.md Z-order line): at sf0.1 over 32
    files, point probes on each clustered dimension separately and on
    their conjunction, Z-order vs a linear o_custkey sort.

    What the numbers mean: linear is UNBEATABLE on probes that include
    its own sort key (a point lands in exactly 1 of 32 range-partitioned
    files — and that includes the 2-column conjunction, which this test
    measures and documents rather than pretending otherwise); its failure
    mode is the other dimension, where it reads ~every file. Z-order is
    the compromise: a few files on EVERY clustered dimension. So the
    layout choice is a workload statement: single-dimension workloads
    want that dimension's sort; mixed-dimension workloads want Z-order,
    and this test pins the sf0.1 ratio that claim rests on."""
    sf_dir = "/root/testdata/sf0.1"
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    n_files = 32
    zpath = str(tmp_path / "z01")
    lpath = str(tmp_path / "linear01")
    zorder_write(orders, ["o_custkey", "o_totalprice"], zpath, n_files)
    (
        orders.repartitionByRange(n_files, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    probes = [
        (r["o_custkey"], r["o_totalprice"])
        for r in orders.filter(F.col("o_orderkey") % 6007 == 0)
        .limit(40)
        .collect()
    ]
    assert len(probes) >= 10

    def fracs(path: str) -> dict[str, float]:
        boxes = list(
            zip(
                _file_ranges(path, "o_custkey"),
                _file_ranges(path, "o_totalprice"),
            )
        )
        n = len(boxes) * len(probes)
        hit_c = hit_p = hit_both = 0
        for c, p in probes:
            for (clo, chi), (plo, phi) in boxes:
                in_c = clo <= c <= chi
                in_p = plo <= p <= phi
                hit_c += in_c
                hit_p += in_p
                hit_both += in_c and in_p
        return {
            "custkey": hit_c / n,
            "totalprice": hit_p / n,
            "both": hit_both / n,
        }

    z, lin = fracs(zpath), fracs(lpath)
    print(f"# zorder sf0.1 skipping (fraction of 32 files read): "
          f"z={z} linear={lin}")
    # the other-dimension probe is the one that matters: linear reads
    # most files, z-order prunes decisively
    assert lin["totalprice"] > 0.5, lin
    assert z["totalprice"] < lin["totalprice"] / 4, (z, lin)
    # z-order still prunes (imperfectly) on the primary dimension —
    # measured 0.34 at sf0.1: ~sqrt-of-files resolution per dimension
    # plus row-group box overlap, the price paid for pruning both
    assert z["custkey"] < 0.5, z
    # and linear owns any probe that includes its sort key — document,
    # don't fight it: the conjunction lands in exactly ceil(1) file
    assert lin["both"] <= 1.5 / n_files
    assert z["both"] < 0.2, z
