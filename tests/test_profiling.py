"""Unit tests for the profiling/quantize/CDC/provenance-dedup operators on
handcrafted fixtures with hand-computed expectations; the sf0.01 oracle
differential covers the registered q_* forms end-to-end."""

from __future__ import annotations

from _round import rhalf

import __spark_entry__ as entry_mod
from pyspark.sql import Window
from pyspark.sql import functions as F

from reactor_window_like_flink_spark.llm.curation import (
    cross_source_dups,
    incremental_dedup,
)
from reactor_window_like_flink_spark.llm.profiling import (
    histogram,
    profile_columns,
)
from reactor_window_like_flink_spark.llm.similarity import quantize_int8
from reactor_window_like_flink_spark.sources.tables import load


def test_profile_columns_counts_nulls_and_distincts(spark):
    rows = [
        (1, "en", 10),
        (2, "en", None),
        (3, None, 30),
        (4, "fr", 30),
    ]
    df = spark.createDataFrame(rows, "id LONG, lang STRING, n LONG")
    out = {r["column"]: r for r in profile_columns(df, ["lang", "n"]).collect()}
    assert set(out) == {"lang", "n"}
    la = out["lang"]
    assert (la["n_rows"], la["n_nulls"], la["n_distinct"]) == (4, 1, 2)
    assert (la["min_val"], la["max_val"]) == ("en", "fr")
    n = out["n"]
    assert (n["n_nulls"], n["n_distinct"], n["min_val"], n["max_val"]) == (
        1,
        2,
        "10",
        "30",
    )


def test_histogram_conserves_mass_and_clamps_edges(spark):
    vals = [-5.0, 0.0, 9.9, 10.0, 25.0, 999.0]  # lo=0, width=10, n=3
    df = spark.createDataFrame([(v,) for v in vals], "x DOUBLE")
    out = {r["bucket"]: r for r in histogram(df, "x", 0.0, 10.0, 3).collect()}
    # -5 clamps into bucket 0; 999 clamps into bucket 2 (the top bucket)
    assert out[0]["n_rows"] == 3 and out[0]["bucket_lo"] == 0.0
    assert out[1]["n_rows"] == 1 and out[1]["bucket_lo"] == 10.0
    assert out[2]["n_rows"] == 2 and out[2]["bucket_lo"] == 20.0
    assert sum(r["n_rows"] for r in out.values()) == len(vals)


def test_quantize_int8_known_vectors(spark):
    rows = [
        (1, [1.0, -2.0, 0.5]),
        (2, [0.0, 0.0]),  # zero vector: scale 0, all-zero quantization
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    out = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    # scale=2: 1->floor(63.5+.5)=64, -2->floor(-127+.5)=-127, 0.5->32
    assert out[1]["scale"] == 2.0
    assert out[1]["qvec_csv"] == "64,-127,32"
    assert (out[1]["n_sat"], out[1]["q_l1"]) == (1, 64 + 127 + 32)
    assert out[2]["scale"] == 0.0
    assert out[2]["qvec_csv"] == "0,0" and out[2]["q_l1"] == 0


def test_quantize_int8_bounds_on_real_embeddings(spark, sf_dir):
    """Every quantized component must lie in [-127, 127] and the argmax
    component must hit exactly ±127 (scale = max |x|)."""
    out = quantize_int8(load(spark, sf_dir, "embeddings")).limit(50)
    bad = out.filter(
        (F.col("n_sat") == 0)  # at least the max-abs component saturates
        | F.exists(
            F.split("qvec_csv", ","),
            lambda s: F.abs(s.cast("int")) > 127,
        )
    ).count()
    assert bad == 0


def test_upsert_latest_matches_window_form(spark, sf_dir):
    """The max(struct) aggregate must pick the identical row set as the
    ROW_NUMBER-over-(ts DESC, event_id DESC) window form."""
    got = {
        r["user_id"]: (r["last_ts"], r["last_event_id"], r["last_value"])
        for r in entry_mod.queries()["q_upsert_latest"](spark, sf_dir).collect()
    }
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts").desc(), F.col("event_id").desc()
    )
    want = {
        r["user_id"]: (r["last_ts"], r["event_id"], r["value"])
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .withColumn("last_ts", F.expr("unix_micros(ts) div 1000000"))
        .collect()
    }
    assert got == want


def test_cross_source_dups_head_keyed(spark):
    head = " ".join(f"w{i}" for i in range(32))  # 32 shared tokens
    rows = [
        (1, head + " tail-one", "sA"),
        (2, head + " different tail", "sB"),  # same head, other source
        (3, head + " third", "sA"),  # same head, same source as 1
        (4, "entirely different text", "sA"),
        (5, "entirely different text", "sA"),  # dup but single-source
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING, source STRING")
    out = cross_source_dups(docs).collect()
    assert len(out) == 1  # the single-source dup group is excluded
    g = out[0]
    assert (g["keep_id"], g["n_docs"], g["n_sources"]) == (1, 3, 2)
    assert g["sources_csv"] == "sA,sB"


def test_zscore_outliers_flags_and_skips_constant_groups(spark):
    from reactor_window_like_flink_spark.llm.profiling import zscore_outliers

    # group A: nine 0s and one 100 -> mean 10, sd sqrt(1000)~31.62,
    # z(100) ~ 2.846 > 2.5 flagged, z(0) ~ -0.316 not.
    # group B: constant -> sd 0 -> z NULL -> never flagged (no div crash).
    rows = [(i, "A", 0.0) for i in range(9)] + [(9, "A", 100.0)] + [
        (10 + i, "B", 5.0) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "event_id LONG, event_type STRING, value DOUBLE")
    out = zscore_outliers(df, "event_type", "value").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["event_id"], r["event_type"], r["value"]) == (9, "A", 100.0)
    assert abs(r["z"] - 2.846) < 1e-3


def test_join_fuzzy_matches_brute_force(spark):
    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as PF

    names = [
        (1, "spark"),
        (2, "spork"),   # substitution: lev 1 vs spark
        (3, "sparks"),  # insertion: lev 1 vs spark
        (4, "park"),    # deletion: lev 1 vs spark/spork(2)
        (5, "spark"),   # identical: lev 0
        (6, "quartz"),  # isolated
        (7, "flink"),   # lev > 1 from everything
    ]
    df = spark.createDataFrame(names, "p_partkey LONG, p_name STRING")
    import reactor_window_like_flink_spark.operators.relational as rel

    # drive the registered builder on the fixture by monkeypatching load
    orig = rel.load
    rel.load = lambda s, d, t: df
    try:
        got = {
            (r["key_a"], r["key_b"], r["dist"])
            for r in entry_mod.queries()["q_join_fuzzy"](spark, "unused").collect()
        }
    finally:
        rel.load = orig
    a, b = df.alias("a"), df.alias("b")
    brute = {
        (r["ka"], r["kb"], r["d"])
        for r in a.join(b, PF.col("a.p_partkey") < PF.col("b.p_partkey"))
        .select(
            PF.col("a.p_partkey").alias("ka"),
            PF.col("b.p_partkey").alias("kb"),
            PF.levenshtein(PF.col("a.p_name"), PF.col("b.p_name")).alias("d"),
        )
        .filter(PF.col("d") <= 1)
        .collect()
    }
    assert got == brute and len(brute) >= 4


def test_incremental_dedup_admits_only_new_unique(spark):
    corpus = spark.createDataFrame(
        [(100, "old doc one"), (101, "old doc two")],
        "doc_id LONG, text STRING",
    )
    batch = spark.createDataFrame(
        [
            (1, "old doc one"),  # already in corpus: rejected
            (2, "fresh doc"),  # new: admitted
            (3, "fresh doc"),  # in-batch dup of 2: folded into its group
            (4, "another fresh"),  # new: admitted
        ],
        "doc_id LONG, text STRING",
    )
    out = {
        r["doc_id"]: r["n_in_batch"]
        for r in incremental_dedup(batch, corpus).collect()
    }
    assert out == {2: 2, 4: 1}


def test_chi2_contingency_matches_closed_form(spark, sf_dir):
    """chi2 / dof / Cramer's V recomputed from the raw contingency
    table in Python."""
    import duckdb

    import __spark_entry__ as entry_mod

    row = entry_mod.queries()["q_chi2_contingency"](spark, sf_dir).first()
    con = duckdb.connect()
    cells = con.sql(
        f"SELECT source, lang, count(*) FROM '{sf_dir}/documents.parquet'"
        f" GROUP BY 1, 2"
    ).fetchall()
    con.close()
    rt: dict = {}
    ct: dict = {}
    n = 0
    for s, l, o in cells:
        rt[s] = rt.get(s, 0) + o
        ct[l] = ct.get(l, 0) + o
        n += o
    chi2 = sum(
        (o - rt[s] * ct[l] / n) ** 2 / (rt[s] * ct[l] / n)
        for s, l, o in cells
    )
    assert row["n_rows"] == len(rt) and row["n_cols"] == len(ct)
    assert row["dof"] == (len(rt) - 1) * (len(ct) - 1)
    assert abs(row["chi2"] - rhalf(chi2, 4)) <= 1e-3
    v = (chi2 / (n * min(len(rt) - 1, len(ct) - 1))) ** 0.5
    assert abs(row["cramers_v"] - rhalf(v, 4)) <= 1e-4


def test_gini_source_closed_form_and_invariants(spark, sf_dir):
    """Gini recomputes from the raw per-source char sums, and the
    estimator hits its anchors: 0 on an equal-weight corpus, → 1 as one
    source dominates."""
    import __spark_entry__ as entry_mod
    from reactor_window_like_flink_spark.sources.tables import load

    qs = entry_mod.queries()
    docs = load(spark, sf_dir, "documents").select("source", "n_chars").collect()
    w: dict[str, int] = {}
    for r in docs:
        w[r["source"]] = w.get(r["source"], 0) + r["n_chars"]
    ws = sorted(w.values())
    n, tot = len(ws), sum(ws)
    gini = 2.0 * sum((i + 1) * x for i, x in enumerate(ws)) / (n * tot) - (
        n + 1.0
    ) / n
    row = qs["q_gini_source"](spark, sf_dir).first()
    assert row["n_sources"] == n and row["total_chars"] == tot
    assert abs(row["gini"] - rhalf(gini, 6)) <= 1e-6

    # anchors on planted frames
    import pyspark.sql.functions as F

    def gini_of(weights):
        df = spark.createDataFrame(
            [(f"s{i}", 1, wt) for i, wt in enumerate(weights)],
            "source string, doc_id int, n_chars long",
        ).withColumn("text", F.lit("x"))
        import tempfile, os

        d = tempfile.mkdtemp()
        for t in ("documents",):
            df.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(d, f"{t}.parquet")
            )
        return qs["q_gini_source"](spark, d).first()["gini"]

    assert gini_of([100, 100, 100, 100]) == 0.0
    assert gini_of([1, 1, 1, 997]) > 0.7
