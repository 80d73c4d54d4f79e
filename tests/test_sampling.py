"""Deterministic sampling/split/ordering invariants at sf0.001 — the
properties a training pipeline relies on: stability across runs, split
exclusivity, and permutation correctness."""

from __future__ import annotations

import __spark_entry__ as entry_mod
from reactor_window_like_flink_spark.llm.sampling import (
    SAMPLE_PCT,
    TRAIN_PCT,
    VAL_PCT,
)


def test_sample_is_stable_and_roughly_sized(spark, sf_dir):
    q = entry_mod.queries()["q_sample_hash"]
    first = {r["doc_id"] for r in q(spark, sf_dir).collect()}
    second = {r["doc_id"] for r in q(spark, sf_dir).collect()}
    assert first == second  # re-run selects the identical subset
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # md5 is uniform: expect pct +- 6 sigma of binomial
    expect = n_docs * SAMPLE_PCT / 100
    sigma = (n_docs * (SAMPLE_PCT / 100) * (1 - SAMPLE_PCT / 100)) ** 0.5
    assert abs(len(first) - expect) < 6 * sigma


def test_split_partitions_every_doc_exactly_once(spark, sf_dir):
    rows = entry_mod.queries()["q_train_split"](spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    by_split = {}
    for r in rows:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    assert set(by_split) == {"train", "val", "test"}
    # 80/10/10 within binomial noise
    assert abs(by_split["train"] / n_docs - TRAIN_PCT / 100) < 0.1
    assert abs(by_split["val"] / n_docs - VAL_PCT / 100) < 0.08


def test_shuffle_rank_is_a_permutation(spark, sf_dir):
    rows = entry_mod.queries()["q_shuffle_rank"](spark, sf_dir).collect()
    ranks = sorted(r["shuffle_rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))  # contiguous, no dups
    # order is decorrelated from doc_id order: the permutation must not be
    # the identity (P ~ 1/n! of a false failure)
    by_rank = [r["doc_id"] for r in sorted(rows, key=lambda r: r["shuffle_rank"])]
    assert by_rank != sorted(by_rank)


def test_pii_redact_masks_all_digits(spark, sf_dir):
    rows = entry_mod.queries()["q_pii_redact"](spark, sf_dir).collect()
    assert all(not any(c.isdigit() for c in r["redacted"]) for r in rows)
    assert any(r["n_number_runs"] > 0 for r in rows)


def test_stratified_rates_respected(spark, sf_dir):
    rows = entry_mod.queries()["q_sample_stratified"](spark, sf_dir).collect()
    from reactor_window_like_flink_spark.llm.sampling import (
        STRATA_DEFAULT_PCT,
        STRATA_PCT,
    )

    kept = {}
    for r in rows:
        kept.setdefault(r["lang"], set()).add(r["doc_id"])
        rate = STRATA_PCT.get(r["lang"], STRATA_DEFAULT_PCT)
        assert r["bucket"] < rate
    # membership nests: both keys share one bucket function, so any doc in
    # the flat 20% sample whose language keeps >= 20% must also be kept by
    # the stratified sample
    sample = {
        (r["doc_id"], r["lang"])
        for r in entry_mod.queries()["q_sample_hash"](spark, sf_dir).collect()
    }
    for doc_id, lang in sample:
        if STRATA_PCT.get(lang, STRATA_DEFAULT_PCT) >= 20:  # SAMPLE_PCT
            assert doc_id in kept.get(lang, set())


def test_pack_sequences_matches_brute_force(spark, sf_dir):
    """Per-doc offsets/seq assignment equal a pure-Python concat-then-chunk
    over the same md5 stream order; every sequence except the last is
    exactly full by construction."""
    import duckdb
    import hashlib

    from reactor_window_like_flink_spark.llm.sampling import SEQ_TOKEN_BUDGET

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    con.close()
    stream = sorted(
        (hashlib.md5(str(d).encode()).hexdigest(), d, len(t.split(" ")))
        for d, t in rows
    )
    want, off = {}, 0
    for _, d, n in stream:
        seq = off // SEQ_TOKEN_BUDGET
        want[d] = (
            n,
            off,
            seq,
            (off + n - 1) // SEQ_TOKEN_BUDGET > seq,
        )
        off += n
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["start_offset"],
            r["seq_id"],
            r["spans_boundary"],
        )
        for r in entry_mod.queries()["q_pack_sequences"](spark, sf_dir).collect()
    }
    assert got == want
    # stream is gapless: offsets tile [0, total) exactly
    total = sum(n for _, _, n in stream)
    assert sorted(o for _, o, _, _ in got.values())[0] == 0
    assert max(o + n for n, o, _, _ in got.values()) == total


def test_weighted_sample_matches_reference_and_tilts_heavy(spark, sf_dir):
    """q_sample_weighted must equal the Python Efraimidis-Spirakis
    reference (same md5-derived u, same ln-space key) and must
    over-represent heavy documents versus the corpus mean — the property
    that distinguishes PPS sampling from uniform."""
    import hashlib
    import math

    import duckdb

    from reactor_window_like_flink_spark.llm.sampling import WEIGHTED_K

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, n_chars FROM '{sf_dir}/documents.parquet'"
        " WHERE n_chars > 0"
    ).fetchall()
    con.close()

    def es_key(doc_id: int, w: int) -> float:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        return math.log((h + 1) / 2**32) / w

    ranked = sorted(rows, key=lambda r: (-es_key(r[0], r[1]), r[0]))
    want = [doc_id for doc_id, _ in ranked[:WEIGHTED_K]]

    got_rows = (
        entry_mod.queries()["q_sample_weighted"](spark, sf_dir).collect()
    )
    assert {r["doc_id"] for r in got_rows} == set(want)

    corpus_mean = sum(w for _, w in rows) / len(rows)
    sample_mean = sum(r["n_chars"] for r in got_rows) / len(got_rows)
    assert sample_mean > corpus_mean


def test_cluster_balanced_sample_debiases_duplicate_clusters(spark):
    """With one 50-copy duplicate cluster among 50 unique docs, the
    1/|cluster| weighting keeps the heavy cluster to ~1 expected slot:
    far fewer of its copies survive than its 50% share of the corpus,
    and the result matches the sequential ES reference exactly."""
    import hashlib
    import math

    import reactor_window_like_flink_spark.llm.sampling as smp

    rows = [(i, "same boilerplate page", "dup", 21) for i in range(50)]
    rows += [(100 + i, f"unique doc {i}", "uniq", 12) for i in range(50)]
    df = spark.createDataFrame(
        [(d, t, "en", s, n) for d, t, s, n in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = smp.load
    smp.load = lambda s, d, t: df
    try:
        out = entry_mod.queries()["q_sample_cluster_balanced"](
            spark, "unused"
        ).collect()
    finally:
        smp.load = orig

    # sequential reference: same md5-derived u, same key, top-100 is the
    # whole corpus, so check the ORDERING-based dedup property on a
    # smaller k by recomputing keys
    def es_key(doc_id, gsz):
        hx = hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
        u = (int(hx, 16) + 1) / 4294967296.0
        return gsz * math.log(u)

    want = sorted(
        [(d, s, 50 if s == "dup" else 1) for d, _, s, _ in rows],
        key=lambda r: (-es_key(r[0], r[2]), r[0]),
    )[: smp.CLUSTER_BAL_K]
    got = [(r["doc_id"], r["source"], r["group_size"]) for r in out]
    assert got == want

    # the de-bias property: among the TOP 20 ranks, the 50%-of-corpus
    # duplicate cluster holds only a sliver of slots
    top20_dup = sum(1 for r in got[:20] if r[1] == "dup")
    assert top20_dup <= 4, top20_dup


def test_temperature_mix_flattens_toward_uniform(spark, sf_dir):
    """q = p^alpha renormalized: sums to 1, preserves order, and every
    below-average source is lifted (repeat_factor > 1) while every
    above-average source is damped — the defining property of
    temperature mixing."""
    rows = entry_mod.queries()["q_sample_temperature"](spark, sf_dir).collect()
    assert abs(sum(r["p"] for r in rows) - 1.0) < 1e-2
    assert abs(sum(r["q"] for r in rows) - 1.0) < 1e-2
    mean_p = 1.0 / len(rows)
    for r in rows:
        if abs(r["p"] - mean_p) < 1e-4:
            continue  # at the fixed point repeat ~ 1 either way
        assert (r["repeat_factor"] > 1.0) == (r["p"] < mean_p), r
    # order-preserving: bigger p still means bigger (or equal) q
    by_p = sorted(rows, key=lambda r: r["p"])
    qs = [r["q"] for r in by_p]
    assert qs == sorted(qs)


def test_token_budget_is_maximal_priority_prefix(spark, sf_dir):
    """Per domain: every admitted doc fits the running budget, the set
    is a PREFIX of the hash-priority order (no skips), and it is
    maximal (the next doc in priority order would burst the budget)."""
    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F
    from reactor_window_like_flink_spark.llm.sampling import (
        TOKEN_BUDGET_PER_DOMAIN,
    )
    from reactor_window_like_flink_spark.sources.tables import load

    out = entry_mod.queries()["q_token_budget"](spark, sf_dir).collect()
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split(F.lower(F.col("text")), " ")).alias("n_tokens"),
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long").alias("pri"),
    ).collect()
    by_lang: dict = {}
    for r in docs:
        by_lang.setdefault(r["lang"], []).append(r)
    admitted = {}
    for r in out:
        admitted.setdefault(r["lang"], set()).add(r["doc_id"])
        assert r["cum_tokens"] <= TOKEN_BUDGET_PER_DOMAIN
    assert admitted, "budget should admit documents at fixture scale"
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: (r["pri"], r["doc_id"]))
        cum, expect = 0, set()
        for r in rows:
            cum += r["n_tokens"]
            if cum > TOKEN_BUDGET_PER_DOMAIN:
                break  # take-while: first burst ends the prefix
            expect.add(r["doc_id"])
        assert admitted.get(lang, set()) == expect, lang


def test_token_budget_window_input_is_admitted_prefix(spark):
    """The plan test promised with the round-9 two-phase rewrite: the
    exact running-sum window must consume the histogram-located admitted
    prefix, not the whole domain — on a synthetic mega-domain corpus the
    prefix is a small fraction of the domain, the output over the prefix
    is IDENTICAL to the output over the full frame, and the registered
    key's optimized plan shows the Window fed by the crossing-bucket
    join (the old single-window plan had no join at all)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from reactor_window_like_flink_spark.llm.sampling import (
        _TOKEN_BUDGET_HIST_SHIFT,
        TOKEN_BUDGET_HIST_BUCKETS,
        token_budget_prefix,
    )

    # 32-bit pri space, 'mega' domain 50x over budget, 'tiny' fits whole.
    budget = 1000
    rows = [
        ("mega-%05d" % i, "mega", 10, (i * 2654435761) % (1 << 32))
        for i in range(5000)
    ] + [("tiny-%03d" % i, "tiny", 10, i * 1000) for i in range(50)]
    t = spark.createDataFrame(
        rows, "doc_id string, lang string, n_tokens long, pri long"
    )
    prefix = token_budget_prefix(t, budget)
    got = prefix.collect()
    n_mega = sum(1 for r in got if r["lang"] == "mega")
    n_tiny = sum(1 for r in got if r["lang"] == "tiny")
    assert n_tiny == 50  # whole-domain-fits => crossing NULL => passthrough
    # budget admits ~100 docs of 10 tokens; one extra histogram bucket of
    # width n/1024 ~ 5 rows rides along. Far below the 5000-row domain.
    assert n_mega <= 100 + 5000 // TOKEN_BUDGET_HIST_BUCKETS * 4 + 64
    assert n_mega >= 100  # the true prefix is provably inside

    def exact(frame):
        w = (
            Window.partitionBy("lang")
            .orderBy("pri", "doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return sorted(
            (r["doc_id"], r["cum_tokens"])
            for r in frame.withColumn(
                "cum_tokens", F.sum("n_tokens").over(w)
            )
            .filter(F.col("cum_tokens") <= budget)
            .collect()
        )

    assert exact(prefix) == exact(t)  # output identity: prefix suffices

    # Registered plan: the Window sits above the broadcast crossing join.
    q = __import__("__spark_entry__").queries()["q_token_budget"]
    plan = (
        q(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    lines = plan.splitlines()
    win = next(i for i, l in enumerate(lines) if "Window" in l)
    join = next(i for i, l in enumerate(lines) if "Join" in l)
    assert win < join, "running-sum Window must consume the prefix join"
    assert int(_TOKEN_BUDGET_HIST_SHIFT) == 32 - 10  # derived, not drifted


# --- epoch-aware mixture planning (q_sample_epochs) ---

def test_sample_epochs_cap_and_conservation(spark, sf_dir):
    from reactor_window_like_flink_spark.llm.sampling import (
        EPOCH_CAP,
        TRAIN_BUDGET_MULT,
        q_sample_epochs,
    )

    rows = q_sample_epochs(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r["q"] for r in rows) - 1.0) < 1e-2  # shares sum to 1
    for r in rows:
        assert 0 < r["epochs"] <= EPOCH_CAP + 1e-9
        assert r["capped"] == (r["epochs_want"] > EPOCH_CAP)
        if r["capped"]:
            assert r["epochs"] == EPOCH_CAP
        else:
            assert abs(r["epochs"] - r["epochs_want"]) < 1e-9
        assert abs(r["planned_tokens"] - r["epochs"] * r["n_tokens"]) <= (
            0.5 + r["n_tokens"] * 5e-5  # rounding of epochs to 4dp
        )
    # uncapped sources get exactly their temperature share of the budget:
    # sum over all sources of epochs_want * n_tokens == budget
    total = sum(r["n_tokens"] for r in rows)
    want = sum(r["epochs_want"] * r["n_tokens"] for r in rows)
    assert abs(want - TRAIN_BUDGET_MULT * total) / (
        TRAIN_BUDGET_MULT * total
    ) < 1e-3
