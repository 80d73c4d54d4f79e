"""Unit tests for the retrieval-indexing (BM25, inverted index, PMI,
Zipf) and robust-profiling (MAD, PSI, chunk-dedup, correlation) operators
on handcrafted fixtures; the sf0.01 oracle differential covers the
registered forms end-to-end."""

from __future__ import annotations

import math

import __spark_entry__ as entry_mod


def _patched(module_names):
    import importlib

    return [
        importlib.import_module(f"reactor_window_like_flink_spark.llm.{m}")
        for m in module_names
    ]


def _with_table(spark, rows, schema, key, modules):
    """Run a registered query against a fixture frame standing in for its
    input table (patch `load` in every module the pipeline touches)."""
    df = spark.createDataFrame(rows, schema)
    mods = _patched(modules)
    origs = [m.load for m in mods]
    for m in mods:
        m.load = lambda s, d, t: df
    try:
        return entry_mod.queries()[key](spark, "unused").collect()
    finally:
        for m, o in zip(mods, origs):
            m.load = o


DOC_SCHEMA = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"


def _docs(rows):
    return [(i, t, "en", "src0", len(t)) for i, t in rows]


def test_bm25_rare_term_outranks_common(spark):
    rows = _docs(
        [
            (1, "rare rare common pad"),
            (2, "common pad other a"),
            (3, "common pad other b"),
        ]
    )
    out = _with_table(spark, rows, DOC_SCHEMA, "q_bm25_topterms", ["retrieval"])
    doc1 = sorted((r for r in out if r["doc_id"] == 1), key=lambda r: r["rank"])
    assert doc1[0]["term"] == "rare"
    # idf is the Lucene non-negative form: even the everywhere-term scores >= 0
    assert all(r["bm25"] >= 0 for r in out)


def test_bm25_length_normalization(spark):
    # same tf for "hit" in both docs; the longer doc must score lower.
    rows = _docs(
        [
            (1, "hit pad"),
            (2, "hit " + " ".join(["pad"] * 30)),
        ]
    )
    out = _with_table(spark, rows, DOC_SCHEMA, "q_bm25_topterms", ["retrieval"])
    score = {
        (r["doc_id"], r["term"]): r["bm25"]
        for r in out
    }
    assert score[(1, "hit")] > score[(2, "hit")]


def test_inverted_index_postings_sorted_and_hapax_dropped(spark):
    rows = _docs([(3, "a b"), (1, "a b a"), (2, "a solo")])
    out = _with_table(spark, rows, DOC_SCHEMA, "q_inverted_index", ["retrieval"])
    by_term = {r["term"]: r for r in out}
    assert "solo" not in by_term  # df=1 dropped
    assert by_term["a"]["postings"] == [1, 2, 3]
    assert by_term["a"]["total_tf"] == 4
    assert by_term["b"]["df"] == 2


def test_bigram_pmi_planted_collocation_tops(spark):
    # "new york" always adjacent; fillers independent. PMI(new york) high.
    pair_doc = "new york " + "x y z w " * 3
    rows = _docs([(i, pair_doc) for i in range(8)])
    out = _with_table(spark, rows, DOC_SCHEMA, "q_bigram_pmi", ["retrieval"])
    assert out, "planted collocation must clear the min-pair threshold"
    top = out[0]
    # ordering contract: pmi desc, pair asc
    assert top["pmi"] == max(r["pmi"] for r in out)
    assert ("new york" in {r["pair"] for r in out})


def test_zipf_slope_flat_for_uniform_and_negative_for_skewed(spark):
    uniform = _docs([(1, ("a b c d e f g h " * 4).strip())])
    out_u = _with_table(spark, uniform, DOC_SCHEMA, "q_zipf_slope", ["retrieval"])
    assert abs(out_u[0]["zipf_slope"]) < 1e-9  # equal freqs: slope 0

    skewed = _docs([(1, "a a a a a a a a b b b b c c d")])
    out_s = _with_table(spark, skewed, DOC_SCHEMA, "q_zipf_slope", ["retrieval"])
    assert out_s[0]["zipf_slope"] < -0.5
    assert out_s[0]["r2"] > 0.9


EVENT_SCHEMA = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
    " value DOUBLE, props STRING"
)


def test_mad_flags_extreme_row_zscore_masking_case(spark):
    # One absurd row inflates stddev enough that the plain z-score stays
    # under its cutoff for a second, clearly-wrong row; MAD still flags
    # both. This is the robustness property the operator exists for.
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    base = [float(v) for v in (10, 11, 9, 10, 12, 8, 10, 11, 9, 10)]
    values = base + [1000.0, 50.0]
    rows = [
        (i, t0, 1, "click", v, "{}") for i, v in enumerate(values)
    ]
    out = _with_table(spark, rows, EVENT_SCHEMA, "q_anomaly_mad", ["profiling"])
    flagged = {r["event_id"] for r in out}
    assert 10 in flagged and 11 in flagged
    # sanity: the inliers stay unflagged
    assert all(i not in flagged for i in range(10))


def test_mad_zero_mad_group_dropped(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0, 1, "const", 5.0, "{}") for i in range(9)] + [
        (9, t0, 1, "const", 99.0, "{}")
    ]
    # median=5, MAD=0 -> group dropped entirely (no div-by-zero, no rows)
    out = _with_table(spark, rows, EVENT_SCHEMA, "q_anomaly_mad", ["profiling"])
    assert out == []


def test_source_drift_identical_sources_zero_psi(spark):
    rows = []
    for s in ("srcA", "srcB"):
        rows += [(len(rows) + i, "t", "en", s, 100 + 50 * (i % 3)) for i in range(30)]
    out = _with_table(spark, rows, DOC_SCHEMA, "q_source_drift", ["curation"])
    assert {r["source"] for r in out} == {"srcA", "srcB"}
    for r in out:
        assert abs(r["psi"]) < 1e-6  # same histogram -> no drift
        assert r["n_docs"] == 30


def test_source_drift_shifted_source_positive_psi(spark):
    rows = [(i, "t", "en", "short", 60) for i in range(30)]
    rows += [(100 + i, "t", "en", "long", 560) for i in range(30)]
    out = _with_table(spark, rows, DOC_SCHEMA, "q_source_drift", ["curation"])
    psi = {r["source"]: r["psi"] for r in out}
    assert psi["short"] > 0.2 and psi["long"] > 0.2


def test_dedup_chunks_finds_cross_doc_full_window_only(spark):
    from reactor_window_like_flink_spark.llm.sampling import CHUNK_TOKENS

    shared = " ".join(f"w{i}" for i in range(CHUNK_TOKENS))
    rows = _docs(
        [
            (1, shared + " tail1 unique1"),
            (2, shared + " tail2 unique2"),
            (3, "completely different short text"),
        ]
    )
    # chunking runs in sampling.py; the dedup aggregate in curation.py
    out = _with_table(
        spark, rows, DOC_SCHEMA, "q_dedup_chunks", ["sampling", "curation"]
    )
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 2 and r["keep_doc_id"] == 1
    # the short doc's sub-64-token window never pairs up
    assert r["n_occurrences"] == 2


def test_corr_matrix_exact_on_linear_columns(spark, sf_dir):
    out = entry_mod.queries()["q_corr_matrix"](spark, sf_dir).collect()
    assert len(out) == 6  # C(4,2) pairs
    for r in out:
        assert -1.0 <= r["pearson_r"] <= 1.0
    pairs = {(r["col_x"], r["col_y"]) for r in out}
    assert ("l_quantity", "l_extendedprice") in pairs
