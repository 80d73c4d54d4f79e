"""Unit tests for the vocabulary and TF-IDF ranking operators on
handcrafted fixtures; the sf0.01 oracle differential covers the registered
forms end-to-end."""

from __future__ import annotations

from _round import rhalf

import math

import __spark_entry__ as entry_mod


def _with_docs(spark, rows, key, fn=None):
    """Run a registered documents-table query against a fixture frame."""
    import reactor_window_like_flink_spark.llm.text as text_mod

    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    orig = text_mod.load
    text_mod.load = lambda s, d, t: df
    try:
        return entry_mod.queries()[key](spark, "unused").collect()
    finally:
        text_mod.load = orig


def test_vocab_topk_orders_by_freq_then_term(spark):
    rows = [
        (1, "b b a c"),
        (2, "b a"),
    ]
    out = _with_docs(spark, rows, "q_vocab_topk")
    assert [(r["term"], r["freq"], r["doc_freq"]) for r in out] == [
        ("b", 3, 2),
        ("a", 2, 2),
        ("c", 1, 1),
    ]


def test_tfidf_scores_and_ranks(spark):
    # 3 docs; "rare" appears only in doc 1 (twice) -> tf-idf 2*ln(3);
    # "common" is in every doc -> idf ln(1)=0 -> score 0.
    rows = [
        (1, "rare rare common x"),
        (2, "common y"),
        (3, "common z"),
    ]
    out = _with_docs(spark, rows, "q_tfidf_topterms")
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    top1 = {d: rs[0] for d, rs in ((d, sorted(rs, key=lambda r: r["rank"])) for d, rs in by_doc.items())}
    assert top1[1]["term"] == "rare"
    assert abs(top1[1]["tfidf"] - rhalf(2 * math.log(3), 4)) < 1e-9
    # every doc emits at most TFIDF_TOP_TERMS rows, ranks are 1..k dense
    for d, rs in by_doc.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
    # common scores 0 everywhere it appears
    commons = [r for r in out if r["term"] == "common"]
    assert commons and all(r["tfidf"] == 0.0 for r in commons)


def test_bigram_logprob_penalizes_scrambled_text(spark):
    """The bigram LM's reason to exist: a doc with the corpus's exact
    unigram distribution but scrambled order must score BELOW the
    naturally-ordered docs (unigram logprob cannot separate them)."""
    import reactor_window_like_flink_spark.llm.text as txt
    from pyspark.sql import functions as F

    natural = "the quick brown fox jumps over the lazy dog"
    rows = [
        (i, natural, "en", "s0", len(natural)) for i in range(6)
    ] + [
        # same multiset of tokens as `natural`, order destroyed
        (100, "dog the over quick lazy fox the brown jumps", "en", "s0", 44),
        (101, "a b", "en", "s0", 3),  # 1 bigram position
        (102, "solo", "en", "s0", 4),  # no bigram position -> no row
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = txt.load
    txt.load = lambda s, d, t: df
    try:
        import __spark_entry__ as entry_mod

        out = {
            r["doc_id"]: r
            for r in entry_mod.queries()["q_bigram_logprob"](
                spark, "unused"
            ).collect()
        }
    finally:
        txt.load = orig
    assert 102 not in out  # no bigram positions
    assert out[0]["n_bigrams"] == 8
    assert out[101]["n_bigrams"] == 1
    # scrambled doc scores strictly below every natural copy
    assert out[100]["avg_logprob_bi"] < out[0]["avg_logprob_bi"]
    # natural copies score identically (same positions, same model)
    assert out[0]["avg_logprob_bi"] == out[5]["avg_logprob_bi"]


def test_perplexity_filter_drops_garbage_per_lang(spark):
    """The z-cut must catch the one garbage doc in EACH language while
    keeping every natural doc — and normalization must be per-language
    (a clean doc in a low-logprob language is not punished for its
    language's absolute level)."""
    import reactor_window_like_flink_spark.llm.text as txt

    rows = []
    for li, lang in enumerate(("en", "fr")):
        base = 100 * li
        for i in range(10):
            rows.append((base + i, "the cat sat on the mat", lang, "s0", 22))
        # all-singleton tokens: minimal unigram probability everywhere
        rows.append((base + 99, f"zq{li} xv{li} qj{li} kk{li} vv{li}",
                     lang, "s0", 17))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = txt.load
    txt.load = lambda s, d, t: df
    try:
        import __spark_entry__ as entry_mod

        out = {
            r["doc_id"]: r
            for r in entry_mod.queries()["q_perplexity_filter"](
                spark, "unused"
            ).collect()
        }
    finally:
        txt.load = orig
    assert len(out) == 22
    for base in (0, 100):
        assert out[base + 99]["dropped"] is True
        assert all(out[base + i]["dropped"] is False for i in range(10))
        # natural copies of the same text score identically within a lang
        assert out[base]["z"] == out[base + 5]["z"]
        # garbage doc sits far below its own language's mean
        assert out[base + 99]["z"] < -1.5 < out[base]["z"]


def test_bm25_indexed_equals_scan_form(spark, sf_dir):
    """The index-served query must return exactly the scan-form rows —
    same formula, same fixed term order, same tie-break."""
    qs = entry_mod.queries()
    scan = [tuple(r) for r in qs["q_bm25_query"](spark, sf_dir).collect()]
    idx = [tuple(r) for r in qs["q_bm25_indexed"](spark, sf_dir).collect()]
    assert idx == scan


def test_bm25_indexed_plan_prunes_to_query_terms(spark, sf_dir):
    """The query path reads the persisted postings through the pushed
    term IN (...) filter and never re-reads document text."""
    from reactor_window_like_flink_spark.plans import formatted_plan

    df = entry_mod.queries()["q_bm25_indexed"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "InMemoryTableScan" in plan  # served from the built index
    assert "term" in plan and "IN" in plan.upper()
