"""Quality classifier (llm/classifier.py): score fidelity vs a pure-Python
recompute, label/threshold consistency, and funnel conservation."""

from __future__ import annotations

import math

from reactor_window_like_flink_spark.llm.classifier import (
    CLF_BIAS,
    CLF_BUCKETS,
    CLF_KEEP_MIN,
    CLF_WEIGHTS,
    q_classifier_funnel,
    q_quality_classifier,
)
from reactor_window_like_flink_spark.sources.tables import load


def _py_score(text: str) -> float:
    lt = text.lower()
    if len(lt) < 3:
        mean = 0.0
    else:
        acc = 0.0
        for i in range(len(lt) - 2):
            h = (
                ord(lt[i]) * 961 + ord(lt[i + 1]) * 31 + ord(lt[i + 2])
            ) % CLF_BUCKETS
            acc += CLF_WEIGHTS[h]
        mean = acc / (len(lt) - 2)
    return 1.0 / (1.0 + math.exp(-(mean + CLF_BIAS)))


def test_classifier_score_matches_python_recompute(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_dir, "documents").limit(20).collect()
    }
    got = {
        r["doc_id"]: (r["clf_score"], r["clf_label"])
        for r in q_quality_classifier(spark, sf_dir).collect()
        if r["doc_id"] in docs
    }
    assert len(got) == len(docs)
    for doc_id, text in docs.items():
        want = _py_score(text)
        score, label = got[doc_id]
        assert abs(score - round(want, 4)) < 1e-9, doc_id
        assert label == ("keep" if want >= CLF_KEEP_MIN else "drop")


def test_classifier_short_text_scores_bias_only(spark, sf_dir):
    # < 3 chars -> zero trigrams -> sigmoid(bias) exactly
    df = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    from reactor_window_like_flink_spark.llm.classifier import (
        classifier_score,
        with_classifier_inputs,
    )

    row = with_classifier_inputs(df).select(
        classifier_score().alias("s")
    ).first()
    assert abs(row["s"] - 1.0 / (1.0 + math.exp(-CLF_BIAS))) < 1e-12


def test_classifier_funnel_conserves_and_telescopes(spark, sf_dir):
    rows = sorted(
        q_classifier_funnel(spark, sf_dir).collect(),
        key=lambda r: r["stage_idx"],
    )
    total = load(spark, sf_dir, "documents").count()
    assert [r["stage"] for r in rows] == [
        "too_short",
        "too_long",
        "low_diversity",
        "classifier_drop",
        "kept",
    ]
    assert sum(r["n_docs"] for r in rows) == total
    # n_in telescopes: stage k sees total minus everything dropped before it
    seen = total
    for r in rows:
        assert r["n_in"] == seen
        seen -= r["n_docs"]
    # the classifier rule does real work on the fixture corpus
    assert rows[3]["n_docs"] > 0


def test_classifier_plan_is_single_narrow_scan(spark, sf_dir):
    plan = q_quality_classifier(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffles
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
