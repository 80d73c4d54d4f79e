"""Quality classifier (llm/classifier.py): score fidelity vs a pure-Python
recompute, label/threshold consistency, and funnel conservation."""

from __future__ import annotations

from _round import rhalf

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
        assert abs(score - rhalf(want, 4)) < 1e-9, doc_id
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


# ------------------------------------------- distributed training


def _sequential_irls(X, y, iters, lam):
    """Single-process reference of the exact IRLS schedule the
    distributed trainer runs — the semantics spec."""
    import numpy as np

    from reactor_window_like_flink_spark.llm import classifier as clf

    X = X.copy()
    X[:, : clf.CLF_BUCKETS] *= clf._CLF_FEAT_SCALE
    n = len(y)
    w = np.zeros(clf.CLF_N_FEATURES)
    eye = np.eye(clf.CLF_N_FEATURES)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        g = X.T @ (p - y) / n + lam * w
        h = (X.T * (p * (1.0 - p))) @ X / n + lam * eye
        w -= np.linalg.solve(h, g)
    return w


def test_train_matches_sequential_reference(spark, sf_dir):
    import numpy as np

    from reactor_window_like_flink_spark.llm.classifier import (
        CLF_TRAIN_ITERS,
        CLF_TRAIN_L2,
        classifier_training_set,
        train_classifier,
    )

    feats = classifier_training_set(load(spark, sf_dir, "documents"))
    pdf = feats.toPandas()
    X = np.stack(pdf["features"].to_numpy())
    y = pdf["y"].to_numpy(dtype="float64")
    want = _sequential_irls(X, y, CLF_TRAIN_ITERS, CLF_TRAIN_L2)
    got = np.asarray(train_classifier(feats))
    assert np.max(np.abs(got - want)) < 1e-6


def test_trained_weights_separate_confident_band(spark, sf_dir):
    """The planted problem is linearly separable on the confident band;
    the trained model must recover it (full agreement with the teacher
    labels it was fit on) AND round-trip through the serving fold:
    classifier_score(trained params) makes the same keep/drop calls."""
    import numpy as np

    from pyspark.sql import functions as F

    from reactor_window_like_flink_spark.llm.classifier import (
        classifier_training_set,
        classifier_score,
        train_classifier,
        trained_serving_params,
        with_classifier_inputs,
    )

    docs = load(spark, sf_dir, "documents")
    feats = classifier_training_set(docs)
    w = train_classifier(feats)
    weights, bias = trained_serving_params(w)

    pdf = feats.toPandas()
    X = np.stack(pdf["features"].to_numpy())
    y = pdf["y"].to_numpy(dtype="float64")
    # numpy decision: x_unscaled . serving_weights + bias >= 0
    margin = X[:, :-1] @ np.asarray(weights) + bias
    acc = ((margin >= 0) == (y == 1)).mean()
    assert acc >= 0.98

    # serving-fold round trip: the codegen fold with trained params
    # scores sigmoid(margin) for the same docs (fold-order summation
    # differences stay far inside the confident band)
    band_ids = {int(i) for i in pdf["doc_id"]}
    scored = (
        with_classifier_inputs(docs)
        .select("doc_id", classifier_score(weights, bias).alias("s"))
        .collect()
    )
    fold_keep = {
        r["doc_id"]: r["s"] >= 0.5 for r in scored if r["doc_id"] in band_ids
    }
    ref = dict(zip((int(i) for i in pdf["doc_id"]), (y == 1).tolist()))
    agree = sum(fold_keep[d] == ref[d] for d in fold_keep) / len(fold_keep)
    assert agree >= 0.98


def test_train_on_empty_documents_returns_zero_model(spark, tmp_path):
    import __spark_entry__ as entry_mod

    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(
        0
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = entry_mod.queries()["q_classifier_train"](
        spark, str(tmp_path)
    ).collect()
    assert len(rows) == 65
    assert all(r["weight"] == 0.0 for r in rows)
