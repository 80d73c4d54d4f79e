"""Similarity search vs numpy brute force."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

import __spark_entry__ as entry_mod
from reactor_window_like_flink_spark.llm.similarity import (
    IVF_PROBES,
    QUERY_VEC_ID,
    TOP_K,
)


@pytest.fixture(scope="module")
def vectors(sf_dir):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT vec_id, label, embedding FROM "
        f"'{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    con.close()
    return [(v, lab, np.array(e, dtype="float64")) for v, lab, e in rows]


def _brute_topk(vectors, candidate_ids=None):
    q = next(e for v, _, e in vectors if v == QUERY_VEC_ID)
    qn = float(np.sqrt(q @ q))
    scored = []
    for v, _, e in vectors:
        if v == QUERY_VEC_ID:
            continue
        if candidate_ids is not None and v not in candidate_ids:
            continue
        cos = float(e @ q) / (float(np.sqrt(e @ e)) * qn)
        scored.append((v, cos))
    scored.sort(key=lambda t: (-t[1], t[0]))
    return scored[:TOP_K]


def test_cosine_topk_matches_brute_force(spark, sf_dir, vectors):
    got = entry_mod.queries()["q_similarity_cosine"](spark, sf_dir).collect()
    want = _brute_topk(vectors)
    assert [r["vec_id"] for r in got] == [v for v, _ in want]
    for r, (_, cos) in zip(got, want):
        assert abs(r["cosine"] - round(cos, 4)) <= 1e-4


def test_ann_exact_within_probed_cells(spark, sf_dir, vectors):
    """The ANN result must be the *exact* top-k over the probed cells (the
    approximation is cell pruning, never scoring), and probed recall is
    bounded below by the per-cell population."""
    got = entry_mod.queries()["q_similarity_ann"](spark, sf_dir).collect()
    assert len(got) == TOP_K
    probed_labels = {r["label"] for r in got}
    assert len(probed_labels) <= IVF_PROBES
    in_cells = {v for v, lab, _ in vectors if lab in probed_labels}
    want = _brute_topk(vectors, candidate_ids=in_cells)
    assert [r["vec_id"] for r in got] == [v for v, _ in want]


def test_ivf_index_trains_once_and_query_plan_has_no_training(spark, sf_dir):
    """Index lifecycle: train_ivf persists and is served from cache on
    every later call; the ANN query plan itself is a pruned fact scan —
    no posexplode/aggregate of the fact table (that would be re-training
    inside the query)."""
    from reactor_window_like_flink_spark.llm.similarity import train_ivf
    from reactor_window_like_flink_spark.plans import formatted_plan

    first = train_ivf(spark, sf_dir)
    assert first.storageLevel.useMemory
    assert train_ivf(spark, sf_dir) is first

    df = entry_mod.queries()["q_similarity_ann"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "Generate" not in plan  # no posexplode of the fact table
    assert "HashAggregate" not in plan  # no centroid (re)aggregation
