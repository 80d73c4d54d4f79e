"""Distributed PCA whitening (``llm/embeddings.py``): moments and
projection equal a numpy sequential reference, whitened covariance is
the identity, variance ordering, determinism, empties."""

from __future__ import annotations

import numpy as np

import __spark_entry__ as entry_mod
from reactor_window_like_flink_spark.llm.embeddings import (
    PCA_DIM,
    embedding_moments,
    pca_whitening_params,
)
from reactor_window_like_flink_spark.sources.tables import load


def _numpy_reference(x, d):
    mu = x.mean(0)
    cov = (x.T @ x) / len(x) - np.outer(mu, mu)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:d]
    lam, comp = w[order], v[:, order]
    for j in range(comp.shape[1]):
        i = int(np.abs(comp[:, j]).argmax())
        if comp[i, j] < 0:
            comp[:, j] = -comp[:, j]
    return mu, cov, lam, comp


def test_moments_match_numpy(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    x = np.asarray(
        [r["embedding"] for r in emb.select("embedding").collect()],
        dtype="float64",
    )
    n, mean, cov = embedding_moments(emb)
    assert n == len(x)
    mu, cov_ref, _, _ = _numpy_reference(x, PCA_DIM)
    assert np.max(np.abs(mean - mu)) < 1e-9
    assert np.max(np.abs(cov - cov_ref)) < 1e-9


def test_whitening_params_match_numpy_and_sign_pinned(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    x = np.asarray(
        [r["embedding"] for r in emb.select("embedding").collect()],
        dtype="float64",
    )
    _, _, lam_ref, comp_ref = _numpy_reference(x, PCA_DIM)
    n, mean, comp, lam, ratio = pca_whitening_params(emb)
    assert np.max(np.abs(lam - lam_ref)) < 1e-6
    assert np.max(np.abs(comp - comp_ref)) < 1e-6
    # descending variance, ratio consistent
    assert all(lam[i] >= lam[i + 1] for i in range(len(lam) - 1))
    assert 0 < ratio.sum() <= 1 + 1e-9
    # sign pin: every column's largest-|coord| entry is positive
    for j in range(comp.shape[1]):
        assert comp[np.abs(comp[:, j]).argmax(), j] > 0


def test_whitened_output_has_identity_covariance(spark, sf_dir):
    out = entry_mod.queries()["q_embed_pca"](spark, sf_dir).collect()
    y = np.asarray([r["pca"] for r in out], dtype="float64")
    assert y.shape[1] == PCA_DIM
    mu = y.mean(0)
    cov = (y.T @ y) / len(y) - np.outer(mu, mu)
    # rounding to 6dp in the emitted rows bounds the residual
    assert np.max(np.abs(mu)) < 1e-4
    assert np.max(np.abs(cov - np.eye(PCA_DIM))) < 1e-3
    assert len({r["var_ratio"] for r in out}) == 1


def test_pca_deterministic_rerun(spark, sf_dir):
    q = entry_mod.queries()["q_embed_pca"]
    a = {r["vec_id"]: tuple(r["pca"]) for r in q(spark, sf_dir).collect()}
    b = {r["vec_id"]: tuple(r["pca"]) for r in q(spark, sf_dir).collect()}
    assert a == b


def test_pca_empty_embeddings(spark, tmp_path):
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(
        0
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    assert (
        entry_mod.queries()["q_embed_pca"](spark, str(tmp_path)).collect()
        == []
    )
