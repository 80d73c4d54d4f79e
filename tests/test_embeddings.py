"""Distributed PCA whitening (``llm/embeddings.py``): moments and
projection equal a numpy sequential reference, whitened covariance is
the identity, variance ordering, determinism, empties."""

from __future__ import annotations

from _round import rhalf

import math

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
    # contract emits pca as a comma-joined string (driver-canonicalizable)
    y = np.asarray(
        [[float(t) for t in r["pca"].split(",")] for r in out],
        dtype="float64",
    )
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


def test_cluster_profile_numpy_reference(spark, sf_dir):
    """Sizes, centroid norms, and cohesion stats recompute from the raw
    vectors with numpy (centroid components rounded to 6 first, as the
    operator defines)."""
    import numpy as np

    import __spark_entry__ as entry_mod
    from reactor_window_like_flink_spark.sources.tables import load

    vecs: dict[int, list] = {}
    for r in load(spark, sf_dir, "embeddings").collect():
        vecs.setdefault(r["label"], []).append(
            np.array(r["embedding"], dtype="float64")
        )
    rows = {
        r["label"]: r
        for r in entry_mod.queries()["q_cluster_profile"](spark, sf_dir).collect()
    }
    assert set(rows) == set(vecs)
    for lab, vs in vecs.items():
        cent = np.round(np.mean(np.stack(vs), axis=0), 6)
        cn = np.sqrt((cent * cent).sum())
        cos = [
            float(v @ cent / (np.linalg.norm(v) * cn)) for v in vs
        ]
        r = rows[lab]
        assert r["n"] == len(vs)
        assert abs(r["centroid_norm"] - rhalf(float(cn), 6)) <= 1e-6
        assert abs(r["mean_cos"] - rhalf(float(np.mean(cos)), 4)) <= 1e-3
        assert abs(r["min_cos"] - rhalf(min(cos), 4)) <= 1e-3
        # members share at least a weak common direction (the fixture's
        # labels are noisy; the profile's JOB is to expose how noisy)
        assert r["mean_cos"] > 0.0


def test_cluster_profile_mixed_dim_falls_back_to_fold(spark, tmp_path):
    """r13 ADVICE: on a mixed-dim embeddings table the unrolled dot —
    sized from one arbitrary row — silently truncated longer vectors.
    The probe is now corpus-wide min(size)==max(size); when sizes vary
    the HOF fold runs instead, which never truncates (a truncating plan
    would report mean_cos = 1.0 here)."""
    import __spark_entry__ as entry_mod

    df = spark.createDataFrame(
        [(0, [1.0], 0), (1, [3.0, 4.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    d = str(tmp_path / "mixed")
    df.coalesce(1).write.parquet(d + "/embeddings.parquet")
    out = {
        r["label"]: r
        for r in entry_mod.queries()["q_cluster_profile"](spark, d).collect()
    }
    r = out[0]
    # centroid = [avg(1,3), avg(4)] = [2, 4]; cos([3,4]) = 22 /
    # (5 * sqrt(20)) = 0.9839; cos([1]) is null under zip_with padding
    # (never a TRUNCATED 1.0), so the aggregate sees one real cosine
    assert r["n"] == 2
    assert r["centroid_norm"] == rhalf(math.sqrt(20.0), 6)
    assert r["mean_cos"] == 0.9839
    assert r["min_cos"] == 0.9839
