"""Embedding-space transforms: distributed PCA whitening.

Whitening (center → rotate onto principal axes → scale to unit
variance) is the standard embedding post-process before similarity
work (Su et al., "Whitening Sentence Representations for Better
Semantics and Faster Retrieval", 2021; the classic ZCA/PCA whitening of
Bell & Sejnowski): anisotropic encoder output makes cosine scores
saturate, and whitened vectors make the dot product an honest metric.
It is also the dimensionality-reduction step (keep the top-d
components) a 100 TB embedding corpus runs before ANN indexing.

Scale design — the moments-then-project shape (the same distributed
second-order aggregation as ``classifier.train_classifier``):

* **Moments in one pass**: executors emit per-Arrow-batch partials
  (count, Σx, Σxxᵀ — ``1 + dim + dim²`` doubles per batch); the driver
  sums O(partitions) rows and eigendecomposes the dim×dim covariance.
  Raw vectors never shuffle; the all-reduce volume is independent of
  corpus size.
* **Projection is a second narrow pass**: (x − μ) Vᵈ diag(1/√λ) as one
  numpy matmul per batch under broadcast (μ, V, λ) — no shuffle, no
  join.
* **Deterministic**: no sampling, no RNG; ``numpy.linalg.eigh`` on the
  exact covariance, eigenvector sign pinned (largest-|coordinate|
  entry positive) so distributed == sequential == re-run bit-stable up
  to float-summation error (asserted at 1e-6 in
  tests/test_embeddings.py).

Reference parity note: the reference engine (WindowPublisher.java) has
no vector surface; north-star scope per BASELINE.json.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

from reactor_window_like_flink_spark.contract import Registry
from reactor_window_like_flink_spark.sources.tables import load

REG = Registry()

PCA_DIM = 16  # components kept by the registered key (of the 64-dim input)
PCA_EPS = 1e-9  # variance floor: degenerate axes scale by 1/sqrt(eps)


def embedding_moments(vectors: DataFrame, col: str = "embedding"):
    """One distributed pass → (n, mean, covariance) of the embedding
    column. Per-batch partials are (count, Σx, Σxxᵀ); the driver sums
    in plan order and forms the unbiased covariance."""

    def partials(batches):
        for pdf in batches:
            x = np.asarray(pdf[col].tolist(), dtype="float64")
            if not len(x):
                continue
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "s": [x.sum(0).tolist()],
                    "ss": [(x.T @ x).ravel().tolist()],
                }
            )

    rows = (
        vectors.select(col)
        .mapInPandas(partials, "n long, s array<double>, ss array<double>")
        .collect()
    )
    if not rows:
        return 0, None, None
    dim = len(rows[0]["s"])
    n = 0
    s = np.zeros(dim)
    ss = np.zeros((dim, dim))
    for r in rows:  # O(partitions) rows, summed in plan order
        n += r["n"]
        s += np.asarray(r["s"])
        ss += np.asarray(r["ss"]).reshape(dim, dim)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    return n, mean, cov


def pca_whitening_params(vectors: DataFrame, d: int = PCA_DIM, col: str = "embedding"):
    """Fit the whitening transform: top-``d`` eigenpairs of the
    covariance (descending eigenvalue), signs pinned so each
    eigenvector's largest-|coordinate| entry is positive (eigh's sign
    is otherwise arbitrary — the determinism contract needs it fixed).
    Returns (n, mean, components (dim×d), eigenvalues (d),
    explained_variance_ratio (d))."""
    n, mean, cov = embedding_moments(vectors, col)
    if n == 0:
        return 0, None, None, None, None
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:d]
    lam = w[order]
    comp = v[:, order]
    for j in range(comp.shape[1]):
        i = int(np.abs(comp[:, j]).argmax())
        if comp[i, j] < 0:
            comp[:, j] = -comp[:, j]
    ratio = lam / max(w.sum(), PCA_EPS)
    return n, mean, comp, lam, ratio


def whiten(
    vectors: DataFrame,
    mean,
    components,
    eigenvalues,
    col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project + whiten: ``(x − μ) V diag(1/√(λ + eps))`` as one numpy
    matmul per Arrow batch under the broadcast parameters. Narrow pass,
    zero shuffles."""
    mu = np.asarray(mean, dtype="float64")
    proj = np.asarray(components, dtype="float64") / np.sqrt(
        np.asarray(eigenvalues, dtype="float64") + PCA_EPS
    )

    @pandas_udf("array<double>")
    def project(c: pd.Series) -> pd.Series:
        x = np.asarray(c.tolist(), dtype="float64")
        y = (x - mu) @ proj
        return pd.Series(list(y))

    return vectors.withColumn(out_col, project(col))


@REG.add("q_embed_pca")  # rows-only: eigendecomposition has no SQL
# mirror; pytest asserts distributed == numpy-sequential moments and
# projection at 1e-6, identity covariance of the whitened output, and
# descending explained variance (tests/test_embeddings.py).
def q_embed_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA-whiten the embeddings table to its top {PCA_DIM} components:
    (vec_id, label, pca, var_ratio) where ``pca`` is the centered,
    rotated, unit-variance projection and ``var_ratio`` the kept
    explained-variance fraction (an audit scalar, constant per run) —
    the embedding normalization + dimensionality-reduction pass a
    curation pipeline runs before ANN indexing and semantic dedup.
    Whitened output feeds the existing similarity family unchanged
    (cosine on whitened vectors = the Mahalanobis-corrected metric)."""
    from pyspark.sql import functions as F

    emb = load(spark, sf_dir, "embeddings")
    n, mean, comp, lam, ratio = pca_whitening_params(emb)
    if n == 0:
        return emb.select(
            "vec_id",
            "label",
            F.expr("CAST(array() AS array<double>)").alias("pca"),
            F.lit(0.0).alias("var_ratio"),
        ).limit(0)
    out = whiten(emb, mean, comp, lam)
    return out.select(
        "vec_id",
        "label",
        F.expr(f"transform(pca, x -> round(x, 6))").alias("pca"),
        F.lit(round(float(ratio.sum()), 6)).alias("var_ratio"),
    )
