"""Similarity search over the ``embeddings`` table (``array<float>``):
brute-force cosine top-k as the exact baseline, and an IVF-probed ANN
variant as the scale path.

Both keep the kernel JVM-side (``zip_with`` + ``aggregate`` upcast to
double) and broadcast the single query vector — the fact side never
shuffles for the scoring pass; only the final top-k runs through
``TakeOrderedAndProject`` (per-partition heaps, no global sort).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reactor_window_like_flink_spark.contract import Registry
from reactor_window_like_flink_spark.sources.tables import load

REG = Registry()

QUERY_VEC_ID = 0
TOP_K = 10
IVF_PROBES = 2


def _norm(col: str) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.expr(f"transform({col}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _dot(col_a: str, col_b: str) -> F.Column:
    return F.aggregate(
        F.zip_with(col_a, col_b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


@REG.add(
    "q_similarity_cosine",
    f"""
    WITH q AS (
      SELECT embedding AS qe,
             sqrt(list_reduce(list_prepend(0.0, list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b))
               AS qn
      FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    ), scored AS (
      SELECT e.vec_id, e.label,
             list_reduce(list_prepend(0.0, list_transform(
               generate_series(1, len(e.embedding)),
               i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))),
               (x, y) -> x + y)
             / (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b))
                * q.qn) AS cosine
      FROM embeddings e, q
      WHERE e.vec_id <> {QUERY_VEC_ID}
    )
    SELECT vec_id, label, ROUND(cosine, 4) AS cosine
    FROM scored ORDER BY cosine DESC, vec_id LIMIT {TOP_K}
    """,
)
def q_similarity_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k against the query vector (vec_id=0), the ANN
    ground truth. One broadcast row, one narrow scoring pass, per-partition
    top-k heaps — at 100 TB this is a single scan with no shuffle of the
    fact table. Ordering ties broken by vec_id so LIMIT is deterministic."""
    emb = load(spark, sf_dir, "embeddings")
    q = (
        emb.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(F.col("embedding").alias("qe"))
        .withColumn("qn", _norm("qe"))
    )
    scored = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .withColumn("cosine", _dot("embedding", "qe") / (_norm("embedding") * F.col("qn")))
    )
    return (
        scored.orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "label", F.round("cosine", 4).alias("cosine"))
    )


# Trained IVF centroid tables, one per sf_dir — the index lifecycle: train
# once, persist, serve every subsequent query from the materialized table.
_IVF_CACHE: dict[str, DataFrame] = {}


def train_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build (or fetch) the IVF centroid table for ``sf_dir``: element-wise
    mean per ``label`` cell, computed distributedly (posexplode →
    groupBy(label, dim) → avg) and **persisted eagerly** — training is an
    index *build*, not part of any query. Values are rounded so the
    signature is stable against partial-aggregation summation order.
    Returns ``(label, dim, cval)``. On a real cluster this table would be
    written out (e.g. parquet next to the data) and re-read by queries;
    the in-process persist is the local[32] analog of that lifecycle."""
    cached = _IVF_CACHE.get(sf_dir)
    if cached is not None:
        return cached
    emb = load(spark, sf_dir, "embeddings")
    centroids = (
        emb.select("label", F.posexplode("embedding").alias("dim", "val"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg("val"), 6).alias("cval"))
        .persist()
    )
    centroids.count()  # materialize now, outside any query's critical path
    _IVF_CACHE[sf_dir] = centroids
    return centroids


@REG.add("q_similarity_ann")  # rows-only: IVF centroid averages are not
# bit-stable across engines (parallel summation order), so the exact row
# set can't be oracle-pinned; tests verify candidates against brute force.
def q_similarity_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probed approximate nearest neighbors: read the trained centroid
    table (``train_ivf`` — built once per dataset, served from the
    persisted copy thereafter), rank cells by centroid-to-query cosine,
    search only the top ``IVF_PROBES`` cells exactly.

    The 100 TB shape: the query vector and the probed cell ids are
    *parameters*, resolved driver-side from tiny lookups (one row; cells ×
    dim doubles against the materialized index — never the fact table),
    exactly like a real IVF index holds its centroid table outside the
    data path. The probe list becomes a ``label IN (...)`` predicate on
    the fact scan — with the table partitioned by cell id that is
    partition pruning: the exact re-scoring pass reads probes/cells of
    the data and nothing else, in one job with no join.
    """
    emb = load(spark, sf_dir, "embeddings")
    qe = [
        float(x)
        for x in emb.filter(F.col("vec_id") == QUERY_VEC_ID).first()["embedding"]
    ]
    qn = math.sqrt(sum(x * x for x in qe))
    centroids = train_ivf(spark, sf_dir)
    # Centroid-to-query cosine without re-assembling arrays: the query
    # vector joins in as a per-dim literal map, so scoring is a plain agg.
    qlit = F.element_at(
        F.array(*[F.lit(x) for x in qe]), (F.col("dim") + 1).cast("int")
    )
    probes = [
        r["label"]
        for r in (
            centroids.groupBy("label")
            .agg(
                F.sum(F.col("cval") * qlit).alias("dot"),
                F.sqrt(F.sum(F.col("cval") * F.col("cval"))).alias("cn"),
            )
            .select("label", (F.col("dot") / F.col("cn")).alias("ccos"))
            .orderBy(F.desc("ccos"), F.asc("label"))
            .limit(IVF_PROBES)
            .collect()
        )
    ]
    qe_col = F.array(*[F.lit(x) for x in qe])
    return (
        emb.filter(F.col("label").isin(probes) & (F.col("vec_id") != QUERY_VEC_ID))
        .withColumn(
            "cosine",
            F.aggregate(
                F.zip_with("embedding", qe_col, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / (_norm("embedding") * F.lit(qn)),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "label", F.round("cosine", 4).alias("cosine"))
    )
