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


# IVF index parameters. Cell count at 100 TB would be O(sqrt(n)) (classic
# IVF sizing); training always runs on a bounded sample, so the k-means
# cost is fixed regardless of corpus size — only the one-pass cell
# assignment scales with the data.
IVF_CELLS = 16
IVF_SEED = 20260813
IVF_TRAIN_MAX_ROWS = 100_000


class IVFIndex:
    """Trained IVF index: the k×dim centroid table held driver-side (tiny
    — it is a *parameter* of every probe decision, like a real IVF index
    keeps centroids outside the data path) plus the cell-assigned copy of
    the vectors, persisted. On a real cluster ``assigned`` would be
    written out partitioned by ``cell`` so probing is partition pruning;
    the in-process persist is the local[32] analog of that layout."""

    def __init__(
        self,
        session: SparkSession,
        centroids: list[list[float]],
        assigned: DataFrame,
    ) -> None:
        self.session = session
        self.centroids = centroids
        self.assigned = assigned


_IVF_CACHE: dict[str, IVFIndex] = {}


def fit_ivf(
    spark: SparkSession, vectors: DataFrame, cells: int = IVF_CELLS
) -> IVFIndex:
    """Fit an IVF index on any ``(vec_id, label, embedding)`` DataFrame:
    learn ``cells`` centroids with k-means (k-means|| init, fixed seed)
    on a bounded sample of the L2-normalized vectors — spherical k-means,
    so Euclidean cell assignment on the unit sphere tracks the cosine
    metric the queries use — then assign every vector to its nearest
    cell in one distributed ``transform`` pass. Requires nothing from
    the data but the embedding column (no pre-existing cluster/label
    column); training cost is bounded by the sample cap, only the
    one-pass assignment scales with the corpus.

    Honesty note for the bundled testdata: those embeddings are
    isotropic random (measured intra-label mean cosine == inter == 0.0),
    and on structureless vectors *no* space-partitioning index beats
    probed-fraction recall — the recall property is therefore verified
    on a clustered fixture in ``tests/test_similarity.py``, while the
    driver key checks exactness-within-probed-cells on the testdata."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    nrm = F.sqrt(
        F.aggregate(
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    feat = vectors.withColumn(
        "features",
        array_to_vector(F.transform("embedding", lambda x: x.cast("double") / nrm)),
    )
    n = feat.count()
    train_df = (
        feat.sample(fraction=IVF_TRAIN_MAX_ROWS / n, seed=IVF_SEED)
        if n > IVF_TRAIN_MAX_ROWS
        else feat
    )
    model = KMeans(
        k=cells, seed=IVF_SEED, maxIter=20, featuresCol="features"
    ).fit(train_df)
    centroids = [[float(x) for x in c] for c in model.clusterCenters()]
    assigned = (
        model.transform(feat)
        .select(
            "vec_id",
            "label",
            "embedding",
            F.col("prediction").alias("cell"),
        )
        .persist()
    )
    assigned.count()  # materialize now, outside any query's critical path
    return IVFIndex(spark, centroids, assigned)


def train_ivf(spark: SparkSession, sf_dir: str) -> IVFIndex:
    """Build (or fetch) the IVF index for ``sf_dir``'s embeddings table
    (see ``fit_ivf``) — training is an index *build*, not part of any
    query. The cache is keyed by ``sf_dir`` but validated against the
    live session: a persisted DataFrame is bound to the SparkSession
    that built it, so after a session restart the stale entry is rebuilt
    instead of handing back a plan on a dead session."""
    cached = _IVF_CACHE.get(sf_dir)
    if cached is not None and cached.session is spark:
        return cached
    index = fit_ivf(spark, load(spark, sf_dir, "embeddings"))
    _IVF_CACHE[sf_dir] = index
    return index


def _probe_cells(centroids: list[list[float]], qe: list[float], n: int) -> list[int]:
    """Rank cells for a query vector, driver-side — k×dim doubles of
    arithmetic against the in-memory centroid table, never the data.
    Metric: Euclidean distance between the L2-normalized query and the
    centroid, matching the assignment metric (argmin Euclidean over
    unit-sphere k-means cells), so probe order is consistent with how
    vectors were binned."""
    qn = math.sqrt(sum(x * x for x in qe)) or 1.0
    qu = [x / qn for x in qe]
    scored = []
    for cell, c in enumerate(centroids):
        d2 = sum((a - b) ** 2 for a, b in zip(c, qu))
        scored.append((d2, cell))
    scored.sort()
    return [cell for _, cell in scored[:n]]


@REG.add("q_similarity_ann")  # rows-only: k-means centroids are not
# reproducible in SQL (iterative, parallel summation order), so the exact
# row set can't be oracle-pinned; tests verify exactness-within-cells and
# recall@k against the brute-force ground truth.
def q_similarity_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probed approximate nearest neighbors: read the trained index
    (``train_ivf`` — built once per dataset, served from the persisted
    copy thereafter), rank the learned centroids by cosine to the query
    driver-side, search only the top ``IVF_PROBES`` cells exactly.

    The 100 TB shape: the query vector and the probed cell ids are
    *parameters* — one driver-side row lookup plus k×dim floats of
    centroid arithmetic — and the probe list becomes a
    ``cell IN (...)`` predicate on the assigned-vector scan. With the
    index table partitioned by cell that is partition pruning: the exact
    re-scoring pass reads probes/cells of the data and nothing else, in
    one job with no join and no shuffle before the top-k."""
    emb = load(spark, sf_dir, "embeddings")
    qe = [
        float(x)
        for x in emb.filter(F.col("vec_id") == QUERY_VEC_ID).first()["embedding"]
    ]
    qn = math.sqrt(sum(x * x for x in qe))
    index = train_ivf(spark, sf_dir)
    probes = _probe_cells(index.centroids, qe, IVF_PROBES)
    qe_col = F.array(*[F.lit(x) for x in qe])
    return (
        index.assigned.filter(
            F.col("cell").isin(probes) & (F.col("vec_id") != QUERY_VEC_ID)
        )
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


def quantize_int8(vectors: DataFrame) -> DataFrame:
    """Symmetric per-vector int8 quantization of ``embedding``: scale =
    max(|x|), q_i = floor(x_i * 127 / scale + 0.5) — the storage/transport
    compression step before an ANN index ships vectors (4 bytes -> 1 byte
    per dim). ``floor(x + 0.5)`` instead of ``round`` pins the tie rule
    to one exact IEEE expression both engines evaluate identically (Spark
    HALF_UP vs DuckDB ties-away would otherwise be an oracle hazard).

    Pure per-row higher-order functions — a narrow scan, no shuffle, no
    Python; at 100 TB this is a map-only rewrite of the vector column.
    The quantized vector is emitted as a CSV string plus scalar stats
    (saturation count, quantized L1) so the driver's value hash is
    type-stable across engines."""
    absmax = F.aggregate(
        F.expr("transform(embedding, x -> abs(CAST(x AS DOUBLE)))"),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    qvec = F.expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / _scale"
        " + 0.5D) AS INT))"
    )
    return (
        vectors.withColumn("_scale", absmax)
        .withColumn("qvec", F.when(F.col("_scale") == 0.0, F.expr(
            "transform(embedding, x -> 0)"
        )).otherwise(qvec))
        .select(
            "vec_id",
            F.round("_scale", 6).alias("scale"),
            F.array_join(F.transform("qvec", lambda x: x.cast("string")), ",").alias(
                "qvec_csv"
            ),
            F.size(F.filter("qvec", lambda x: F.abs(x) == 127))
            .cast("long")
            .alias("n_sat"),
            F.aggregate(
                "qvec", F.lit(0).cast("long"), lambda acc, x: acc + F.abs(x).cast("long")
            ).alias("q_l1"),
        )
    )


@REG.add(
    "q_embed_quantize",
    """
    WITH q AS (
      SELECT vec_id,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
               AS s,
             embedding
      FROM embeddings
    ), qq AS (
      SELECT vec_id, s,
             CASE WHEN s = 0
               THEN list_transform(embedding, x -> 0)
               ELSE list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / s + 0.5) AS INT))
             END AS qv
      FROM q
    )
    SELECT vec_id,
           ROUND(s, 6) AS scale,
           array_to_string(qv, ',') AS qvec_csv,
           CAST(len(list_filter(qv, x -> abs(x) = 127)) AS BIGINT) AS n_sat,
           CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1
    FROM qq
    """,
)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantize every embedding (see ``quantize_int8``)."""
    return quantize_int8(load(spark, sf_dir, "embeddings"))
