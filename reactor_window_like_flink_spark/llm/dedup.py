"""Deduplication operators over ``documents`` / ``embeddings``: exact,
MinHash+LSH banded near-dup, SimHash near-dup, exact n-gram Jaccard, and
embedding-cosine near-dup.

Scale design (the whole point of these operators at 100 TB):

* **Never all-pairs.** Every near-dup variant generates candidates through
  a bucket join — LSH bands (MinHash), pigeonhole chunks (SimHash), or a
  blocking key (lang / label) — so the shuffle is keyed and the pair count
  is bounded by bucket co-occupancy, not |docs|².
* **JVM expressions end-to-end.** Shingling, 32-permutation MinHash,
  64-bit SimHash bit-voting, and Jaccard/cosine kernels are all built from
  ``transform``/``aggregate``/``array_*`` higher-order functions — no
  Python in the row path, whole-stage codegen applies.
* Exact-verify after candidate generation: LSH/SimHash only *propose*
  pairs; an exact Jaccard / Hamming / cosine filter confirms, so the output
  is deterministic given the hash family (verified by brute-force
  comparison in tests; the driver check is rows-only because DuckDB lacks
  xxhash64).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reactor_window_like_flink_spark.contract import Registry
from reactor_window_like_flink_spark.sources.tables import load

REG = Registry()

# MinHash parameters: 32 permutations in 16 bands × 2 rows → candidate
# probability 1-(1-j²)^16 (≈0.99 at j=0.5, the confirm threshold below).
MINHASH_PERMS = 32
MINHASH_BANDS = 16
MINHASH_ROWS = MINHASH_PERMS // MINHASH_BANDS
JACCARD_THRESHOLD = 0.5

# SimHash: 64-bit signature split into 8 chunks of 8 bits — pigeonhole
# guarantees recall for Hamming distance ≤ 7. At 100 TB use 4×16-bit
# chunks (Hamming ≤ 3) instead: 8-bit chunks have only 256 values, so
# bucket occupancy grows quadratically with corpus size.
SIMHASH_CHUNKS = 8
SIMHASH_CHUNK_BITS = 64 // SIMHASH_CHUNKS
HAMMING_THRESHOLD = 7


def _shingles(col: str = "text", n: int = 3) -> F.Column:
    """Distinct word n-gram shingles as strings, via slice+zip — pure JVM
    array ops (no explode, no shuffle)."""
    toks = F.split(F.lower(F.col(col)), " ")
    if n == 1:
        return F.array_distinct(toks)
    joined = F.expr(
        f"transform(sequence(1, greatest(size(split(lower({col}), ' ')) - {n - 1}, 0)),"
        f" i -> array_join(slice(split(lower({col}), ' '), i, {n}), ' '))"
    )
    return F.array_distinct(joined)


@REG.add(
    "q_dedup_exact",
    """
    SELECT min(doc_id) AS keep_id,
           CAST(count(*) AS BIGINT) AS n_copies,
           CAST(min(length(text)) AS BIGINT) AS n_chars
    FROM documents
    GROUP BY md5(lower(trim(text)))
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized text, keep the lowest doc_id
    per group. Grouping on md5(text) rather than the raw text keeps shuffle
    rows small (16-byte key vs full document) — the 100 TB-safe shape."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.lower(F.trim("text"))).alias("k"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").alias("n_copies"),
            F.min(F.length("text")).cast("long").alias("n_chars"),
        )
        .drop("k")
    )


@REG.add("q_dedup_near")  # rows-only: DuckDB has no xxhash64 to mirror the LSH
def q_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH near-duplicate pairs (shingle → minhash → band
    → bucket-join → exact-Jaccard confirm ≥ 0.5).

    Distributed-MinHash shape: explode shingles once, then ONE groupBy
    computes all 32 permutation minimums as partial aggregates (map-side
    combine — the shuffle carries 32 longs per doc, not the shingle sets)
    plus the collect_set used by the confirm step. Candidates come from a
    self-join on (band_id, band_hash) — bucket-sized partitions, never
    |docs|²; the exact-Jaccard filter then confirms only candidates.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    exploded = docs.select(
        "doc_id", F.explode(_shingles()).alias("shingle")
    )
    sigs = exploded.groupBy("doc_id").agg(
        F.collect_set("shingle").alias("shingles"),
        F.array(
            *[
                F.min(F.xxhash64("shingle", F.lit(i)))
                for i in range(MINHASH_PERMS)
            ]
        ).alias("sig"),
    )
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {MINHASH_BANDS - 1}),"
                f" b -> hash(slice(sig, b * {MINHASH_ROWS} + 1, {MINHASH_ROWS})))"
            )
        ).alias("band_id", "band_hash"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sh = sigs.select("doc_id", "shingles")
    paired = candidates.join(
        sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")),
        "doc_a",
    ).join(
        sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")),
        "doc_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size("sh_a") + F.size("sh_b") - F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        paired.withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


@REG.add("q_dedup_simhash")  # rows-only: DuckDB has no xxhash64 to mirror
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 64-bit bit-vote signature per doc, candidate pairs
    via pigeonhole chunk buckets, confirmed by Hamming distance ≤ 7
    (``bit_count(a XOR b)`` — one JVM instruction per pair)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    with_sig = (
        docs.withColumn("th", F.expr("transform(split(lower(text), ' '), t -> xxhash64(t))"))
        .filter(F.size("th") > 0)
        .withColumn(
            "simhash",
            F.expr(
                "aggregate(sequence(0, 63), 0L, (acc, b) -> acc + shiftleft("
                " CASE WHEN aggregate(th, 0L,"
                "   (v, h) -> v + CASE WHEN (shiftright(h, b) & 1) = 1"
                "                 THEN 1 ELSE -1 END) > 0"
                " THEN 1L ELSE 0L END, b))"
            ),
        )
        .select("doc_id", "simhash")
    )
    chunks = with_sig.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {SIMHASH_CHUNKS - 1}),"
                f" j -> shiftright(simhash, j * {SIMHASH_CHUNK_BITS})"
                f"      & {(1 << SIMHASH_CHUNK_BITS) - 1})"
            )
        ).alias("chunk_id", "chunk_val"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).cast("long").alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= HAMMING_THRESHOLD)
    )


@REG.add(
    "q_dedup_ngram_jaccard",
    """
    WITH t AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(lower(text), ' ')) - 1, 0)),
               i -> string_split(lower(text), ' ')[i] || ' '
                    || string_split(lower(text), ' ')[i + 1])) AS bg
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(CAST(len(list_intersect(a.bg, b.bg)) AS DOUBLE)
                 / (len(a.bg) + len(b.bg) - len(list_intersect(a.bg, b.bg))), 4)
             AS jaccard
    FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.bg, b.bg)) AS DOUBLE)
          / (len(a.bg) + len(b.bg) - len(list_intersect(a.bg, b.bg))) >= 0.1
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-bigram Jaccard over blocked pairs (same ``lang``) —
    the deterministic, oracle-checkable complement to the probabilistic
    MinHash key. Blocking is the scale lever: the join shuffles on the
    block key, and pair count is Σ|block|², not |docs|². At 100 TB the
    block key would be an LSH band; here it's ``lang`` so the oracle can
    reproduce the exact pair set."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select("doc_id", "lang", _shingles(n=2).alias("bg"))
    a, b = t.alias("a"), t.alias("b")
    inter = F.size(F.array_intersect("a.bg", "b.bg")).cast("double")
    union = (
        F.size("a.bg") + F.size("b.bg") - F.size(F.array_intersect("a.bg", "b.bg"))
    )
    jacc = inter / union
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(jacc >= 0.1)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jacc, 4).alias("jaccard"),
        )
    )


@REG.add(
    "q_dedup_embedding",
    """
    WITH e AS (
      SELECT vec_id, label, embedding,
             sqrt(list_reduce(list_prepend(0.0, list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                  (a, b) -> a + b)) AS nrm
      FROM embeddings
    ), pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
             list_reduce(list_prepend(0.0, list_transform(
               generate_series(1, len(a.embedding)),
               i -> CAST(a.embedding[i] AS DOUBLE)
                    * CAST(b.embedding[i] AS DOUBLE))),
               (x, y) -> x + y) / (a.nrm * b.nrm) AS cosine
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, label, ROUND(cosine, 4) AS cosine
    FROM pairs WHERE cosine >= 0.3
    """,
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by ``label`` (at 100 TB the
    block key is an ANN bucket — IVF cell or LSH sign-chunk; see
    similarity.py). The cosine kernel is ``zip_with``+``aggregate`` on
    ``array<float>`` upcast to double — left-to-right summation matches the
    oracle's ``list_reduce`` fold bit-for-bit, so the ≥ threshold row set
    is identical across engines."""
    emb = load(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    e = emb.select("vec_id", "label", "embedding", F.sqrt(sq_sum).alias("nrm"))
    a, b = e.alias("a"), e.alias("b")
    dot = F.aggregate(
        F.zip_with(
            "a.embedding",
            "b.embedding",
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cosine = dot / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .withColumn("cos_raw", cosine)
        .filter(F.col("cos_raw") >= 0.3)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            F.round("cos_raw", 4).alias("cosine"),
        )
    )
