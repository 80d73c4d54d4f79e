"""LLM-training-data pipeline operators (SURVEY.md §2 Part B keys 46-50
plus the large-scale training-data extras): deduplication (exact, MinHash
LSH, SimHash, n-gram Jaccard, embedding cosine), similarity search
(brute-force + IVF-probed ANN), text analysis (stats, language-ID, quality
score, token counts, fingerprint), and multimodal column plumbing.

The reference has no LLM surface — these are the north-star additions from
BASELINE.json, built expression-first so the hot path stays JVM-side.
"""

from __future__ import annotations

from reactor_window_like_flink_spark.llm.bpe import REG as BPE_REG
from reactor_window_like_flink_spark.llm.classifier import REG as CLASSIFIER_REG
from reactor_window_like_flink_spark.llm.clustering import REG as CLUSTERING_REG
from reactor_window_like_flink_spark.llm.curation import REG as CURATION_REG
from reactor_window_like_flink_spark.llm.dedup import REG as DEDUP_REG
from reactor_window_like_flink_spark.llm.embeddings import REG as EMBEDDINGS_REG
from reactor_window_like_flink_spark.llm.features import REG as FEATURES_REG
from reactor_window_like_flink_spark.llm.multimodal import REG as MULTIMODAL_REG
from reactor_window_like_flink_spark.llm.profiling import REG as PROFILING_REG
from reactor_window_like_flink_spark.llm.retrieval import REG as RETRIEVAL_REG
from reactor_window_like_flink_spark.llm.sampling import REG as SAMPLING_REG
from reactor_window_like_flink_spark.llm.similarity import REG as SIMILARITY_REG
from reactor_window_like_flink_spark.llm.text import REG as TEXT_REG
from reactor_window_like_flink_spark.llm.unigram import REG as UNIGRAM_REG

REGS = [
    DEDUP_REG,
    EMBEDDINGS_REG,
    CLUSTERING_REG,
    SIMILARITY_REG,
    TEXT_REG,
    RETRIEVAL_REG,
    CURATION_REG,
    PROFILING_REG,
    SAMPLING_REG,
    BPE_REG,
    UNIGRAM_REG,
    CLASSIFIER_REG,
    FEATURES_REG,
    MULTIMODAL_REG,
]

__all__ = [
    "REGS",
    "EMBEDDINGS_REG",
    "FEATURES_REG",
    "CLASSIFIER_REG",
    "DEDUP_REG",
    "CLUSTERING_REG",
    "CURATION_REG",
    "PROFILING_REG",
    "SIMILARITY_REG",
    "TEXT_REG",
    "RETRIEVAL_REG",
    "SAMPLING_REG",
    "BPE_REG",
    "UNIGRAM_REG",
    "MULTIMODAL_REG",
]
