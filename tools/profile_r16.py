"""r16 stage-split profiler: times sub-stages of the expensive keys so
optimization targets the stage that actually costs, per guide §1.

Usage: python tools/profile_r16.py [sf_dir] [probe ...]
Probes: graph_edges, lpa_rounds, pagerank_rounds, kcore_rounds,
        jaccard_stages, containment, classifier
"""

from __future__ import annotations

import os
import sys
import time

here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(here, ".."))


def t(label, fn, n=3):
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    samples.sort()
    print(f"  {label}: {samples[len(samples)//2]:.3f}s (min {samples[0]:.3f} max {samples[-1]:.3f})")
    return samples[len(samples) // 2]


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    probes = []
    for a in args:
        if a.startswith("/"):
            sf_dir = a
        else:
            probes.append(a)
    if not probes:
        probes = ["graph_edges", "lpa_rounds", "pagerank_rounds", "kcore_rounds"]

    from pyspark.sql import functions as F

    from reactor_window_like_flink_spark.session import get_spark
    from reactor_window_like_flink_spark.sources.tables import load

    spark = get_spark(app_name="profile_r16")
    load(spark, sf_dir, "lineitem").count()  # warm

    if "graph_edges" in probes:
        from reactor_window_like_flink_spark.operators.analytics import (
            _basket_pairs,
        )

        print("graph_edges (shared by lpa/pagerank/kcore/triangle):")
        li = load(spark, sf_dir, "lineitem")
        t("basket_pairs+distinct noop", lambda: noop(
            _basket_pairs(li, "l_orderkey", "l_partkey").distinct()))
        t("basket_pairs+distinct localCheckpoint", lambda: _basket_pairs(
            li, "l_orderkey", "l_partkey").distinct().localCheckpoint())

    if "lpa_rounds" in probes:
        from reactor_window_like_flink_spark.llm.clustering import (
            label_propagation,
        )
        from reactor_window_like_flink_spark.operators.analytics import (
            _basket_pairs,
        )

        li = load(spark, sf_dir, "lineitem")
        edges = _basket_pairs(li, "l_orderkey", "l_partkey").distinct()
        print("lpa:")
        for rounds in (1, 3, 5):
            t(f"label_propagation rounds={rounds}",
              lambda r=rounds: noop(label_propagation(edges, rounds=r)), n=3)

    if "pagerank_rounds" in probes:
        from reactor_window_like_flink_spark.llm.clustering import pagerank
        from reactor_window_like_flink_spark.operators.analytics import (
            _basket_pairs,
        )

        li = load(spark, sf_dir, "lineitem")
        edges = _basket_pairs(li, "l_orderkey", "l_partkey").distinct().select(
            F.col("u"), F.col("v"))
        print("pagerank:")
        for iters in (1, 5, 10):
            t(f"pagerank iters={iters}",
              lambda i=iters: noop(pagerank(edges, iters=i)), n=3)

    if "kcore_rounds" in probes:
        from reactor_window_like_flink_spark.llm.clustering import q_kcore

        print("kcore (whole key):")
        t("q_kcore", lambda: noop(q_kcore(spark, sf_dir)), n=3)

    if "jaccard_stages" in probes:
        from reactor_window_like_flink_spark.llm.dedup import (
            _shingles_from_toks,
            _tokenized,
            prefix_jaccard_join,
        )

        print("dedup_ngram_jaccard stages:")
        hashed = _tokenized(spark, sf_dir).select(
            "doc_id",
            "lang",
            F.transform(_shingles_from_toks(2), lambda x: F.xxhash64(x)).alias(
                "hs"
            ),
        )
        t("tokenize+hash only (noop)", lambda: noop(hashed))
        t("full prefix_jaccard_join t=0.8",
          lambda: noop(prefix_jaccard_join(hashed, 0.8)))

    if "classifier" in probes:
        import __spark_entry__ as e

        qs = e.queries()
        print("classifier_train:")
        t("q_classifier_train", lambda: noop(qs["q_classifier_train"](spark, sf_dir)))

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
