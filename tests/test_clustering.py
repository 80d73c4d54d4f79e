"""Connected-components dedup grouping: transitive closure vs a pure-Python
union-find at sf0.001, plus unit checks on the component kernel itself."""

from __future__ import annotations

from _round import rhalf

import duckdb
import pytest

import __spark_entry__ as entry_mod
from reactor_window_like_flink_spark.llm.clustering import (
    GROUP_JACCARD_THRESHOLD,
    connected_components,
    connected_components_star,
)


def _union_find_groups(n_nodes: set[int], edges: list[tuple[int, int]]):
    parent = {v: v for v in n_nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in n_nodes}


def test_component_kernel_transitive_chain(spark):
    """A-B-C chain (A,C never share an edge) collapses to one component;
    isolated node stays a singleton."""
    edges = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 99)], "node long")
    got = {
        r["node"]: r["comp"] for r in connected_components(edges, nodes).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_star_kernel_matches_label_propagation(spark):
    """Both kernels agree on a mixed graph (chain + clique + singletons)."""
    raw = [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12), (20, 21)]
    edges = spark.createDataFrame(raw, "src long, dst long")
    nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 12, 20, 21, 99)], "node long"
    )
    label = {
        r["node"]: r["comp"] for r in connected_components(edges, nodes).collect()
    }
    star = {
        r["node"]: r["comp"]
        for r in connected_components_star(edges, nodes).collect()
    }
    assert star == label
    assert star[99] == 99  # isolated node survives as its own component


def test_star_kernel_handles_adversarial_chain(spark):
    """A 200-node path has diameter 199: per-round label propagation
    cannot close it within MAX_ROUNDS (it would need 199 rounds), while
    star contraction converges in O(log n) rounds. This is the named
    adversarial case the star kernel exists for."""
    n = 200
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, nodes, max_rounds=5)
    got = {
        r["node"]: r["comp"]
        for r in connected_components_star(edges, nodes, max_rounds=12).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_dedup_groups_match_union_find(spark, sf_dir):
    """q_dedup_groups == union-find closure of the exact bigram-Jaccard
    pair graph (the same ground truth the pair key is tested against)."""
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, lower(text), lang FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    con.close()

    def bigrams(t):
        toks = t.split(" ")
        if len(toks) < 2:
            return frozenset({t})
        return frozenset(
            f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)
        )

    sets = {d: bigrams(t) for d, t, _ in rows}
    lang = {d: lg for d, _, lg in rows}
    ids = sorted(sets)
    edges = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if lang[a] != lang[b]:
                continue
            inter = len(sets[a] & sets[b])
            if inter / (len(sets[a]) + len(sets[b]) - inter) >= (
                GROUP_JACCARD_THRESHOLD
            ):
                edges.append((a, b))
    truth = _union_find_groups(set(ids), edges)

    out = entry_mod.queries()["q_dedup_groups"](spark, sf_dir).collect()
    got = {r["doc_id"]: r["group_id"] for r in out}
    assert got == truth
    # group_size and survivor flag are consistent with the labeling
    sizes = {}
    for gid in truth.values():
        sizes[gid] = sizes.get(gid, 0) + 1
    for r in out:
        assert r["group_size"] == sizes[r["group_id"]]
        assert r["is_survivor"] == (r["doc_id"] == r["group_id"])
    # at least one non-trivial transitive group exists in the fixture,
    # otherwise this test proves nothing — fail loudly so the fixture
    # assumption is visible
    assert any(s > 1 for s in sizes.values())


def test_pagerank_matches_sequential_reference(spark):
    """Distributed PageRank equals a numpy power iteration on the same
    symmetrized graph (same damping, same iteration count, same
    uniform start) to 1e-9 per node — and conserves total rank mass."""
    import numpy as np

    from reactor_window_like_flink_spark.llm.clustering import (
        PAGERANK_DAMPING,
        PAGERANK_ITERS,
        pagerank,
    )

    rng = np.random.default_rng(17)
    n = 60
    raw = {
        (int(a), int(b))
        for a, b in rng.integers(0, n, size=(150, 2))
        if a != b
    }
    edges_list = sorted({(min(a, b), max(a, b)) for a, b in raw})
    df = spark.createDataFrame(edges_list, "u long, v long")
    got = {r["node"]: r["rank"] for r in pagerank(df).collect()}

    nodes = sorted({x for e in edges_list for x in e})
    idx = {x: i for i, x in enumerate(nodes)}
    adj = [[] for _ in nodes]
    for a, b in edges_list:
        adj[idx[a]].append(idx[b])
        adj[idx[b]].append(idx[a])
    nn = len(nodes)
    r = np.full(nn, 1.0 / nn)
    d = PAGERANK_DAMPING
    for _ in range(PAGERANK_ITERS):
        nxt = np.full(nn, (1.0 - d) / nn)
        for i, nbrs in enumerate(adj):
            share = r[i] / len(nbrs)
            for j in nbrs:
                nxt[j] += d * share
        r = nxt
    assert set(got) == set(nodes)
    for x in nodes:
        assert abs(got[x] - rhalf(r[idx[x]], 6)) <= 1e-6
    assert abs(sum(got.values()) - 1.0) <= 1e-3  # mass conservation


def _lpa_reference(edges, rounds):
    """Sequential synchronous LPA — the semantics spec: every node
    simultaneously adopts its neighbors' plurality label, ties to the
    smallest label."""
    from collections import defaultdict

    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n in adj:
            votes = defaultdict(int)
            for nb in adj[n]:
                votes[labels[nb]] += 1
            new[n] = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        labels = new
    return labels


def test_lpa_matches_sequential_reference_on_random_graph(spark):
    import random

    from reactor_window_like_flink_spark.llm.clustering import (
        LPA_ROUNDS,
        label_propagation,
    )

    rng = random.Random(77)
    edges = {tuple(sorted(rng.sample(range(80), 2))) for _ in range(200)}
    df = spark.createDataFrame(sorted(edges), "u long, v long")
    got = {
        r["node"]: r["community"]
        for r in label_propagation(df).collect()
    }
    want = _lpa_reference(edges, LPA_ROUNDS)
    assert got == want


def test_lpa_keeps_planted_communities_components_would_merge(spark):
    """Two 8-cliques joined by a single bridge: connected components
    collapse everything into one group; LPA must keep two communities
    (the bridge label lacks majority support to cross)."""
    from reactor_window_like_flink_spark.llm.clustering import (
        connected_components,
        label_propagation,
    )
    from pyspark.sql import functions as F

    cliq_a = [(i, j) for i in range(8) for j in range(i + 1, 8)]
    cliq_b = [(i, j) for i in range(10, 18) for j in range(i + 1, 18)]
    edges = cliq_a + cliq_b + [(0, 10)]  # the thin bridge
    df = spark.createDataFrame(edges, "u long, v long")

    comm = {
        r["node"]: r["community"]
        for r in label_propagation(df).collect()
    }
    assert len(set(comm.values())) == 2
    assert {comm[i] for i in range(8)} == {comm[0]}
    assert {comm[i] for i in range(10, 18)} == {comm[10]}
    assert comm[0] != comm[10]

    comps = connected_components(
        df.select(F.col("u").alias("src"), F.col("v").alias("dst")),
        df.select(F.col("u").alias("node"))
        .union(df.select(F.col("v").alias("node")))
        .distinct(),
    )
    assert comps.select("comp").distinct().count() == 1


def test_lpa_registered_key_shape_and_empty(spark, sf_dir, tmp_path):
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out = qs["q_communities_lpa"](spark, sf_dir)
    assert out.columns == ["node", "community", "community_size"]
    rows = out.collect()
    assert len(rows) > 0
    # community_size is consistent with the label multiset
    from collections import Counter

    sizes = Counter(r["community"] for r in rows)
    assert all(sizes[r["community"]] == r["community_size"] for r in rows)
    # empty graph -> empty frame
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").limit(
        0
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    assert qs["q_communities_lpa"](spark, str(tmp_path)).collect() == []


def _kcore_reference(edges, k):
    """Sequential peeling — the semantics spec (peeling is confluent,
    so any order reaches the same fixpoint)."""
    from collections import defaultdict

    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for nb in adj.pop(n):
                    adj[nb].discard(n)
                changed = True
    return {n: len(nbrs) for n, nbrs in adj.items() if nbrs}


def test_kcore_matches_sequential_reference_on_random_graph(spark):
    import random

    from reactor_window_like_flink_spark.llm.clustering import kcore

    rng = random.Random(13)
    edges = {tuple(sorted(rng.sample(range(60), 2))) for _ in range(300)}
    df = spark.createDataFrame(sorted(edges), "u long, v long")
    for k in (3, 5, 8):
        got = {
            r["node"]: r["degree"] for r in kcore(df, k=k).collect()
        }
        assert got == _kcore_reference(edges, k)


def test_kcore_keeps_clique_peels_tendrils(spark):
    """A 6-clique with a pendant path hanging off it: the 5-core is
    exactly the clique (every tendril node peels), and an empty edge
    list yields an empty core."""
    from reactor_window_like_flink_spark.llm.clustering import kcore

    clique = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    path = [(5, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(clique + path, "u long, v long")
    got = {r["node"]: r["degree"] for r in kcore(df, k=5).collect()}
    assert got == {i: 5 for i in range(6)}
    empty = spark.createDataFrame([], "u long, v long")
    assert kcore(empty, k=2).collect() == []
