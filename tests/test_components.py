"""Connected-components / cluster-level dedup (operators/components.py)."""

import random

import pyspark.sql.functions as F
import pytest

from tinyetl_spark.operators.components import (
    connected_components,
    dedup_canonical,
)
from tinyetl_spark.operators import dedup as D


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src: long, dst: long")


def _labels(df):
    return {r["id"]: r["component"] for r in df.collect()}


def _union_find(nodes, pairs):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min id in component
    comp = {}
    for n in nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    return {n: min(members) for r, members in comp.items() for n in members}


def test_path_graph_collapses_to_min(spark):
    """A 32-node path is the worst case for label propagation (diameter
    rounds); the star alternation must close it in O(log n)."""
    pairs = [(i, i + 1) for i in range(1, 32)]
    got = _labels(connected_components(_edges(spark, pairs)))
    assert got == {i: 1 for i in range(1, 33)}
    D.release_caches()


def test_two_components_direction_and_dups_ignored(spark):
    pairs = [(2, 1), (2, 3), (3, 2), (11, 10), (10, 11), (5, 5)]
    got = _labels(connected_components(_edges(spark, pairs)))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    D.release_caches()


def test_empty_edges(spark):
    out = connected_components(_edges(spark, []))
    assert out.count() == 0
    assert out.columns == ["id", "component"]
    D.release_caches()


def test_matches_union_find_on_random_graph(spark):
    rng = random.Random(42)
    nodes = list(range(1, 121))
    pairs = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(90)]
    pairs = [(a, b) for a, b in pairs if a != b]
    touched = sorted({n for p in pairs for n in p})
    want = _union_find(touched, pairs)
    got = _labels(connected_components(_edges(spark, pairs)))
    assert got == want
    D.release_caches()


def test_dedup_canonical_keeps_one_per_cluster(spark):
    """A~B, B~C chain must collapse to ONE keeper — pairwise drop-one
    would keep A and C."""
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 7, 8, 42)],
        "doc_id: long, text: string")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "doc_a: long, doc_b: long")
    out = dedup_canonical(df, pairs, "doc_id").collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == 6
    assert [by_id[i]["component"] for i in (1, 2, 3)] == [1, 1, 1]
    assert [by_id[i]["component"] for i in (7, 8)] == [7, 7]
    assert by_id[42]["component"] == 42  # isolated row is its own cluster
    keepers = sorted(r["doc_id"] for r in out if r["is_canonical"])
    assert keepers == [1, 7, 42]
    D.release_caches()


def test_dedup_canonical_over_lsh_pairs(spark):
    """End-to-end with the real pair generator: exact-dup triples form
    3-cliques; each cluster keeps exactly its min id."""
    base = [(i, f"the quick brown fox {i} jumps over the lazy dog "
                f"while counting {i * 17} stars") for i in range(1, 21)]
    rows = base + [(i + 100, t) for i, t in base] + \
        [(i + 200, t) for i, t in base]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    pairs = D.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.9)
    out = dedup_canonical(df, pairs, "doc_id")
    keep = sorted(r["doc_id"] for r in out.filter("is_canonical").collect())
    assert keep == list(range(1, 21))
    comp = {r["doc_id"]: r["component"] for r in out.collect()}
    for i in range(1, 21):
        assert comp[i] == comp[i + 100] == comp[i + 200] == i
    D.release_caches()


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="no convergence"):
        connected_components(_edges(spark, [(i, i + 1) for i in range(1, 40)]),
                             max_iter=1)
    D.release_caches()


# ---------------------------------------------------------------------------
# web-graph operators (operators/graph.py)

def _py_pagerank(edges, iters=10, d=0.85):
    """Independent driver-side replica of the documented rule."""
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = {u: 1.0 / n for u in nodes}
    for _ in range(iters):
        dangling = sum(r[u] for u in nodes if u not in out)
        mass = {u: 0.0 for u in nodes}
        for s, t in edges:
            mass[t] += r[s] / out[s]
        r = {u: round((1 - d) / n + d * dangling / n + d * mass[u], 9)
             for u in nodes}
    return r


def test_pagerank_matches_independent_replica(spark):
    from tinyetl_spark.operators.graph import pagerank
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("b", "d")]
    # d is dangling (no out-links): its mass must be redistributed
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["url"]: r["rank"] for r in pagerank(df, iters=10).collect()}
    want = _py_pagerank(edges, iters=10)
    assert set(got) == set(want)
    for u in want:
        assert abs(got[u] - want[u]) < 1e-9, (u, got[u], want[u])
    assert abs(sum(got.values()) - 1.0) < 1e-6   # mass conserved
    assert got["c"] > got["d"]                   # hub outranks leaf


def test_extract_links_canonicalizes_and_drops_self(spark):
    from tinyetl_spark.operators.graph import extract_links
    rows = [("https://a.org/", """
        <a href="https://b.org/x?utm_source=feed&q=1">x</a>
        <a href='https://a.org/'>self</a>
        <a href="https://c.org:443/p#frag">c</a>""")]
    df = spark.createDataFrame(rows, ["url", "html"])
    got = sorted((r["src"], r["dst"])
                 for r in extract_links(df).collect())
    assert got == [("https://a.org/", "https://b.org/x?q=1"),
                   ("https://a.org/", "https://c.org/p")]
