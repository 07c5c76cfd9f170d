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
