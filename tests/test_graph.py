"""connected_components: correctness on adversarial shapes the
near-dup oracle (near-clique graphs) never exercises, plus a
union-find property test."""

from __future__ import annotations

import random

import pytest

from gazelle_plugin_spark.operators.graph import connected_components


def _labels(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r.vertex: r.component for r in connected_components(df).collect()
    }


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def test_long_chain_converges_fast(spark):
    """A 64-hop path is the worst case for plain label propagation
    (O(diameter) rounds); pointer jumping must close it within the
    round cap and label everything with the chain's minimum."""
    edges = [(i, i + 1) for i in range(64)]
    got = _labels(spark, edges)
    assert got == {i: 0 for i in range(65)}


def test_disjoint_cliques_and_orientation(spark):
    """Components stay separate; edge orientation is irrelevant."""
    edges = [(3, 1), (1, 2), (2, 3), (10, 11), (12, 11)]
    got = _labels(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_matches_union_find_on_random_graph(spark):
    rng = random.Random(42)
    vertices = list(range(200))
    edges = [
        (rng.choice(vertices), rng.choice(vertices)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert _labels(spark, edges) == _union_find(edges)


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(64)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge in 1"):
        connected_components(df, max_iters=1)
