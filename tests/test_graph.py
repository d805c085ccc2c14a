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


def test_pagerank_symmetric_graph_equal_ranks(spark):
    """On a symmetric 4-cycle every vertex must end with the identical
    rank, and total rank mass stays ~1 (teleport replaces exactly what
    damping removes when nothing dangles)."""
    from gazelle_plugin_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 1, 1)],
        "src long, dst long, w long",
    )
    rows = pagerank(
        edges, iters=3, damping=0.85, init_rank=0.25, teleport=0.0375
    ).collect()
    prs = {r.vertex: r.pr for r in rows}
    assert set(prs) == {1, 2, 3, 4}
    assert len(set(prs.values())) == 1
    assert abs(sum(prs.values()) - 1.0) < 1e-9


def test_pagerank_matches_python_reference(spark):
    """Fixed-iteration ranks equal a Decimal-faithful Python fold of
    the same recurrence (round-half-up at 12dp per contribution, like
    Spark's ROUND)."""
    from decimal import ROUND_HALF_UP, Decimal

    from gazelle_plugin_spark.operators.graph import pagerank

    raw = [(1, 2, 3), (2, 1, 1), (1, 3, 2), (3, 2, 5), (2, 3, 2)]

    def rnd(x: float, places: int) -> float:
        q = Decimal(1).scaleb(-places)
        return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))

    out_w: dict[int, int] = {}
    for s, _, w in raw:
        out_w[s] = out_w.get(s, 0) + w
    nodes = sorted({s for s, _, _ in raw} | {d for _, d, _ in raw})
    init, tele, damp = 0.25, 0.05, 0.85
    pr = {v: init for v in nodes}
    for _ in range(3):
        acc = {v: Decimal(0) for v in nodes}
        for s, d, w in raw:
            acc[d] += Decimal(repr(rnd(pr[s] * w / out_w[s], 12)))
        pr = {v: rnd(tele + damp * float(acc[v]), 12) for v in nodes}

    edges = spark.createDataFrame(raw, "src long, dst long, w long")
    got = {
        r.vertex: r.pr
        for r in pagerank(
            edges, iters=3, damping=damp, init_rank=init, teleport=tele
        ).collect()
    }
    assert got == pr
