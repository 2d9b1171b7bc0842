"""Differential + property tests for operators/graph.k_core: the
DataFrame peeling loop must match a pure-Python implementation of the
same fixed-round simultaneous peel on randomized graphs, and the
auto-calibrated k must equal floor(lower-quartile initial degree)."""

from __future__ import annotations

import random
from collections import defaultdict

import pytest

from oco3_data_transformer_spark.operators.graph import k_core


def _reference(edges, k, iters):
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    alive = set(adj)
    for _ in range(iters):
        deg = {n: sum(1 for m in adj[n] if m in alive) for n in alive}
        alive = {n for n in alive if deg[n] >= k}
    return {n: sum(1 for m in adj[n] if m in alive) for n in alive}


def _run(spark, edges, k, iters):
    df = spark.createDataFrame(edges, "a long, b long")
    out = k_core(df, "a", "b", k=k, iters=iters)
    return {r["node"]: r["deg"] for r in out.collect()}


def test_kcore_clique_survives_chain_peels(spark):
    # 4-clique (deg 3 everywhere) + a chain hanging off it: at k=2 the
    # chain peels from the tip inward round by round, the clique persists
    clique = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    chain = [(4, 10), (10, 11), (11, 12)]
    got = _run(spark, clique + chain, k=2, iters=4)
    assert set(got) == {1, 2, 3, 4}
    assert all(d == 3 for d in got.values())


@pytest.mark.parametrize("seed,k,iters", [(0, 2, 3), (1, 3, 4), (2, 2, 1)])
def test_kcore_matches_python_reference(spark, seed, k, iters):
    rng = random.Random(seed)
    n = rng.randint(8, 14)
    edges, seen = [], set()
    for _ in range(rng.randint(n, 3 * n)):
        a, b = rng.randrange(n), rng.randrange(n)
        key = tuple(sorted((a, b)))
        if a != b and key not in seen:
            seen.add(key)
            edges.append(key)
    if not edges:
        edges = [(0, 1)]
    assert _run(spark, edges, k, iters) == _reference(edges, k, iters)


def test_kcore_auto_k_is_lower_quartile(spark):
    # star: center deg 8, leaves deg 1 -> degrees [8,1*8];
    # quartile_cont(0.25) over [1,1,1,1,1,1,1,1,8] = 1 -> k=1 keeps all
    star = [(0, i) for i in range(1, 9)]
    got = _run(spark, star, k=None, iters=2)
    assert set(got) == set(range(9))
    # two triangles + isolated-ish pair: degrees [2]*6 + [1,1];
    # q25 = 1 -> nothing peels; explicit k=2 drops the pair
    tri = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (7, 8)]
    auto = _run(spark, tri, k=None, iters=3)
    assert set(auto) == {1, 2, 3, 4, 5, 6, 7, 8}
    hard = _run(spark, tri, k=2, iters=3)
    assert set(hard) == {1, 2, 3, 4, 5, 6}


def test_kcore_regimes_identical(spark):
    # r10: broadcast-alive regime vs sort-merge fallback (gate forced to 0)
    # must peel identically and report identical induced degrees.
    import random

    rng = random.Random(7)
    edges = [
        (rng.randint(0, 12), rng.randint(0, 12)) for _ in range(40)
    ]
    df = spark.createDataFrame(edges, "a long, b long")
    from oco3_data_transformer_spark.operators.graph import k_core

    got_b = {
        (r["node"], r["deg"]) for r in k_core(df, "a", "b", iters=3).collect()
    }
    got_d = {
        (r["node"], r["deg"])
        for r in k_core(
            df, "a", "b", iters=3, node_broadcast_limit=0
        ).collect()
    }
    assert got_b == got_d
