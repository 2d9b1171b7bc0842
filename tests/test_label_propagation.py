"""Differential + property tests for operators/graph.label_propagation:
the DataFrame loop must match a direct Python implementation of the same
synchronous update (max summed neighbor weight, min-label tie-break) on
randomized weighted graphs."""

from __future__ import annotations

import random
from collections import defaultdict

import pytest

from oco3_data_transformer_spark.operators.graph import label_propagation


def _reference(edges, iters):
    """Pure-Python synchronous LPA, same rule as the operator."""
    adj = defaultdict(list)
    for a, b, w in edges:
        if a != b:
            adj[a].append((b, w))
            adj[b].append((a, w))
    labels = {n: n for n in adj}
    for _ in range(iters):
        nxt = {}
        for n, nbrs in adj.items():
            votes = defaultdict(int)
            for m, w in nbrs:
                votes[labels[m]] += w
            best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
            nxt[n] = best[0]
        labels = nxt
    return labels


def _run(spark, edges, iters):
    df = spark.createDataFrame(edges, "a long, b long, w long")
    return {
        r["node"]: r["community"]
        for r in label_propagation(df, "a", "b", "w", iters=iters).collect()
    }


def test_lpa_two_cliques_with_weak_bridge(spark):
    # two triangles joined by a single weight-1 bridge: LPA keeps them as
    # two communities (the case where connected components over-merges)
    t1 = [(1, 2, 5), (2, 3, 5), (1, 3, 5)]
    t2 = [(11, 12, 5), (12, 13, 5), (11, 13, 5)]
    bridge = [(3, 11, 1)]
    got = _run(spark, t1 + t2 + bridge, iters=4)
    assert got[1] == got[2] == got[3]
    assert got[11] == got[12] == got[13]
    assert got[1] != got[11]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lpa_matches_python_reference(spark, seed):
    rng = random.Random(seed)
    n = rng.randint(6, 12)
    edges = []
    seen = set()
    for _ in range(rng.randint(n, 3 * n)):
        a, b = rng.randrange(n), rng.randrange(n)
        key = tuple(sorted((a, b)))
        if a != b and key not in seen:
            seen.add(key)
            edges.append((key[0], key[1], rng.randint(1, 5)))
    if not edges:
        edges = [(0, 1, 1)]
    want = _reference(edges, iters=3)
    got = _run(spark, edges, iters=3)
    assert got == want


def test_lpa_labels_come_from_node_set(spark):
    edges = [(1, 2, 1), (2, 3, 2), (4, 5, 1)]
    got = _run(spark, edges, iters=4)
    assert set(got) == {1, 2, 3, 4, 5}
    assert set(got.values()) <= {1, 2, 3, 4, 5}


@pytest.mark.parametrize("seed", [0, 1])
def test_lpa_regimes_identical(spark, seed):
    # r10: the broadcast-label regime (node count under the gate) and the
    # sort-merge fallback (gate forced to 0, which also exercises the
    # mirrored attach-on-__a/group-on-__b join) must produce bit-identical
    # communities — integer votes, total tie-break order.
    rng = random.Random(seed)
    n = rng.randint(8, 14)
    edges = []
    for _ in range(n * 3):
        a, b = rng.randint(0, n), rng.randint(0, n)
        edges.append((a, b, rng.randint(1, 4)))
    df = spark.createDataFrame(edges, "a long, b long, w long")
    got_b = {
        r["node"]: r["community"]
        for r in label_propagation(df, "a", "b", "w", iters=3).collect()
    }
    got_d = {
        r["node"]: r["community"]
        for r in label_propagation(
            df, "a", "b", "w", iters=3, node_broadcast_limit=0
        ).collect()
    }
    assert got_b == got_d
