"""Connected-components canonicalization: known component structures,
chain-transitivity, singletons, convergence — for both the min-label
propagation and the alternating large-star/small-star algorithm."""

from __future__ import annotations

import random

import pytest

from oco3_data_transformer_spark.operators.dedup import (
    canonicalize_pairs,
    canonicalize_pairs_star,
)


def _run(spark, n_nodes, edges, algo=canonicalize_pairs):
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], ["id"])
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"]) if edges else (
        spark.createDataFrame([], "id_a long, id_b long")
    )
    out = algo(nodes, pairs)
    return {r.id: r.canonical_id for r in out.collect()}


def test_two_components_and_singleton(spark):
    got = _run(spark, 6, [(0, 1), (1, 2), (3, 4)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}


def test_long_chain_transitivity(spark):
    # a 12-node path: min label must propagate the full diameter
    got = _run(spark, 12, [(i, i + 1) for i in range(11)])
    assert set(got.values()) == {0}


def test_no_edges_all_singletons(spark):
    got = _run(spark, 4, [])
    assert got == {i: i for i in range(4)}


def test_edge_order_irrelevant(spark):
    got = _run(spark, 5, [(3, 4), (0, 4), (1, 2)])
    assert got[4] == 0 and got[3] == 0 and got[2] == 1


def test_star_known_components(spark):
    got = _run(spark, 6, [(0, 1), (1, 2), (3, 4)], algo=canonicalize_pairs_star)
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}


def test_star_long_chain(spark):
    got = _run(spark, 16, [(i, i + 1) for i in range(15)], algo=canonicalize_pairs_star)
    assert set(got.values()) == {0}


def test_star_no_edges(spark):
    got = _run(spark, 4, [], algo=canonicalize_pairs_star)
    assert got == {i: i for i in range(4)}


def _ref_components(n, edges):
    """Union-find ground truth."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n)}


@pytest.mark.parametrize("seed", [1, 7])
def test_star_matches_label_on_random_graphs(spark, seed):
    rng = random.Random(seed)
    n = 40
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(30)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    truth = _ref_components(n, edges)
    star = _run(spark, n, edges, algo=canonicalize_pairs_star)
    label = _run(spark, n, edges, algo=canonicalize_pairs)
    assert star == truth
    assert label == truth


def test_cc_regimes_identical(spark):
    # r10: the single-task union-find regime must match the distributed
    # rounds (gate forced to 0) exactly, for both operators, including
    # isolated nodes and string ids
    import random

    from pyspark.sql import functions as F

    from oco3_data_transformer_spark.operators.dedup import (
        canonicalize_pairs,
        canonicalize_pairs_star,
    )

    rng = random.Random(23)
    pairs = [(f"d{rng.randint(0, 40)}", f"d{rng.randint(0, 40)}") for _ in range(60)]
    nodes = spark.createDataFrame([(f"d{i}",) for i in range(60)], "id string")
    pdf = spark.createDataFrame(pairs, "id_a string, id_b string").filter(
        F.col("id_a") != F.col("id_b")
    )
    for op in (canonicalize_pairs, canonicalize_pairs_star):
        local = {(r["id"], r["canonical_id"]) for r in op(nodes, pdf).collect()}
        dist = {
            (r["id"], r["canonical_id"])
            for r in op(nodes, pdf, local_edge_limit=0).collect()
        }
        assert local == dist and local
