"""Connected-components canonicalization: known component structures,
chain-transitivity, singletons, convergence."""

from __future__ import annotations

from oco3_data_transformer_spark.operators.dedup import canonicalize_pairs


def _run(spark, n_nodes, edges):
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], ["id"])
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"]) if edges else (
        spark.createDataFrame([], "id_a long, id_b long")
    )
    out = canonicalize_pairs(nodes, pairs)
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
