"""Tests for operators/graph.triangle_counts: hand-built goldens plus a
differential check against a brute-force itertools reference on random
graphs (same style as the pagerank/PQ/BPE differentials), and the
mutual-kNN graph (operators/similarity.mutual_knn) against a numpy
reference."""

from __future__ import annotations

import itertools
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from oco3_data_transformer_spark.operators.graph import triangle_counts
from oco3_data_transformer_spark.operators.similarity import mutual_knn


def _run(spark, edges):
    df = spark.createDataFrame(edges, "a string, b string")
    return {
        r["node"]: (r["deg"], r["n_tri"], r["lcc"])
        for r in triangle_counts(df, "a", "b").collect()
    }


def test_triangle_k4_complete_graph(spark):
    edges = [(a, b) for a, b in itertools.combinations("wxyz", 2)]
    got = _run(spark, edges)
    # K4: every node has degree 3 and sits in C(3,2)=3 triangles, lcc 1.0
    assert got == {n: (3, 3, 1.0) for n in "wxyz"}


def test_triangle_wedge_has_none(spark):
    got = _run(spark, [("a", "b"), ("b", "c")])
    assert got == {"a": (1, 0, 0.0), "b": (2, 0, 0.0), "c": (1, 0, 0.0)}


def test_triangle_duplicate_reversed_and_self_edges_normalized(spark):
    # duplicates, reversed duplicates and self-loops must not change counts
    edges = [
        ("a", "b"), ("b", "a"), ("a", "b"),
        ("b", "c"), ("a", "c"), ("c", "c"),
    ]
    got = _run(spark, edges)
    assert got == {"a": (2, 1, 1.0), "b": (2, 1, 1.0), "c": (2, 1, 1.0)}


def _brute_force(edges):
    """Per-node triangle counts by enumerating all node triples."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    deg = {n: sum(1 for e in und if n in e) for n in nodes}
    tri = {n: 0 for n in nodes}
    for x, y, z in itertools.combinations(nodes, 3):
        if (
            tuple(sorted((x, y))) in und
            and tuple(sorted((y, z))) in und
            and tuple(sorted((x, z))) in und
        ):
            for n in (x, y, z):
                tri[n] += 1
    return {
        n: (
            deg[n],
            tri[n],
            (2.0 * tri[n] / (deg[n] * (deg[n] - 1))) if deg[n] >= 2 else 0.0,
        )
        for n in nodes
    }


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_triangle_counts_match_brute_force(spark, seed):
    rng = random.Random(seed)
    n = rng.randint(6, 14)
    names = [f"n{i}" for i in range(n)]
    edges = [
        (a, b)
        for a, b in itertools.combinations(names, 2)
        if rng.random() < 0.45
    ]
    if not edges:
        edges = [(names[0], names[1])]
    want = _brute_force(edges)
    got = _run(spark, edges)
    assert set(got) == set(want)
    for node in want:
        d_w, t_w, l_w = want[node]
        d_g, t_g, l_g = got[node]
        assert (d_g, t_g) == (d_w, t_w), node
        assert l_g == pytest.approx(l_w)


def test_triangle_hub_star_zero_triangles(spark):
    # a pure hub (star graph) has many wedges but no closing edges — the
    # degree orientation makes the hub a wedge DESTINATION, so the wedge
    # join emits nothing from the hub itself
    edges = [("hub", f"leaf{i}") for i in range(12)]
    got = _run(spark, edges)
    assert got["hub"] == (12, 0, 0.0)
    assert all(got[f"leaf{i}"] == (1, 0, 0.0) for i in range(12))


# ---------------------------------------------------------------------------
# mutual_knn
# ---------------------------------------------------------------------------


def _mutual_reference(vecs, labels, k):
    """numpy mutual-kNN: per-block exact cosine top-k, then mutual filter."""
    n = len(vecs)
    V = np.asarray(vecs, dtype=np.float64)
    norm = np.linalg.norm(V, axis=1)
    knn = {}
    for i in range(n):
        cands = [
            (
                float(V[i] @ V[j] / (norm[i] * norm[j])),
                j,
            )
            for j in range(n)
            if j != i and labels[j] == labels[i]
        ]
        cands.sort(key=lambda t: (-t[0], t[1]))
        knn[i] = {j: (r + 1, c) for r, (c, j) in enumerate(cands[:k])}
    out = {}
    for i in range(n):
        for j, (r_ij, c) in knn[i].items():
            if i < j and i in knn[j]:
                out[(i, j)] = (r_ij, knn[j][i][0], c)
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_mutual_knn_matches_numpy_reference(spark, seed):
    rng = np.random.default_rng(seed)
    n, d, k = 40, 8, 5
    vecs = rng.normal(size=(n, d)).round(3).tolist()
    labels = [int(i % 3) for i in range(n)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], labels[i]) for i in range(n)],
        "vec_id long, embedding array<double>, label int",
    )
    got = {
        (r["id_a"], r["id_b"]): (r["rank_ab"], r["rank_ba"], r["cos"])
        for r in mutual_knn(df, "vec_id", "embedding", "label", k=k).collect()
    }
    want = _mutual_reference(vecs, labels, k)
    assert set(got) == set(want)
    for key in want:
        assert got[key][0] == want[key][0]
        assert got[key][1] == want[key][1]
        assert got[key][2] == pytest.approx(want[key][2])


def test_mutual_knn_edges_are_mutual_and_block_scoped(spark):
    rng = np.random.default_rng(7)
    n, k = 30, 4
    df = spark.createDataFrame(
        [
            (i, [float(x) for x in rng.normal(size=6)], int(i % 2))
            for i in range(n)
        ],
        "vec_id long, embedding array<double>, label int",
    )
    rows = mutual_knn(df, "vec_id", "embedding", "label", k=k).collect()
    # ordered pair key, both ranks within k, and edges never cross blocks
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert 1 <= r["rank_ab"] <= k and 1 <= r["rank_ba"] <= k
        assert r["id_a"] % 2 == r["id_b"] % 2


@pytest.mark.parametrize("seed", [0, 3])
def test_mutual_knn_arrow_equals_sql_kernel(spark, seed):
    # the chunked-matmul kernel and the relational window form must agree
    # pair-for-pair and rank-for-rank (the q34 differential pattern)
    rng = np.random.default_rng(seed)
    n, k = 35, 4
    df = spark.createDataFrame(
        [
            (i, [float(x) for x in rng.normal(size=6)], int(i % 2))
            for i in range(n)
        ],
        "vec_id long, embedding array<double>, label int",
    )

    def key(rows):
        return {
            (r["id_a"], r["id_b"]): (
                r["rank_ab"],
                r["rank_ba"],
                round(r["cos"], 9),
            )
            for r in rows
        }

    arrow = key(
        mutual_knn(df, "vec_id", "embedding", "label", k=k, kernel="arrow").collect()
    )
    sql = key(
        mutual_knn(df, "vec_id", "embedding", "label", k=k, kernel="sql").collect()
    )
    assert arrow == sql


def test_mutual_knn_tiny_blocks_and_self_exclusion(spark):
    # 1-vector block emits nothing; duplicate vectors tie-break by id
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [1.0, 0.0], 0),
            (3, [0.9, 0.1], 0),
            (9, [5.0, 5.0], 7),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    rows = mutual_knn(df, "vec_id", "embedding", "label", k=2).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in rows}
    assert (1, 2) in pairs and all(9 not in p for p in pairs)


# ---------------------------------------------------------------------------
# cosine_neardup_pairs kernels (q35's operator)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed,thr", [(0, 0.2), (1, 0.6)])
def test_cosine_neardup_arrow_equals_sql_kernel(spark, seed, thr):
    from oco3_data_transformer_spark.operators.similarity import (
        cosine_neardup_pairs,
    )

    rng = np.random.default_rng(seed)
    n = 40
    rows = [
        (i, [float(x) for x in rng.normal(size=6)], int(i % 3))
        for i in range(n)
    ]
    # exact duplicates land cos=1.0 pairs; a zero vector must emit nothing
    rows.append((n, rows[0][1], rows[0][2]))
    rows.append((n + 1, [0.0] * 6, 0))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )

    def key(out):
        return {
            (r["id_a"], r["id_b"]): round(r["cos"], 9) for r in out.collect()
        }

    arrow = key(cosine_neardup_pairs(df, thr, block_col="label"))
    sql = key(cosine_neardup_pairs(df, thr, block_col="label", kernel="sql"))
    assert arrow == sql
    assert (0, n) in arrow  # the exact-dup pair survives any threshold <= 1
    assert all(n + 1 not in p for p in arrow)  # zero vector never pairs


# ---------------------------------------------------------------------------
# q125 composition: mutual-kNN -> components -> profile
# ---------------------------------------------------------------------------


def test_semantic_cluster_profile_hand_built(spark):
    """Two tight clusters + one isolated vector inside one label block:
    the composition must yield two multi-vector clusters keyed by their
    min id and a singleton with n_edges=0 / NULL cosines."""
    from oco3_data_transformer_spark.catalog import REGISTRY
    from oco3_data_transformer_spark.operators.dedup import (
        canonicalize_pairs_star,
    )
    from oco3_data_transformer_spark.operators.similarity import mutual_knn
    from pyspark.sql import functions as F

    def jitter(base, eps, i):
        return [x + eps * (i + 1) for x in base]

    rows = []
    for i in range(4):  # cluster A: ids 0-3
        rows.append((i, jitter([10.0, 0.0, 0.0], 0.01, i), 0))
    for i in range(3):  # cluster B: ids 10-12, orthogonal direction
        rows.append((10 + i, jitter([0.0, 10.0, 0.0], 0.01, i), 0))
    rows.append((99, [0.0, 0.0, 42.0], 0))  # isolated: orthogonal to both
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    edges = mutual_knn(emb, "vec_id", "embedding", "label", k=2)
    comp = canonicalize_pairs_star(
        emb.select(F.col("vec_id").alias("id")), edges.select("id_a", "id_b")
    )
    got = {
        r["canonical_id"]: r["n_vectors"]
        for r in comp.groupBy("canonical_id")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .collect()
    }
    # k=2 keeps within-cluster neighbors mutual; cross-cluster cosines ~0
    assert got[0] == 4 and got[10] == 3 and got[99] == 1


@pytest.mark.parametrize("splits", [1, 3, 7])
def test_mutual_knn_query_splits_identical(spark, splits):
    # query-side splitting is a parallelism knob, never a semantics one:
    # every split count yields the identical edge set (each query still
    # scores against its FULL block)
    rng = np.random.default_rng(11)
    n, k = 40, 4
    df = spark.createDataFrame(
        [
            (i, [float(x) for x in rng.normal(size=6)], int(i % 2))
            for i in range(n)
        ],
        "vec_id long, embedding array<double>, label int",
    )

    def key(rows):
        return {
            (r["id_a"], r["id_b"]): (r["rank_ab"], r["rank_ba"], round(r["cos"], 9))
            for r in rows
        }

    want = key(
        mutual_knn(df, "vec_id", "embedding", "label", k=k, kernel="sql").collect()
    )
    got = key(
        mutual_knn(
            df, "vec_id", "embedding", "label", k=k, query_splits=splits
        ).collect()
    )
    assert got == want and want


def test_triangle_regimes_identical(spark):
    # r10: broadcast-adjacency array_intersect regime vs the wedge-join
    # fallback (gate forced to 0) must count the identical triangles —
    # the two formulations enumerate the same (apex, mid, top) triples
    # because the oriented edge y->z exists iff rank(y) < rank(z), the
    # wedge-ordering predicate.
    rng = random.Random(13)
    edges = [(rng.randint(0, 60), rng.randint(0, 60)) for _ in range(400)]
    df = spark.createDataFrame(edges, "a long, b long")
    got_b = {
        (r["node"], r["deg"], r["n_tri"], round(r["lcc"], 9))
        for r in triangle_counts(df, "a", "b").collect()
    }
    got_w = {
        (r["node"], r["deg"], r["n_tri"], round(r["lcc"], 9))
        for r in triangle_counts(df, "a", "b", edge_broadcast_limit=0).collect()
    }
    assert got_b == got_w and got_b
