"""IVF k-means build (similarity.kmeans_centroids): convergence on separable
clusters, determinism, and end-to-end recall through ivf_assign + ivf_knn."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from oco3_data_transformer_spark.operators import similarity as sim
from oco3_data_transformer_spark.sources.registry import load

SF = "/root/testdata/sf0.001"


def _separable(spark, n_per=30, dim=8, seed=3):
    rng = np.random.default_rng(seed)
    anchors = np.eye(3, dim) * 10.0
    rows = []
    i = 0
    for a in anchors:
        for _ in range(n_per):
            rows.append((i, [float(x) for x in a + rng.normal(0, 0.2, dim)]))
            i += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_recovers_separable_clusters(spark):
    df = _separable(spark)
    cents = sim.kmeans_centroids(df, k=3, iters=5)
    got = np.array([r.centroid for r in cents.orderBy("cell").collect()])
    # each anchor direction recovered by exactly one centroid
    anchors = np.eye(3, 8) * 10.0
    matched = set()
    for a in anchors:
        d = np.linalg.norm(got - a, axis=1)
        j = int(np.argmin(d))
        assert d[j] < 1.0, f"anchor {a[:3]} unrecovered (dist {d[j]})"
        matched.add(j)
    assert len(matched) == 3

    # assignment through ivf_assign puts every vector in a cluster of size 30
    assigned = sim.ivf_assign(df, cents)
    sizes = sorted(
        r.n for r in assigned.groupBy("cell").agg(F.count("*").alias("n")).collect()
    )
    assert sizes == [30, 30, 30]


def test_kmeans_deterministic(spark):
    df = _separable(spark)
    a = sim.kmeans_centroids(df, k=3, iters=3).orderBy("cell").collect()
    b = sim.kmeans_centroids(df.repartition(7), k=3, iters=3).orderBy("cell").collect()
    # same init (min ids) and same additions per cell -> same result up to
    # float addition order; separable data keeps assignments identical
    for ra, rb in zip(a, b):
        assert ra.cell == rb.cell
        assert np.allclose(ra.centroid, rb.centroid, atol=1e-9)


def test_ivf_knn_with_built_centroids_has_high_recall(spark):
    emb = load(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.brute_force_knn(emb, queries, k=5).collect()
    }
    cents = sim.kmeans_centroids(emb, k=8, iters=4)
    assigned = sim.ivf_assign(emb.select("vec_id", "embedding"), cents)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in sim.ivf_knn(assigned, cents, queries, k=5, nprobe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"recall {recall}"


def test_kmeans_sampled_build_still_recovers_clusters(spark):
    # the 100 TB path: build centroids from a corpus SAMPLE; separable
    # clusters survive heavy sampling
    df = _separable(spark, n_per=60)
    cents = sim.kmeans_centroids(df, k=3, iters=4, sample_fraction=0.5)
    got = np.array([r.centroid for r in cents.orderBy("cell").collect()])
    anchors = np.eye(3, 8) * 10.0
    for a in anchors:
        assert np.linalg.norm(got - a, axis=1).min() < 1.5
    # assignment over the FULL corpus still lands everything in 3 cells
    sizes = sorted(
        r.n
        for r in sim.ivf_assign(df, cents)
        .groupBy("cell").agg(F.count("*").alias("n")).collect()
    )
    assert sum(sizes) == 180 and len(sizes) == 3


def test_knn_arrow_kernel_matches_sql_kernel(spark):
    # differential test: the Arrow matmul kernel and the relational
    # HOF-fold kernel must produce identical (query, neighbor, rank) sets
    # (cos agrees to float tolerance; ranking uses the same tiebreak)
    emb = load(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    arrow = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in sim.brute_force_knn(emb, queries, k=5, kernel="arrow").collect()
    }
    sql = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in sim.brute_force_knn(emb, queries, k=5, kernel="sql").collect()
    }
    assert arrow == sql


def test_ivf_assign_arrow_matches_sql(spark):
    emb = load(spark, SF, "embeddings")
    cents = emb.groupBy(F.col("label").alias("cell")).agg(
        F.min_by("embedding", "vec_id").alias("centroid")
    )
    a = {
        (r.vec_id, r.cell)
        for r in sim.ivf_assign(
            emb.select("vec_id", "embedding"), cents, kernel="arrow"
        ).collect()
    }
    b = {
        (r.vec_id, r.cell)
        for r in sim.ivf_assign(
            emb.select("vec_id", "embedding"), cents, kernel="sql"
        ).collect()
    }
    assert a == b


def test_knn_empty_query_set(spark):
    emb = load(spark, SF, "embeddings")
    out = sim.brute_force_knn(emb, emb.filter(F.col("vec_id") < 0), k=5)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "rank", "cos"]
