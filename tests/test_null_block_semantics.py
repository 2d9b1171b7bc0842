"""NULL block ids must behave identically across kernels (ADVICE r05).

An equi-join (the kernel='sql' path and the DuckDB oracle) never matches
NULL keys, so NULL-block rows contribute no pairs and no neighbors. The
arrow groupBy kernels must share that semantics rather than forming a
spurious NULL-block group.
"""

from __future__ import annotations

from oco3_data_transformer_spark.operators.similarity import (
    cosine_neardup_pairs,
    mutual_knn,
)


def _vec_df(spark):
    rows = [
        (1, [1.0, 0.0], "a"),
        (2, [1.0, 0.01], "a"),
        (3, [0.0, 1.0], None),  # NULL block: must never pair/neighbor
        (4, [0.01, 1.0], None),
        (5, [1.0, 0.02], "b"),
        (6, [1.0, 0.03], "b"),
    ]
    return spark.createDataFrame(rows, "id int, emb array<double>, blk string")


def test_cosine_neardup_null_block_parity(spark):
    df = _vec_df(spark)
    kw = dict(threshold=0.9, id_col="id", vec_col="emb", block_col="blk")
    arrow = cosine_neardup_pairs(df, kernel="arrow", **kw)
    sql = cosine_neardup_pairs(df, kernel="sql", **kw)
    got_a = sorted((r.id_a, r.id_b) for r in arrow.collect())
    got_s = sorted((r.id_a, r.id_b) for r in sql.collect())
    assert got_a == got_s == [(1, 2), (5, 6)]
    # the near-identical NULL-block pair (3,4) must not appear
    assert (3, 4) not in got_a


def test_mutual_knn_null_block_parity(spark):
    df = _vec_df(spark)
    kw = dict(id_col="id", vec_col="emb", block_col="blk", k=2)
    arrow = mutual_knn(df, kernel="arrow", **kw)
    sql = mutual_knn(df, kernel="sql", **kw)
    got_a = sorted((r.id_a, r.id_b) for r in arrow.collect())
    got_s = sorted((r.id_a, r.id_b) for r in sql.collect())
    assert got_a == got_s
    assert all(3 not in e and 4 not in e for e in got_a)
