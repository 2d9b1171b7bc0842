"""Skew-salting join: results identical to a plain join; salt spreads the
hot key across partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from oco3_data_transformer_spark.operators.joins import salted_join


def test_salted_join_matches_plain_join(spark):
    # heavily skewed fact: 90% of rows share key 7
    big = spark.range(1000).select(
        F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame([(k, f"d{k}") for k in range(50)], ["k", "name"])
    plain = big.join(small, "k").groupBy("k", "name").agg(F.sum("v").alias("s"))
    salted = salted_join(big, small, "k", salt_buckets=8).groupBy("k", "name").agg(
        F.sum("v").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_left_join_preserves_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (99, "b")], ["k", "v"])
    small = spark.createDataFrame([(1, "one")], ["k", "name"])
    out = salted_join(big, small, "k", salt_buckets=4, how="left").collect()
    got = {(r.k, r.v): r.name for r in out}
    assert got == {(1, "a"): "one", (99, "b"): None}
