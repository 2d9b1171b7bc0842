"""tune_for_input policy (session.py): small inputs get reduced shuffle
width + AQE off (the measured local-floor fix, scripts/floor_matrix.py);
inputs at/above SMALL_INPUT_BYTES keep the untouched cluster defaults —
the property that makes the tuner safe to ship (it can never trade
100 TB robustness for microbench latency)."""

from __future__ import annotations

from oco3_data_transformer_spark import session as sess_mod
from oco3_data_transformer_spark.session import (
    DEFAULT_SHUFFLE_PARTITIONS,
    tune_for_input,
)


def test_small_input_reduces_width_and_disables_aqe(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(100).write.parquet(p)
    applied = tune_for_input(spark, [p])
    assert applied["spark.sql.adaptive.enabled"] == "false"
    assert 8 <= int(applied["spark.sql.shuffle.partitions"]) <= DEFAULT_SHUFFLE_PARTITIONS
    # scan fan-out: small inputs also shrink the split size so the map
    # side uses the cores (PERF.md r7)
    assert int(applied["spark.sql.files.maxPartitionBytes"]) == 4 << 20
    assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    # restore for other tests sharing the session
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 << 20))


def test_large_input_keeps_cluster_defaults(spark, tmp_path, monkeypatch):
    p = str(tmp_path / "t.parquet")
    spark.range(100).write.parquet(p)
    # make the written bytes count as "large" without writing a GiB
    monkeypatch.setattr(sess_mod, "SMALL_INPUT_BYTES", 1)
    applied = tune_for_input(spark, [p])
    assert applied["spark.sql.adaptive.enabled"] == "true"
    assert int(applied["spark.sql.shuffle.partitions"]) == DEFAULT_SHUFFLE_PARTITIONS
    assert int(applied["spark.sql.files.maxPartitionBytes"]) == 128 << 20


def test_missing_paths_count_as_empty(spark, tmp_path):
    applied = tune_for_input(spark, [str(tmp_path / "absent.parquet")])
    assert applied["spark.sql.adaptive.enabled"] == "false"
    assert int(applied["spark.sql.shuffle.partitions"]) == 8
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
