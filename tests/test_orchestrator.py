"""Deploy orchestrator end-to-end (ref tools/deploy/run.py:485-862):
availability classification, tail hold-back watermark, append vs repair
routing, ledger update; a late granule for a processed day triggers a
day-scoped re-stage + upsert."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from oco3_data_transformer_spark import orchestrator as orc

D1, D2 = dt.date(2024, 3, 1), dt.date(2024, 3, 2)


def _features(spark, rows):
    return spark.createDataFrame(rows, orc.FEATURES_SCHEMA)


def _transform(batch):
    """Feature rows -> STORE_SLICE rows: two grid cells per granule, value =
    granule-name length (lets tests see exactly which granules contributed)."""
    cells = batch.select(
        "mission", "granule", "day",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("lat_idx"),
    )
    return cells.select(
        "mission",
        F.lit("t0").alias("target_id"),
        F.lit("pre").alias("qf"),
        F.col("day").cast("timestamp").alias("time"),
        F.col("lat_idx").cast("int"),
        F.length("granule").cast("int").alias("lon_idx"),
        F.lit("xco2").alias("variable"),
        F.length("granule").cast("double").alias("value"),
    )


@pytest.fixture()
def cfg(tmp_path):
    return orc.DeployConfig(
        store_path=str(tmp_path / "store"),
        ledger_path=str(tmp_path / "ledger"),
        missions=("oco3", "oco2"),
        date_ranges={"oco2": (dt.date(2014, 9, 6), dt.date(2024, 12, 31))},
    )


def test_classification_and_gap(spark, cfg):
    cfg.known_gaps = (("oco2", D2, D2),)
    feats = _features(spark, [("g1", "oco3", D1), ("g2", "oco2", D1), ("g3", "oco3", D2)])
    st = {
        (r.day, r.mission): r.status
        for r in orc.classify_availability(spark, feats, cfg).collect()
    }
    assert st[(D1, "oco3")] == "PRESENT" and st[(D1, "oco2")] == "PRESENT"
    assert st[(D2, "oco3")] == "PRESENT"
    assert st[(D2, "oco2")] == "EXPECTED_ABSENT"  # known gap, not ABSENT


def test_tail_holdback(spark, cfg):
    # day2 misses oco2 (no gap declared) -> ABSENT -> watermark stays at day1
    feats = _features(spark, [("g1", "oco3", D1), ("g2", "oco2", D1), ("g3", "oco3", D2)])
    wm = orc.holdback_watermark(orc.classify_availability(spark, feats, cfg))
    assert wm == D1


def test_deploy_cycle_append_then_late_granule_repair(spark, cfg):
    # ---- cycle 1: day1 complete, day2 incomplete -> only day1 processed
    feats1 = _features(
        spark,
        [("g1a", "oco3", D1), ("g1bb", "oco2", D1), ("g2a", "oco3", D2)],
    )
    rep1 = orc.run_deploy(spark, feats1, _transform, cfg)
    assert rep1["append_days"] == [str(D1)] and rep1["repair_days"] == []
    assert rep1["rows_appended"] == 4  # 2 granules x 2 cells
    led1 = spark.read.parquet(cfg.ledger_path)
    assert {r.granule for r in led1.collect()} == {"g1a", "g1bb"}

    # unchanged re-run: nothing to do (idempotent planning)
    rep_noop = orc.run_deploy(spark, feats1, _transform, cfg)
    assert rep_noop["append_days"] == [] and rep_noop["repair_days"] == []

    # ---- cycle 2: late oco3 granule lands for processed day1; day2 completes
    feats2 = _features(
        spark,
        [
            ("g1a", "oco3", D1), ("g1bb", "oco2", D1), ("g1c-late", "oco3", D1),
            ("g2a", "oco3", D2), ("g2bb", "oco2", D2),
        ],
    )
    rep2 = orc.run_deploy(spark, feats2, _transform, cfg)
    assert rep2["repair_days"] == [str(D1)]
    assert rep2["append_days"] == [str(D2)]

    stored = spark.read.parquet(cfg.store_path).withColumn("d", F.to_date("time"))
    day1_vals = {r.value for r in stored.filter(F.col("d") == D1).collect()}
    # day1 rebuilt from ALL its granules incl. the late one (len('g1c-late')=8)
    assert day1_vals == {3.0, 4.0, 8.0}
    day2_vals = {r.value for r in stored.filter(F.col("d") == D2).collect()}
    assert day2_vals == {3.0, 4.0}

    led2 = spark.read.parquet(cfg.ledger_path)
    assert {r.granule for r in led2.filter(F.col("day") == D1).collect()} == {
        "g1a", "g1bb", "g1c-late"
    }
    # third run: steady state again
    rep3 = orc.run_deploy(spark, feats2, _transform, cfg)
    assert rep3["append_days"] == [] and rep3["repair_days"] == []
