"""Streaming ingest (S5, §2.10): file-drop source → foreachBatch with
completeness hold-back, idempotent append, late-data repair, ledger, and
dead-letter split — driven with Trigger.AvailableNow batches."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oco3_data_transformer_spark.sinks import store
from oco3_data_transformer_spark.streaming import ingest

RAW_SCHEMA = T.StructType(
    [
        T.StructField("granule", T.StringType()),
        T.StructField("mission", T.StringType()),
        T.StructField("sounding_idx", T.LongType()),
        T.StructField("time", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)

D1 = dt.datetime(2024, 3, 1)
D2 = dt.datetime(2024, 3, 2)


def _transform(rows):
    """Toy slice transform: one store row per sounding."""
    return rows.select(
        F.col("mission"),
        F.lit("t1").alias("target_id"),
        F.lit("pre").alias("qf"),
        F.date_trunc("DAY", "time").alias("time"),
        F.col("sounding_idx").cast("int").alias("lat_idx"),
        F.col("sounding_idx").cast("int").alias("lon_idx"),
        F.lit("xco2").alias("variable"),
        F.col("value"),
    )


@pytest.fixture()
def cfg(tmp_path):
    return ingest.IngestConfig(
        input_dir=str(tmp_path / "drop"),
        store_path=str(tmp_path / "store"),
        ledger_path=str(tmp_path / "ledger"),
        dead_letter_path=str(tmp_path / "dead"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        expected_missions=("oco3", "oco2"),
        expected_absent=(("oco2", "2024-03-02"),),
    )


def _drop(spark, cfg, rows, subdir):
    df = spark.createDataFrame(rows, RAW_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(cfg.input_dir)


def _run(spark, cfg):
    q = ingest.start_ingest(spark, cfg, RAW_SCHEMA, _transform, available_now=True)
    q.awaitTermination(120)


def test_holdback_then_complete_then_repair(spark, cfg, tmp_path):
    # Batch 1: D1 has only oco3 (incomplete — held back);
    #          D2 has oco3 and oco2 is EXPECTED_ABSENT (complete).
    _drop(
        spark, cfg,
        [
            ("g1", "oco3", 0, D1, 1.0),
            ("g1", "oco3", 1, D1, 2.0),
            ("g2", "oco3", 0, D2, 5.0),
        ],
        "b1",
    )
    _run(spark, cfg)
    stored = spark.read.parquet(cfg.store_path)
    days = {r.day for r in stored.select(F.to_date("time").alias("day")).distinct().collect()}
    assert days == {D2.date()}  # D1 deferred

    # Batch 2: oco2 for D1 arrives -> D1 becomes complete... but the
    # oco3 D1 rows were consumed by batch 1. The orchestrator's contract is
    # at-least-once: re-drop the full D1 day (the reference re-stages all
    # granules of a repair day, ref tools/deploy/run.py:315-331).
    _drop(
        spark, cfg,
        [
            ("g1", "oco3", 0, D1, 1.0),
            ("g1", "oco3", 1, D1, 2.0),
            ("g3", "oco2", 0, D1, 9.0),
        ],
        "b2",
    )
    _run(spark, cfg)
    stored = spark.read.parquet(cfg.store_path)
    days = {r.day for r in stored.select(F.to_date("time").alias("day")).distinct().collect()}
    assert days == {D1.date(), D2.date()}

    ledger = spark.read.parquet(cfg.ledger_path)
    assert {r.granule for r in ledger.select("granule").distinct().collect()} == {
        "g1", "g2", "g3"
    }

    # Batch 3: late data for processed D2 -> upsert (repair) replaces the day
    _drop(spark, cfg, [("g4", "oco3", 0, D2, 7.0)], "b3")
    _run(spark, cfg)
    d2_vals = {
        r.value
        for r in spark.read.parquet(cfg.store_path)
        .filter(F.to_date("time") == D2.date()).collect()
    }
    assert d2_vals == {7.0}


def test_zarr_mirror_appends_and_repairs(spark, tmp_path):
    """With zarr_mirror_path set, each micro-batch's writes also land in
    a per-identity Zarr v2 store: fresh days append (keep-first makes
    replays idempotent), late-data repairs replace the day's slice."""
    import numpy as np

    from oco3_data_transformer_spark.sinks import zarrlite

    cfg = ingest.IngestConfig(
        input_dir=str(tmp_path / "drop"),
        store_path=str(tmp_path / "store"),
        ledger_path=str(tmp_path / "ledger"),
        dead_letter_path=str(tmp_path / "dead"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        expected_missions=("oco3",),
        zarr_mirror_path=str(tmp_path / "zarr"),
        zarr_lat_res=4,
        zarr_lon_res=4,
        zarr_bbox=(-2.0, -2.0, 2.0, 2.0),
        zarr_chunk_t=4,
    )
    zpath = str(tmp_path / "zarr" / "oco3_t1_pre.zarr")

    _drop(spark, cfg, [("g1", "oco3", 0, D1, 1.0), ("g1", "oco3", 1, D1, 2.0)], "b1")
    _run(spark, cfg)
    arr, _ = zarrlite.read_array(zpath, "xco2")
    assert arr.shape == (1, 4, 4)
    assert arr[0, 0, 0] == 1.0 and arr[0, 1, 1] == 2.0

    # batch 2: a later day appends along time (two cells)
    _drop(spark, cfg,
          [("g2", "oco3", 2, D2, 5.0), ("g2", "oco3", 3, D2, 6.0)], "b2")
    _run(spark, cfg)
    arr, _ = zarrlite.read_array(zpath, "xco2")
    assert arr.shape == (2, 4, 4) and arr[1, 2, 2] == 5.0 and arr[1, 3, 3] == 6.0

    # batch 3: late data for processed D2 -> cell-level merge, matching
    # the columnar store: the carried cell is replaced, the day's other
    # cell survives
    _drop(spark, cfg, [("g3", "oco3", 2, D2, 7.0)], "b3")
    _run(spark, cfg)
    arr, _ = zarrlite.read_array(zpath, "xco2")
    assert arr.shape == (2, 4, 4) and arr[1, 2, 2] == 7.0
    assert arr[1, 3, 3] == 6.0  # unreplaced cell of the repaired day
    assert arr[0, 0, 0] == 1.0  # day 1 untouched
    assert np.isnan(arr[1, 0, 0])


def test_poison_rows_dead_lettered(spark, cfg):
    _drop(
        spark, cfg,
        [
            ("g1", "oco3", 0, D1, 1.0),
            (None, "oco3", None, D1, 2.0),  # poison: no granule/idx
        ],
        "b1",
    )
    _run(spark, cfg)
    dead = spark.read.parquet(cfg.dead_letter_path)
    assert dead.count() == 1
    assert dead.collect()[0].value == 2.0


def test_mission_dispatch_routes_per_mission(spark, cfg):
    # distinct per-mission variables prove each branch ran its own pipeline
    def mk(variable):
        def t(rows):
            return _transform(rows).withColumn("variable", F.lit(variable))
        return t

    dispatch = ingest.mission_dispatch({"oco3": mk("xco2"), "oco2": mk("sif")})
    _drop(
        spark, cfg,
        [
            ("g1", "oco3", 0, D1, 1.0),
            ("g2", "oco2", 0, D1, 2.0),
            ("g9", "unconfigured", 0, D1, 3.0),  # dropped
        ],
        "b1",
    )
    q = ingest.start_ingest(spark, cfg, RAW_SCHEMA, dispatch, available_now=True)
    q.awaitTermination(120)
    stored = spark.read.parquet(cfg.store_path)
    got = {(r.mission, r.variable, r.value) for r in stored.collect()}
    assert got == {("oco3", "xco2", 1.0), ("oco2", "sif", 2.0)}


def test_ingest_maintains_continuous_aggregate(spark, tmp_path):
    """With rollup_path set, every micro-batch's writes refresh the monthly
    rollup; after an append batch AND a late-data repair batch, the rollup
    equals a from-scratch rebuild over the final store."""
    cfg = ingest.IngestConfig(
        input_dir=str(tmp_path / "drop"),
        store_path=str(tmp_path / "store"),
        ledger_path=str(tmp_path / "ledger"),
        dead_letter_path=str(tmp_path / "dead"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        expected_missions=("oco3",),
        rollup_path=str(tmp_path / "rollup"),
    )
    _drop(spark, cfg, [("g1", "oco3", 0, D1, 1.0), ("g1", "oco3", 1, D1, 3.0)], "b1")
    _run(spark, cfg)
    # late data for processed D1 -> repair path; rollup must follow
    _drop(spark, cfg, [("g2", "oco3", 2, D1, 5.0)], "b2")
    _run(spark, cfg)

    full = str(tmp_path / "rollup_full")
    store.rollup_refresh(spark, cfg.store_path, full, None)

    def canon(path):
        df = spark.read.parquet(path)
        return sorted(
            tuple(str(v) for v in row)
            for row in df.select(*sorted(df.columns)).collect()
        )

    assert canon(cfg.rollup_path) == canon(full)
    monthly = store.rollup_monthly(spark, cfg.rollup_path).collect()
    assert len(monthly) == 1
    assert monthly[0]["n_obs"] == 3 and monthly[0]["mean_value"] == 3.0
