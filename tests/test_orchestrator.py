"""Deploy orchestrator end-to-end (ref tools/deploy/run.py:485-862):
availability classification, tail hold-back watermark, append vs repair
routing, ledger update; a late granule for a processed day triggers a
day-scoped re-stage + upsert."""

from __future__ import annotations

import datetime as dt

import json

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


def test_empty_catalog_is_a_clean_noop(spark, cfg):
    feats = _features(spark, [])
    rep = orc.run_deploy(spark, feats, _transform, cfg)
    assert rep == {
        "watermark": None, "append_days": [], "repair_days": [],
        "rows_appended": 0, "rows_repaired": 0,
    }


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
    # the repair rewrite is reported, not silently folded into 0
    assert rep2["rows_repaired"] == 6  # 3 day1 granules x 2 cells

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


def test_granule_revocation_triggers_repair(spark, cfg):
    feats1 = _features(spark, [("g1a", "oco3", D1), ("g1b", "oco2", D1)])
    orc.run_deploy(spark, feats1, _transform, cfg)
    # g1b vanishes from the catalog (revoked); set changed -> repair
    feats2 = _features(spark, [("g1a", "oco3", D1)])
    # oco2 absent for D1 with no gap declared would hold the day back; mark
    # it expected-absent so the day stays processable
    cfg.known_gaps = (("oco2", D1, D1),)
    rep = orc.run_deploy(spark, feats2, _transform, cfg)
    assert rep["repair_days"] == [str(D1)]
    stored = spark.read.parquet(cfg.store_path)
    assert {r.value for r in stored.collect()} == {3.0}  # only g1a remains
    led = spark.read.parquet(cfg.ledger_path)
    assert {r.granule for r in led.collect()} == {"g1a"}


def _write_oco3_granule(path, day: str, n=10):
    """npz OCO-3 granule with per-sounding target ids (deploy CLI test)."""
    import numpy as np

    lat = np.linspace(10.0, 10.4, n)
    lon = np.linspace(20.0, 20.4, n)
    d = 0.03
    np.savez(
        path,
        sounding_idx=np.arange(n, dtype=np.int64),
        sounding_id=np.arange(n, dtype=np.int64) + 1000,
        time=np.full(n, np.datetime64(f"{day}T00:00:00", "us")),
        latitude=lat.astype(np.float32),
        longitude=lon.astype(np.float32),
        vertex_latitude=np.stack([lat - d, lat - d, lat + d, lat + d], 1).astype(np.float32),
        vertex_longitude=np.stack([lon - d, lon + d, lon + d, lon - d], 1).astype(np.float32),
        operation_mode=np.full(n, 4, dtype=np.int8),
        target_id=np.array(["fossil0001"] * n),
        target_name=np.array(["Fossil One"] * n),
        xco2_quality_flag=(np.arange(n) % 3 == 0).astype(np.int8),
        xco2=np.linspace(400, 401, n),
        xco2_uncertainty=np.full(n, 0.5),
    )


def test_deploy_cli_end_to_end(spark, tmp_path):
    """deploy_main over real npz granules: first cycle appends the complete
    day; a late granule next cycle repairs it through the full pipeline."""
    g1 = tmp_path / "oco3_LtCO2_240301_B11000_1.npz"
    _write_oco3_granule(g1, "2024-03-01")
    targets = {
        "fossil0001": {
            "name": "Fossil One",
            "bbox": {"min_lon": 19.9, "min_lat": 9.9, "max_lon": 20.6, "max_lat": 10.6},
        }
    }
    (tmp_path / "targets.json").write_text(json.dumps(targets))
    (tmp_path / "cfg.yaml").write_text(
        f"""
output:
  local: {tmp_path}/store
  drop-empty: true
  naming: {{pre_qf: pre_root, post_qf: post_root}}
input: {{files: []}}
grid: {{latitude: 6, longitude: 6, method: nearest}}
target-file: {{oco3: {tmp_path}/targets.json}}
"""
    )
    catalog = [{"path": str(g1), "mission": "oco3"}]
    (tmp_path / "catalog.json").write_text(json.dumps(catalog))

    rc = orc.deploy_main(
        ["-i", f"{tmp_path}/cfg.yaml", "--catalog", f"{tmp_path}/catalog.json"]
    )
    assert rc == 0
    stored1 = spark.read.parquet(f"{tmp_path}/store")
    n1 = stored1.count()
    assert n1 > 0
    ledger = spark.read.parquet(f"{tmp_path}/store_ledger")
    assert ledger.count() == 1 and ledger.collect()[0].day == D1

    # late second granule for the same day -> repair re-stages the full day
    g2 = tmp_path / "oco3_LtCO2_240301_B11000_2.npz"
    _write_oco3_granule(g2, "2024-03-01", n=6)
    catalog.append({"path": str(g2), "mission": "oco3"})
    (tmp_path / "catalog.json").write_text(json.dumps(catalog))
    rc = orc.deploy_main(
        ["-i", f"{tmp_path}/cfg.yaml", "--catalog", f"{tmp_path}/catalog.json"]
    )
    assert rc == 0
    stored2 = spark.read.parquet(f"{tmp_path}/store")
    assert stored2.count() >= n1  # day rebuilt from both granules
    assert {r.granule for r in spark.read.parquet(f"{tmp_path}/store_ledger").collect()} == {
        str(g1), str(g2)
    }


def test_deploy_maintains_rollup(spark, tmp_path):
    """With rollup_path set, a deploy cycle's append AND a later repair
    cycle both leave the rollup identical to a full rebuild."""
    import datetime as dt

    from oco3_data_transformer_spark import orchestrator as orch
    from oco3_data_transformer_spark.schemas import STORE_SLICE
    from oco3_data_transformer_spark.sinks import store

    cfg = orch.DeployConfig(
        store_path=str(tmp_path / "store"),
        ledger_path=str(tmp_path / "ledger"),
        missions=("oco3",),
        rollup_path=str(tmp_path / "rollup"),
    )
    day = dt.date(2024, 3, 1)

    def transform_factory(value):
        def transform(batch):
            rows = [
                ("oco3", "t1", "pre", dt.datetime(2024, 3, 1), 0, 0, "xco2", value),
                ("oco3", "t1", "pre", dt.datetime(2024, 3, 1), 1, 1, "xco2", value + 1),
            ]
            return spark.createDataFrame(rows, STORE_SLICE)

        return transform

    feats = spark.createDataFrame(
        [("g1", "oco3", day)], orch.FEATURES_SCHEMA
    )
    r1 = orch.run_deploy(spark, feats, transform_factory(1.0), cfg)
    assert r1["rows_appended"] == 2

    def canon(path):
        df = spark.read.parquet(path)
        return sorted(
            tuple(str(v) for v in row)
            for row in df.select(*sorted(df.columns)).collect()
        )

    full = str(tmp_path / "full")
    store.rollup_refresh(spark, cfg.store_path, full, None)
    assert canon(cfg.rollup_path) == canon(full)

    # repair cycle: new granule for the processed day -> upsert, new values
    feats2 = spark.createDataFrame(
        [("g1", "oco3", day), ("g2", "oco3", day)], orch.FEATURES_SCHEMA
    )
    r2 = orch.run_deploy(spark, feats2, transform_factory(10.0), cfg)
    assert r2["rows_repaired"] == 2
    store.rollup_refresh(spark, cfg.store_path, full, None)
    assert canon(cfg.rollup_path) == canon(full)
    monthly = store.rollup_monthly(spark, cfg.rollup_path).collect()
    assert len(monthly) == 1 and monthly[0]["mean_value"] == 10.5
