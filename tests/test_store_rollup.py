"""Continuous-aggregate model test: replay a random append/upsert/merge
write history and, after every write, incrementally refresh the monthly
rollup with just that batch's invalidation set — then assert the rollup is
bit-identical (DECIMAL sums, exact equality) to a from-scratch rebuild of
the same aggregate over the current facts."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from oco3_data_transformer_spark.schemas import STORE_SLICE
from oco3_data_transformer_spark.sinks import store

# two months so invalidation scoping actually has something to skip
DAYS = [dt.datetime(2024, 3, d) for d in (1, 15, 30)] + [
    dt.datetime(2024, 4, d) for d in (2, 28)
]
QFS = ["pre", "post"]


def _batch(spark, rng, batch_id):
    rows = []
    for _ in range(rng.randint(1, 6)):
        day = rng.choice(DAYS)
        qf = rng.choice(QFS)
        cell = rng.randint(0, 3)
        rows.append(
            ("oco3", "t1", qf, day, cell, cell, "xco2", float(batch_id * 100 + cell))
        )
    return spark.createDataFrame(rows, STORE_SLICE)


def _canon(df):
    return sorted(
        tuple(str(v) for v in row)
        for row in df.select(*sorted(df.columns)).collect()
    )


def test_incremental_refresh_matches_full_rebuild(spark, tmp_path):
    rng = random.Random(20260814)
    path = str(tmp_path / "store")
    rollup = str(tmp_path / "rollup")
    full = str(tmp_path / "rollup_full")
    wrote = False
    for step in range(10):
        df = _batch(spark, rng, step)
        action = rng.random()
        if action < 0.4 or not wrote:
            store.append(spark, df, path)
        elif action < 0.7:
            store.merge(spark, df, path)
        else:
            store.upsert(spark, df, path)
        wrote = True
        store.rollup_refresh(spark, path, rollup, store.touched_days_of(df))
        store.rollup_refresh(spark, path, full, None)  # full rebuild oracle
        assert _canon(spark.read.parquet(rollup)) == _canon(
            spark.read.parquet(full)
        ), f"rollup diverged at step {step}"


def test_rollup_readers_finalize_partials(spark, tmp_path):
    path = str(tmp_path / "store")
    rollup = str(tmp_path / "rollup")
    rows = [
        # March: values 1,3 -> mean 2; April of another year: value 5
        ("oco3", "t1", "post", dt.datetime(2024, 3, 1), 0, 0, "xco2", 1.0),
        ("oco3", "t1", "post", dt.datetime(2024, 3, 2), 1, 1, "xco2", 3.0),
        ("oco3", "t1", "post", dt.datetime(2025, 3, 9), 0, 0, "xco2", 5.0),
    ]
    store.append(spark, spark.createDataFrame(rows, STORE_SLICE), path)
    store.rollup_refresh(spark, path, rollup, None)

    monthly = {
        (r["month"].isoformat(), ): r
        for r in store.rollup_monthly(spark, rollup).collect()
    }
    assert monthly[("2024-03-01",)]["mean_value"] == 2.0
    assert monthly[("2024-03-01",)]["n_obs"] == 2
    assert monthly[("2024-03-01",)]["n_days"] == 2
    assert monthly[("2025-03-01",)]["mean_value"] == 5.0

    # month-of-year consolidation re-merges partials across years:
    # March overall mean = (1+3+5)/3 = 3.0
    moy = {r["moy"]: r for r in store.rollup_month_of_year(spark, rollup).collect()}
    assert moy[3]["mean_value"] == 3.0
    assert moy[3]["n_obs"] == 3 and moy[3]["n_days"] == 3


def test_incremental_refresh_skips_untouched_months(spark, tmp_path):
    """A write touching only April must not rewrite March rollup files."""
    import glob

    path = str(tmp_path / "store")
    rollup = str(tmp_path / "rollup")
    b1 = spark.createDataFrame(
        [("oco3", "t1", "post", dt.datetime(2024, 3, 1), 0, 0, "xco2", 1.0)],
        STORE_SLICE,
    )
    store.append(spark, b1, path)
    store.rollup_refresh(spark, path, rollup, store.touched_days_of(b1))
    march_files = set(glob.glob(f"{rollup}/mission=*/qf=*/month=2024-03*/**", recursive=True))
    assert march_files

    b2 = spark.createDataFrame(
        [("oco3", "t1", "post", dt.datetime(2024, 4, 5), 0, 0, "xco2", 2.0)],
        STORE_SLICE,
    )
    store.append(spark, b2, path)
    store.rollup_refresh(spark, path, rollup, store.touched_days_of(b2))
    assert march_files == set(
        glob.glob(f"{rollup}/mission=*/qf=*/month=2024-03*/**", recursive=True)
    )
    months = {r["month"] for r in spark.read.parquet(rollup).select("month").collect()}
    assert {m.isoformat() for m in months} == {"2024-03-01", "2024-04-01"}
