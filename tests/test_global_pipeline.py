"""Global-mode pipeline (G2/G6/G7/G9): shared mesh, footprint-union mask,
first-wins metadata rasterization, empty-day densification."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from oco3_data_transformer_spark.plans import pipeline as P
from oco3_data_transformer_spark.schemas import SOUNDINGS_OCO3

DAY = dt.datetime(2024, 3, 1)


def _sounding(i, mode, target, qf=0, lat=10.0, lon=20.0, xco2=400.0, d=2.0):
    return (
        "g1", i, 1000 + i, DAY, lat, lon,
        [lat - d, lat - d, lat + d, lat + d],
        [lon - d, lon + d, lon + d, lon - d],
        mode, target, f"name-{target}", qf, xco2, 0.5,
    )


@pytest.fixture(scope="module")
def global_out(spark):
    rows = []
    i = 0
    # region 1: SAM at (10, 20), fossil -- written FIRST (lower region_id)
    for k in range(5):
        rows.append(_sounding(i, 4, "fossil0001", 0, 10.0, 20.0)); i += 1
    # region 2: SAM at the SAME location, volcano -- overlapping footprints
    for k in range(5):
        rows.append(_sounding(i, 4, "volcano0009", 0, 10.0, 20.0, xco2=410.0)); i += 1
    # region 3: Target mode far away at (-40, 100)
    for k in range(4):
        rows.append(_sounding(i, 2, "ecostress_x", 0, -40.0, 100.0, xco2=420.0)); i += 1
    soundings = spark.createDataFrame(rows, SOUNDINGS_OCO3)
    out = P.process_oco3_global(soundings, lon_res=37, lat_res=19).persist()
    yield out
    out.unpersist()


def test_mask_keeps_footprint_pixels_only(global_out):
    n = global_out.count()
    assert 0 < n < 2 * 37 * 19  # strict subset of both QF meshes
    # pixels exist near both clusters
    near1 = global_out.filter((F.col("lat").between(5, 15)) & (F.col("lon").between(15, 25)))
    near2 = global_out.filter((F.col("lat").between(-45, -35)) & (F.col("lon").between(95, 105)))
    assert near1.count() > 0 and near2.count() > 0


def test_first_wins_metadata(global_out):
    # overlapping fossil/volcano footprints: fossil has the lower region id
    # (earlier sounding range) so it wins every contested pixel
    contested = global_out.filter(
        (F.col("lat").between(7, 13)) & (F.col("lon").between(17, 23))
        & (F.col("qf") == "pre")
    )
    ids = {r.target_id for r in contested.select("target_id").collect()}
    assert "fossil0001" in ids and "volcano0009" not in ids


def test_type_codes_and_mode(global_out):
    rows = global_out.select("target_id", "target_type", "operation_mode").distinct().collect()
    by_id = {r.target_id: r for r in rows}
    assert by_id["ecostress_x"].operation_mode == 2
    assert by_id["fossil0001"].operation_mode == 4
    # prefix type codes differ between fossil and ecostress (C5)
    assert by_id["fossil0001"].target_type != by_id["ecostress_x"].target_type


def test_values_from_nearest_sounding(global_out):
    far = global_out.filter(F.col("target_id") == "ecostress_x")
    vals = {r.xco2 for r in far.select("xco2").collect()}
    assert vals == {420.0}


def test_densify_missing_day(spark, global_out):
    template = global_out.select("qf", "lat_idx", "lon_idx", "lat", "lon").distinct()
    filled = P.densify_missing_day(template, dt.datetime(2024, 3, 2), ["xco2", "xco2_uncertainty"])
    assert filled.count() == template.count()
    r = filled.limit(1).collect()[0]
    assert r.xco2 is None and r.target_id is None
    assert r.time == dt.datetime(2024, 3, 2)
    # union with the real day stays rectangular (same column set)
    assert set(filled.columns) == set(global_out.columns)
