"""Product lifecycle end-to-end: npz granules → batch run (segment/QF/grid/
mask → store) → climatology tool over the store → dense-raster export →
checksum — every stage consuming the previous one's real output."""

from __future__ import annotations

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from oco3_data_transformer_spark import tools
from oco3_data_transformer_spark.config import RunConfig
from oco3_data_transformer_spark.main import run_batch
from oco3_data_transformer_spark.sinks import export as export_ops


def _granule(path, day, n=12):
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


def test_full_product_lifecycle(spark, tmp_path, capsys):
    # two months of data so the climatology has two spans
    g1 = tmp_path / "oco3_LtCO2_240301_B11000_1.npz"
    g2 = tmp_path / "oco3_LtCO2_240402_B11000_1.npz"
    _granule(g1, "2024-03-01")
    _granule(g2, "2024-04-02")
    (tmp_path / "targets.json").write_text(json.dumps({
        "fossil0001": {
            "name": "Fossil One",
            "bbox": {"min_lon": 19.9, "min_lat": 9.9, "max_lon": 20.6, "max_lat": 10.6},
        }
    }))
    cfg = RunConfig.parse(f"""
output:
  local: {tmp_path}/store
  drop-empty: true
  naming: {{pre_qf: pre_root, post_qf: post_root}}
input:
  files: [{g1}, {g2}]
grid: {{latitude: 6, longitude: 6, method: nearest}}
target-file: {{oco3: {tmp_path}/targets.json}}
""")
    report = run_batch(spark, cfg)
    assert report["missions"]["oco3"]["rows_appended"] > 0
    assert report["verify"]["duplicate_keys"] == 0

    # climatology tool over the freshly-written store
    rc = tools.main(["climatology", f"{tmp_path}/store", f"{tmp_path}/clim",
                     "--span", "monthly"])
    assert rc == 0
    clim = spark.read.parquet(f"{tmp_path}/clim")
    months = {r.span.month for r in clim.select("span").distinct().collect()}
    assert months == {3, 4}
    # climatology means must come from the stored values (400..401 range)
    xco2_means = [
        r.mean for r in clim.filter(F.col("variable") == "xco2").collect()
        if r.mean is not None
    ]
    assert xco2_means and all(399.0 < m < 402.0 for m in xco2_means)

    # dense-raster export of the store: one payload per (slice), lat flipped
    out = export_ops.export_slices(
        spark.read.parquet(f"{tmp_path}/store"), lat_res=6, lon_res=6
    )
    slices = out.collect()
    assert len(slices) > 0
    one = slices[0]
    arr = np.load(__import__("io").BytesIO(one.payload))
    assert arr.shape == (6, 6)
    assert one.filename.endswith(".npy") and one.n_valid > 0

    # whole-store checksum is stable across two invocations
    assert tools.main(["checksum", f"{tmp_path}/store"]) == 0
    d1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["digest"]
    assert tools.main(["checksum", f"{tmp_path}/store"]) == 0
    d2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["digest"]
    assert d1 == d2
