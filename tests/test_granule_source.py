"""Granule source (S1/S4) tests: distributed npz decode, projection
pushdown into the decoder, fill-value normalization, NetCDF stub."""

from __future__ import annotations

import io

import numpy as np
import pytest
from pyspark.sql import types as T

from oco3_data_transformer_spark.sources import granules as G


def _write_granule(path, n=10, seed=1):
    rng = np.random.default_rng(seed)
    xco2 = rng.normal(400, 1, n)
    xco2[0] = G.FILL_VALUE_DEFAULT  # becomes NaN
    np.savez(
        path,
        sounding_idx=np.arange(n, dtype=np.int64),
        operation_mode=rng.choice([0, 2, 4], n).astype(np.int8),
        xco2=xco2,
        vertex_latitude=rng.normal(10, 0.1, (n, 4)).astype(np.float32),
        secret_var=np.ones(n),  # must NOT be decoded when projected away
    )


SCHEMA = T.StructType(
    [
        T.StructField("granule", T.StringType()),
        T.StructField("sounding_idx", T.LongType()),
        T.StructField("operation_mode", T.ByteType()),
        T.StructField("xco2", T.DoubleType()),
        T.StructField("vertex_latitude", T.ArrayType(T.FloatType())),
    ]
)


def test_read_granules_npz(spark, tmp_path):
    _write_granule(tmp_path / "g1.npz", n=10, seed=1)
    _write_granule(tmp_path / "g2.npz", n=7, seed=2)
    df = G.read_granules(spark, str(tmp_path / "*.npz"), SCHEMA)
    rows = df.collect()
    assert len(rows) == 17
    assert {r.granule for r in rows} == {"g1.npz", "g2.npz"}
    g1 = [r for r in rows if r.granule == "g1.npz"]
    assert sorted(r.sounding_idx for r in g1) == list(range(10))
    # fill normalized to NaN (null after Arrow)
    nulls = [r for r in g1 if r.xco2 is None or (r.xco2 != r.xco2)]
    assert len(nulls) == 1
    # vertex arrays survive as array<float> of length 4
    assert all(len(r.vertex_latitude) == 4 for r in rows)


def test_projection_pushdown_into_decoder(tmp_path):
    buf = io.BytesIO()
    _write_granule(tmp_path / "g.npz")
    payload = (tmp_path / "g.npz").read_bytes()
    pdf = G.decode_npz(payload, ["xco2", "sounding_idx"])
    assert sorted(pdf.columns) == ["sounding_idx", "xco2"]  # secret_var untouched


def test_netcdf_decoder_rejects_garbage():
    # decode_netcdf is no longer wheel-gated: CDF-1/CDF-5 via containers.py,
    # HDF5 via the hdf5lite subset reader (tests/test_hdf5lite.py); an
    # unrecognized payload fails loudly at the format boundary
    with pytest.raises(ValueError, match="signature"):
        G.decode_netcdf(b"", None)


def test_file_list_input(spark):
    df = G.file_list_input(
        spark,
        [
            {"path": "s3://b/g1.nc4", "mission": "oco3", "day": "2024-03-01"},
            {"path": "/data/g2.nc4", "mission": "oco2"},
        ],
    )
    assert df.count() == 2
    with pytest.raises(ValueError):
        G.file_list_input(spark, [{"mission": "oco3"}])
