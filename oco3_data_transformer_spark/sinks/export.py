"""Dense-raster export adapters (S8/S9 + C10): long-format store rows →
per-slice dense 2-D arrays, serialized per (mission, target, qf, time,
variable) slice.

The reference writes CoG GeoTIFF per slice with latitude flipped descending
and names ``{mission}_{target}_{ts}_{filtered}_{var}.tif``
(ref writers/CoGWriter.py:42-248, flip :153-161) and zlib-9 NetCDF
(ref writers/NetCDFWriter.py:26-61). rioxarray/netCDF4 are not available in
this container, so the *format encoders* are pluggable: the default encoder
serializes the dense array as a portable ``.npy`` byte payload (real bytes,
real shapes — everything except the final GeoTIFF/NetCDF container bits,
which are gated behind an import-try).

Spark-side plumbing is the real thing either way: one ``applyInPandas``
group per slice, densification from sparse long rows with NaN fill,
deterministic latitude-descending row order, output as a binary column the
caller sinks wherever (object store via foreachPartition, a BLOB table, a
manifest parquet).
"""

from __future__ import annotations

import io

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SLICE_COLS = ["mission", "target_id", "qf", "time", "variable"]

EXPORT_SCHEMA = T.StructType(
    [
        T.StructField("mission", T.StringType()),
        T.StructField("target_id", T.StringType()),
        T.StructField("qf", T.StringType()),
        T.StructField("time", T.TimestampType()),
        T.StructField("variable", T.StringType()),
        T.StructField("filename", T.StringType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("n_valid", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _npy_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr, allow_pickle=False)
    return buf.getvalue()


def encode_geotiff(
    arr: np.ndarray, bounds: tuple[float, float, float, float] | None = None
) -> bytes:  # pragma: no cover - optional dep, golden-tested when present
    """S8 final container encode: tiled+deflate GeoTIFF (CoG layout,
    ref writers/CoGWriter.py:42-248), EPSG:4326, row 0 = northernmost (the
    caller already flipped latitude descending). Import-gated on rasterio;
    the body is complete and activates via tests/test_ready_goldens.py."""
    try:
        import rasterio  # type: ignore
        from rasterio.io import MemoryFile  # type: ignore
        from rasterio.transform import from_bounds  # type: ignore
    except ImportError as e:
        raise NotImplementedError(
            "GeoTIFF container encoding requires rasterio (unavailable here); "
            "the dense array + naming + latitude flip are produced by "
            "export_slices with the default npy encoder"
        ) from e
    h, w = arr.shape
    min_lon, min_lat, max_lon, max_lat = bounds or (-180.0, -90.0, 180.0, 90.0)
    transform = from_bounds(min_lon, min_lat, max_lon, max_lat, w, h)
    profile = dict(
        driver="GTiff", height=h, width=w, count=1, dtype="float64",
        crs="EPSG:4326", transform=transform, compress="deflate",
        # GDAL tile sizes must be multiples of 16; fixed 256 blocks are
        # valid for any raster size (small rasters are padded)
        tiled=True, blockxsize=256, blockysize=256,
    )
    with MemoryFile() as mem:
        with mem.open(**profile) as ds:
            ds.write(arr.astype(np.float64), 1)
        return mem.read()


def encode_netcdf(
    arr: np.ndarray, var_name: str = "value"
) -> bytes:  # pragma: no cover - optional dep, golden-tested when present
    """S9 final container encode: zlib-9 NetCDF (ref
    writers/NetCDFWriter.py:26-61) via xarray/h5netcdf; import-gated."""
    try:
        import xarray as xr  # type: ignore
    except ImportError as e:
        raise NotImplementedError(
            "NetCDF container encoding requires xarray+h5netcdf "
            "(unavailable here); export_slices' npy payload carries the "
            "same dense array"
        ) from e
    ds = xr.Dataset({var_name: (("lat", "lon"), arr.astype(np.float64))})
    return bytes(
        ds.to_netcdf(
            engine="h5netcdf",
            encoding={var_name: {"zlib": True, "complevel": 9}},
        )
    )


_SLICE_ENCODERS = {
    "npy": (_npy_bytes, ".npy"),
    "geotiff": (encode_geotiff, ".tif"),
    "netcdf": (encode_netcdf, ".nc"),
}


def export_slices(
    store_rows: DataFrame,
    lat_res: int,
    lon_res: int,
    fmt: str = "npy",
) -> DataFrame:
    """Assemble every (mission, target, qf, time, variable) slice into a
    dense (lat_res, lon_res) float64 array — NaN where the mask dropped the
    cell — with rows ordered latitude-DESCENDING (C10, ref
    writers/CoGWriter.py:153-161), and emit filename + binary payload.

    One Arrow-batched group per slice; slices are independent, so export
    parallelism is the number of slices. ``fmt='npy'`` is the portable
    payload; 'geotiff'/'netcdf' use the real container encoders and raise
    cleanly at plan time while their libraries are absent.
    """
    encoder, ext = _SLICE_ENCODERS[fmt]
    if fmt != "npy":
        encoder(np.zeros((1, 1)))  # driver-side availability probe: raises
        # NotImplementedError at plan time, not inside executor tasks

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        head = pdf.iloc[0]
        arr = np.full((lat_res, lon_res), np.nan)
        arr[pdf["lat_idx"].to_numpy(), pdf["lon_idx"].to_numpy()] = pdf[
            "value"
        ].to_numpy(dtype=np.float64)
        arr = arr[::-1, :]  # latitude descending (C10)
        ts = pd.Timestamp(head["time"]).strftime("%Y%m%dT%H%M%SZ")
        fname = (
            f"{head['mission']}_{head['target_id']}_{ts}_"
            f"{head['qf']}_{head['variable']}{ext}"
        )
        return pd.DataFrame(
            [
                {
                    "mission": head["mission"],
                    "target_id": head["target_id"],
                    "qf": head["qf"],
                    "time": head["time"],
                    "variable": head["variable"],
                    "filename": fname,
                    "height": lat_res,
                    "width": lon_res,
                    "n_valid": int(pdf["value"].notna().sum()),
                    "payload": encoder(arr),
                }
            ]
        )

    return store_rows.groupBy(*SLICE_COLS).applyInPandas(assemble, EXPORT_SCHEMA)


def melt_values(gridded: DataFrame, value_cols: list[str], id_cols: list[str]) -> DataFrame:
    """Wide gridded rows → long (variable, value) store rows (the stack step
    before export/append)."""
    pairs = F.create_map(
        *[x for c in value_cols for x in (F.lit(c), F.col(c))]
    )
    exploded = gridded.select(*id_cols, F.explode(pairs).alias("variable", "value"))
    return exploded
