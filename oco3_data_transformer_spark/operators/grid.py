"""Gridding / interpolation operators G1-G9 (SURVEY.md §2.5) — the core
transform of the reference pipeline.

The reference interpolates each region's point soundings onto a fixed
lon×lat mesh with ``scipy.interpolate.griddata`` (ref
processors/OCO3SamProcessor.py:66-214: mesh 106-109, interp 161-182), with a
fallback to 'nearest' when a region has < 4 points (ref :153-159).

Spark-first design:
  - the kernel is a *grouped-map pandas UDF* (``applyInPandas``) — one group
    per (day, region), Arrow-batched, numpy-vectorized inside. Regions are
    independent, so the operator scales linearly with executors; there is no
    cross-region communication at all.
  - 'nearest' is implemented exactly in numpy (argmin of squared Euclidean
    distance in lon/lat space, matching scipy's KD-tree result up to ties).
  - 'linear' runs a pure-numpy Delaunay + barycentric kernel
    (operators/interp.py) that reproduces scipy.griddata(method='linear')
    semantics — no scipy needed. 'cubic' uses scipy's Clough-Tocher when
    importable, else the pure-numpy implementation of the same element
    (Powell's affine-invariant reduction, interp.cubic_griddata) when
    ``allow_fallback`` else raises NotImplementedError.
  - the footprint mask (G6/J4) is a bbox range-join prefilter in pure
    DataFrame ops + an exact numpy refine (operators/geometry.py) in an
    Arrow-batched pandas UDF.
  - first-writer-wins rasterization (G7) is a row_number window, with the
    explicit deterministic region order the reference gets implicitly from
    its Python loop (ref processors/OCO3SamGlobalProcessor.py:330-339).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - scipy absent in this environment
    from scipy.interpolate import griddata as _scipy_griddata  # type: ignore

    HAVE_SCIPY = True
except Exception:  # pragma: no cover
    _scipy_griddata = None
    HAVE_SCIPY = False

MIN_POINTS_FOR_LINEAR = 4  # ref processors/OCO3SamProcessor.py:153-159

GLOBAL_BBOX = (-180.0, -90.0, 180.0, 90.0)  # ref utils/XI.py:86-87


def make_mesh(
    min_lon: float, min_lat: float, max_lon: float, max_lat: float,
    lon_res: int, lat_res: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Cell-center coordinate vectors of the target mesh (float32), matching
    the reference's ``np.mgrid[min:max:res*1j]`` endpoint-inclusive linspace
    (ref processors/OCO3SamProcessor.py:106-109)."""
    lons = np.linspace(min_lon, max_lon, lon_res, dtype=np.float32)
    lats = np.linspace(min_lat, max_lat, lat_res, dtype=np.float32)
    return lons, lats


def nearest_gridder(
    pts_lon: np.ndarray, pts_lat: np.ndarray, values: np.ndarray,
    mesh_lon: np.ndarray, mesh_lat: np.ndarray,
) -> np.ndarray:
    """Exact 'nearest' interpolation: for every mesh cell the value of the
    Euclidean-nearest point (lon/lat plane). Returns (n_lat, n_lon)."""
    glon, glat = np.meshgrid(mesh_lon.astype(np.float64), mesh_lat.astype(np.float64))
    # (cells, points) squared distance; chunk cells to bound memory
    flat_lon = glon.ravel()
    flat_lat = glat.ravel()
    out = np.empty(flat_lon.shape[0], dtype=np.float64)
    chunk = max(1, 2_000_000 // max(1, len(pts_lon)))
    for s in range(0, len(flat_lon), chunk):
        e = s + chunk
        d2 = (flat_lon[s:e, None] - pts_lon[None, :]) ** 2 + (
            flat_lat[s:e, None] - pts_lat[None, :]
        ) ** 2
        out[s:e] = values[np.argmin(d2, axis=1)]
    return out.reshape(glat.shape)


def grid_points(
    pts_lon: np.ndarray, pts_lat: np.ndarray, values: np.ndarray,
    mesh_lon: np.ndarray, mesh_lat: np.ndarray,
    method: str = "nearest", allow_fallback: bool = True,
) -> np.ndarray:
    """G1 kernel with G3 fallback semantics: linear/cubic need >= 4 points
    else 'nearest' (ref processors/OCO3SamProcessor.py:153-159). NaN fill
    outside the convex hull for linear/cubic (scipy semantics)."""
    good = ~np.isnan(values)
    pts_lon, pts_lat, values = pts_lon[good], pts_lat[good], values[good]
    if len(values) == 0:
        return np.full((len(mesh_lat), len(mesh_lon)), np.nan)
    eff = method
    if method in ("linear", "cubic") and len(values) < MIN_POINTS_FOR_LINEAR:
        eff = "nearest"
    if eff == "cubic":
        if HAVE_SCIPY:
            glon, glat = np.meshgrid(mesh_lon, mesh_lat)
            return _scipy_griddata(
                np.column_stack([pts_lon, pts_lat]), values, (glon, glat),
                method="cubic", fill_value=np.nan,
            )
        if not allow_fallback:
            raise NotImplementedError(
                "bit-verified scipy 'cubic' needs the scipy wheel; pass "
                "allow_fallback=True for the numpy implementation of the "
                "same reduced Clough-Tocher element (Nielson gradients, "
                "centroid split, Powell's affine-invariant g=-1/2 "
                "reduction — scipy's exact interpnd formulas, "
                "operators/interp.cubic_griddata; matches scipy to float "
                "rounding, but bit-parity is unverifiable without the "
                "wheel: skip-gated differential in tests/test_ready_goldens)"
            )
        from .interp import cubic_griddata

        return cubic_griddata(pts_lon, pts_lat, values, mesh_lon, mesh_lat)
    if eff == "linear":
        from .interp import linear_griddata

        return linear_griddata(pts_lon, pts_lat, values, mesh_lon, mesh_lat)
    return nearest_gridder(pts_lon, pts_lat, values, mesh_lon, mesh_lat)


def grid_regions(
    soundings: DataFrame,
    region_keys: list[str],
    value_cols: list[str],
    lon_col: str = "longitude",
    lat_col: str = "latitude",
    lon_res: int = 40,
    lat_res: int = 40,
    method: str = "nearest",
    bbox_cols: tuple[str, str, str, str] | None = None,
) -> DataFrame:
    """G1/G2 as a grouped-map operator: one kernel invocation per region,
    emitting long-format grid rows (region keys..., lat_idx, lon_idx,
    lat, lon, <value_col>... interpolated).

    ``bbox_cols``: per-row target bbox columns (min_lon, min_lat, max_lon,
    max_lat) from the J1 broadcast join; when None the global mesh bbox is
    used (G2, ref processors/OCO3SamGlobalProcessor.py:67-205).

    Scale: groups are independent; Spark hashes region keys across
    executors. Mesh size × variables bounds each group's output
    (lat_res·lon_res rows), so task memory is deterministic.

    r10: the fan-out is ``repartition(keys) + mapInPandas`` with an
    in-partition pandas groupby, NOT ``applyInPandas`` — identical group
    row-sets through the identical per-group kernel, but one Arrow
    round-trip per PARTITION instead of one serialized python call per
    group (the q42 pipeline grids 9,022 ~112-row regions at the sf1
    fixture; applyInPandas' per-group overhead was ~1.8 ms × groups =
    the dominant share of its 16 s gridding stage). Batches are
    concatenated per partition before grouping so a group can never
    straddle an Arrow batch boundary.
    """
    key_fields = [soundings.schema[k] for k in region_keys]
    out_schema = T.StructType(
        [*key_fields,
         T.StructField("lat_idx", T.IntegerType()),
         T.StructField("lon_idx", T.IntegerType()),
         T.StructField("lat", T.FloatType()),
         T.StructField("lon", T.FloatType()),
         *[T.StructField(c, T.DoubleType()) for c in value_cols]]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        if bbox_cols is not None:
            b = pdf.iloc[0]
            bbox = (b[bbox_cols[0]], b[bbox_cols[1]], b[bbox_cols[2]], b[bbox_cols[3]])
        else:
            bbox = GLOBAL_BBOX
        mesh_lon, mesh_lat = make_mesh(bbox[0], bbox[1], bbox[2], bbox[3], lon_res, lat_res)
        plon = pdf[lon_col].to_numpy(dtype=np.float64)
        plat = pdf[lat_col].to_numpy(dtype=np.float64)
        lat_idx, lon_idx = np.meshgrid(
            np.arange(lat_res, dtype=np.int32), np.arange(lon_res, dtype=np.int32),
            indexing="ij",
        )
        out = {
            "lat_idx": lat_idx.ravel(),
            "lon_idx": lon_idx.ravel(),
            "lat": np.repeat(mesh_lat, lon_res),
            "lon": np.tile(mesh_lon, lat_res),
        }
        for k in region_keys:
            out[k] = np.repeat(pdf[k].iloc[0], lat_res * lon_res)
        if method in ("linear", "cubic") and not HAVE_SCIPY and len(value_cols) > 1:
            # multi-variable fast path: columns sharing a finite-mask share
            # ONE triangulation + mesh point-location (the pipeline grids
            # 2-3 science variables per region; re-triangulating per
            # column doubles the kernel cost for nothing)
            from .interp import TriangulatedField

            vals_by_col = {
                c: pdf[c].to_numpy(dtype=np.float64) for c in value_cols
            }
            masks: dict[bytes, list[str]] = {}
            for c, v in vals_by_col.items():
                masks.setdefault((~np.isnan(v)).tobytes(), []).append(c)
            glon, glat = np.meshgrid(
                mesh_lon.astype(np.float64), mesh_lat.astype(np.float64)
            )
            for mkey, cols in masks.items():
                good = np.frombuffer(mkey, dtype=bool)
                n_good = int(good.sum())
                if n_good == 0 or (
                    method == "linear" and n_good < MIN_POINTS_FOR_LINEAR
                ) or (method == "cubic" and n_good < MIN_POINTS_FOR_LINEAR):
                    for c in cols:  # per-column fallback semantics
                        out[c] = grid_points(
                            plon, plat, vals_by_col[c], mesh_lon, mesh_lat,
                            method,
                        ).ravel()
                    continue
                tf = TriangulatedField(plon[good], plat[good])
                if not tf.ok:  # degenerate cloud → grid_points semantics
                    for c in cols:
                        out[c] = grid_points(
                            plon, plat, vals_by_col[c], mesh_lon, mesh_lat,
                            method,
                        ).ravel()
                    continue
                tf.locate(glon.ravel(), glat.ravel())
                fn = tf.linear if method == "linear" else tf.cubic
                for c in cols:
                    out[c] = fn(vals_by_col[c][good])
        else:
            for c in value_cols:
                vals = pdf[c].to_numpy(dtype=np.float64)
                out[c] = grid_points(
                    plon, plat, vals, mesh_lon, mesh_lat, method
                ).ravel()
        return pd.DataFrame(out)[[f.name for f in out_schema.fields]]

    def fit_partition(batches):
        frames = [b for b in batches if len(b)]
        if not frames:
            return
        pdf_all = pd.concat(frames, ignore_index=True)
        for _, g in pdf_all.groupby(list(region_keys), sort=False):
            yield fit(g)

    return soundings.repartition(*region_keys).mapInPandas(
        fit_partition, out_schema
    )


_REFINE_SCHEMA = T.BooleanType()


def footprint_cell_hits(
    cells: DataFrame,
    footprints: DataFrame,
    region_keys: list[str],
    cell_half_lon: float,
    cell_half_lat: float,
    scale_factor: float = 1.0,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """J4 both phases, returning surviving (cell, footprint) PAIRS.

    Phase 1 (coarse, pure DataFrame): equi-join on region keys + bbox
    interval overlap — the reference's ``argwhere`` band prefilter
    (ref processors/OCO3SamProcessor.py:253-267) as a range-join condition.
    Phase 2 (exact): Arrow-batched pandas UDF over the surviving pairs using
    the numpy box×polygon predicate (ref :279-295 ``intersects``).

    ``footprints`` columns: region keys + ``v_lon`` / ``v_lat``
    (array<float>, unclosed ring) + any ``carry_cols`` (e.g. region index +
    target metadata for G7). ``cells``: region keys + lat/lon centers +
    lat_idx/lon_idx.
    """
    from ..operators.geometry import boxes_intersect_polygons, scale_footprint

    fp = footprints.select(
        *[F.col(k).alias(f"__f_{k}") for k in region_keys],
        F.col("v_lon"),
        F.col("v_lat"),
        F.array_min("v_lon").alias("fp_min_lon"),
        F.array_max("v_lon").alias("fp_max_lon"),
        F.array_min("v_lat").alias("fp_min_lat"),
        F.array_max("v_lat").alias("fp_max_lat"),
        *(carry_cols or []),
    )
    cond = F.lit(True)
    for k in region_keys:
        cond = cond & (F.col(k) == F.col(f"__f_{k}"))
    cond = (
        cond
        & (F.col("lon") - cell_half_lon <= F.col("fp_max_lon"))
        & (F.col("lon") + cell_half_lon >= F.col("fp_min_lon"))
        & (F.col("lat") - cell_half_lat <= F.col("fp_max_lat"))
        & (F.col("lat") + cell_half_lat >= F.col("fp_min_lat"))
    )
    paired = cells.join(fp, cond, "inner")

    @F.pandas_udf(_REFINE_SCHEMA)
    def refine(
        lon: pd.Series, lat: pd.Series, v_lon: pd.Series, v_lat: pd.Series
    ) -> pd.Series:
        if len(lon) == 0:
            return pd.Series([], dtype=bool)
        px = np.stack(v_lon.to_numpy()).astype(np.float64)
        py = np.stack(v_lat.to_numpy()).astype(np.float64)
        if scale_factor != 1.0:
            px, py = scale_footprint(px, py, scale_factor)
        res = boxes_intersect_polygons(
            lon.to_numpy(dtype=np.float64) - cell_half_lon,
            lat.to_numpy(dtype=np.float64) - cell_half_lat,
            lon.to_numpy(dtype=np.float64) + cell_half_lon,
            lat.to_numpy(dtype=np.float64) + cell_half_lat,
            px,
            py,
        )
        return pd.Series(res)

    return paired.filter(
        refine(F.col("lon"), F.col("lat"), F.col("v_lon"), F.col("v_lat"))
    ).drop(*[f"__f_{k}" for k in region_keys], "fp_min_lon", "fp_max_lon",
           "fp_min_lat", "fp_max_lat", "v_lon", "v_lat")


def mask_cells_by_footprints(
    cells: DataFrame,
    footprints: DataFrame,
    region_keys: list[str],
    cell_half_lon: float,
    cell_half_lat: float,
    scale_factor: float = 1.0,
) -> DataFrame:
    """G6/J4: keep grid cells whose cell box intersects >= 1 sounding
    footprint of the same region — left-semi over :func:`footprint_cell_hits`
    (one surviving footprint is enough)."""
    hits = footprint_cell_hits(
        cells, footprints, region_keys, cell_half_lon, cell_half_lat, scale_factor
    )
    mask_cells = hits.select(*region_keys, "lat_idx", "lon_idx").distinct()
    return cells.join(mask_cells, [*region_keys, "lat_idx", "lon_idx"], "left_semi")


def first_wins_rasterize(
    masked_cells: DataFrame,
    pixel_keys: list[str],
    order_cols,
    meta_cols: list,
) -> DataFrame:
    """G7: per global pixel keep the metadata of the first-writing region —
    deterministic via explicit ordering over the *typed* region-identity
    columns (the reference gets the order implicitly from loop order, ref
    processors/OCO3SamGlobalProcessor.py:270-412; a numeric region_id must
    order numerically, not lexicographically).

    Implemented as ``min(struct(order..., meta...))`` rather than a rank-1
    window: the aggregate combines map-side, so the shuffle moves one row
    per pixel instead of one row per (pixel, footprint-hit) — the hit table
    is the largest intermediate of global mode. Order fields are compared
    first and are unique per region, so meta fields never decide."""
    if isinstance(order_cols, str):
        order_cols = [order_cols]
    order_exprs = [
        (F.col(c) if isinstance(c, str) else c).alias(f"__o{i}")
        for i, c in enumerate(order_cols)
    ]
    meta_names = masked_cells.select(*meta_cols).columns
    packed = F.min(F.struct(*order_exprs, *meta_cols)).alias("__w")
    out = masked_cells.groupBy(*pixel_keys).agg(packed)
    return out.select(
        *pixel_keys, *[F.col(f"__w.{n}").alias(n) for n in meta_names]
    )


def densify_empty_day(
    spark_df_template: DataFrame,
    day_value,
    fill: float | None = None,
) -> DataFrame:
    """G9: synthesize a full fill-value grid for a mission-day with no data
    (ref processors/Processor.py:51-76, OCO3SamGlobalProcessor.py:639-718).
    ``spark_df_template`` supplies the (lat_idx, lon_idx, lat, lon) cells;
    value columns become the fill literal."""
    out = spark_df_template.withColumn("time", F.lit(day_value).cast("timestamp"))
    return out.withColumn("value", F.lit(fill).cast("double"))
