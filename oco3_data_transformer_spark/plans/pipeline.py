"""The mission pipeline: read → segment → QF split → target join → grid →
mask — the reference's ``process_input`` path (ref main.py:138-645,
processors/OCO3SamProcessor.py:330-544) as one declarative DataFrame plan.

Differences from the reference that are architecture, not semantics:
  - thread pools (granule pool / write pool / backup pool) disappear —
    granules and regions are partitions;
  - the backup/verify/repair machinery is replaced by the sink's idempotent
    MERGE-style append (sinks/store.py);
  - pre/post-QF dual output is two branches of one cached frame, not two
    passes over the files.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators import filters as filter_ops
from ..operators import grid as grid_ops
from ..operators import joins as join_ops
from ..operators import sessionize as sess_ops
from ..operators.aggregates import region_centroid_extent
from ..operators.filters import (
    MISSING_TARGET_IDS,
    OPERATION_MODE_SAM,
    OPERATION_MODE_TARGET,
    SIF_MODE_SAM,
)


def segment_oco3(soundings: DataFrame, margin: int = 2) -> DataFrame:
    """§2.4 both passes (SAM then Target) for CO2 missions; returns the
    combined region table with a ``mode`` column. Region ids are unique per
    (granule, mode)."""
    sam = sess_ops.detect_regions(
        soundings, ["granule"], "sounding_idx", "operation_mode",
        OPERATION_MODE_SAM, "target_id", margin=margin,
    ).withColumn("mode", F.lit(int(OPERATION_MODE_SAM)))
    tgt = sess_ops.detect_regions(
        soundings, ["granule"], "sounding_idx", "operation_mode",
        OPERATION_MODE_TARGET, "target_id", margin=margin,
    ).withColumn("mode", F.lit(int(OPERATION_MODE_TARGET)))
    return sam.unionByName(tgt)


def segment_sif(soundings_with_target: DataFrame, margin: int = 2) -> DataFrame:
    """SIF segmentation: SAM(3) and Target(2) passes with the 'none'
    tolerance and inclusive merge margin
    (ref processors/OCO3SifProcessor.py:368-477)."""
    out = None
    for mode in (SIF_MODE_SAM, OPERATION_MODE_TARGET):
        part = sess_ops.detect_regions(
            soundings_with_target, ["granule"], "sounding_idx", "MeasurementMode",
            mode, "target_id", margin=margin, merge_inclusive=True, none_id="none",
        ).withColumn("mode", F.lit(int(mode)))
        out = part if out is None else out.unionByName(part)
    return out


def process_oco3_granules(
    soundings: DataFrame,
    targets: DataFrame,
    lon_res: int = 40,
    lat_res: int = 40,
    method: str = "nearest",
    value_cols: list[str] | None = None,
    mask_scale: float = 1.0,
) -> DataFrame:
    """Target-focused OCO-3 pipeline (§3.1 steps 3-5) producing the
    long-format gridded store rows for both QF branches.

    Output: (mission, granule, mode, region_id, target_id, qf, time,
    lat_idx, lon_idx, lat, lon, <value>...) — masked to footprints.
    """
    value_cols = value_cols or ["xco2", "xco2_uncertainty"]

    # §2.4 segmentation + row membership (swallowed gap rows included).
    # The region's resolved target id and mode pass ride along on the rows;
    # a row's own (possibly off-mode, swallowed) values are superseded.
    regions = segment_oco3(soundings)
    regions = regions.filter(~F.col("target_id").isin(*MISSING_TARGET_IDS))  # F5
    rows = sess_ops.assign_rows_to_regions(
        soundings.drop("target_id", "target_name"), regions,
        ["granule"], "sounding_idx", carry_cols=["mode", "target_id"],
    )
    return _target_focused_tail(
        rows, targets, good=F.col("xco2_quality_flag") == 0,
        value_cols=value_cols, lon_res=lon_res, lat_res=lat_res,
        method=method, mask_scale=mask_scale, mission="oco3",
    )


def _target_focused_tail(
    rows: DataFrame,
    targets: DataFrame,
    good,
    value_cols: list[str],
    lon_res: int,
    lat_res: int,
    method: str,
    mask_scale: float,
    mission: str,
) -> DataFrame:
    """Shared §3.1 steps 3-5 tail for all target-focused missions:
    J1 target join → pre/post QF split → per-region grid → footprint mask.
    ``rows`` must carry: granule, mode, region_id, target_id, time,
    latitude, longitude, vertex_latitude, vertex_longitude, value cols."""
    # J1: broadcast target-dimension join; unknown targets drop the region
    rows = join_ops.target_lookup(rows, targets, "target_id")

    # F3/F4: pre/post QF split from one cached frame
    rows = rows.persist()
    region_cols = ["granule", "mode", "region_id"]
    pre = rows.withColumn("qf", F.lit("pre"))
    post = (
        filter_ops.drop_regions_without_good(rows.filter(good), region_cols, F.lit(True))
        .withColumn("qf", F.lit("post"))
    )
    both = pre.unionByName(post)

    # day of granule = event time (C1 analog; fixtures carry `time` directly)
    both = both.withColumn("time", F.date_trunc("DAY", F.col("time")))

    # G1: per (qf, region) gridding onto the target bbox mesh
    grid_keys = ["qf", *region_cols, "target_id", "time", "min_lon", "min_lat", "max_lon", "max_lat"]
    gridded = grid_ops.grid_regions(
        both, grid_keys, value_cols,
        lon_col="longitude", lat_col="latitude",
        lon_res=lon_res, lat_res=lat_res, method=method,
        bbox_cols=("min_lon", "min_lat", "max_lon", "max_lat"),
    )

    # G6/J4: footprint mask (bbox prefilter + exact numpy refine)
    footprints = both.select(
        *region_cols,
        F.col("qf"),
        F.col("vertex_longitude").alias("v_lon"),
        F.col("vertex_latitude").alias("v_lat"),
    )
    # cell half-sizes from the mesh step of each region's bbox
    gridded = gridded.withColumn(
        "__half_lon",
        (F.col("max_lon") - F.col("min_lon")) / F.lit(2 * max(lon_res - 1, 1)),
    ).withColumn(
        "__half_lat",
        (F.col("max_lat") - F.col("min_lat")) / F.lit(2 * max(lat_res - 1, 1)),
    )
    # mask join is per-region; half-sizes are uniform per region, pass the
    # max as the conservative coarse bound and refine exactly per row
    masked = _mask_with_row_halves(gridded, footprints, ["qf", *region_cols], mask_scale)

    drop_cols = ["min_lon", "min_lat", "max_lon", "max_lat", "__half_lon", "__half_lat"]
    return (
        masked.withColumn("mission", F.lit(mission))
        .drop(*drop_cols)
    )


def process_sif_granules(
    soundings: DataFrame,
    sequences: DataFrame,
    targets: DataFrame,
    lon_res: int = 40,
    lat_res: int = 40,
    method: str = "nearest",
    mask_scale: float = 1.0,
) -> DataFrame:
    """Target-focused SIF pipeline: J3 sequence-id target resolution + 1990
    epoch (C3) → SIF segmentation (SAM=3, inclusive margin, 'none'
    tolerance) → QF good = flag ∈ {0,1} → grid Daily_SIF_757nm → mask
    (ref processors/OCO3SifProcessor.py end-to-end)."""
    resolved = resolve_sif_targets(soundings, sequences)
    regions = segment_sif(resolved)
    regions = regions.filter(F.col("target_id") != "none")  # target-focused
    rows = sess_ops.assign_rows_to_regions(
        resolved.drop("target_id"), regions,
        ["granule"], "sounding_idx", carry_cols=["mode", "target_id"],
    )
    rows = rows.select(
        "granule", "sounding_idx", "mode", "region_id", "target_id", "time",
        F.col("Latitude").alias("latitude"),
        F.col("Longitude").alias("longitude"),
        F.col("Latitude_Corners").alias("vertex_latitude"),
        F.col("Longitude_Corners").alias("vertex_longitude"),
        F.col("Quality_Flag"),
        F.col("Daily_SIF_757nm"),
    )
    return _target_focused_tail(
        rows, targets, good=F.col("Quality_Flag").isin(0, 1),
        value_cols=["Daily_SIF_757nm"], lon_res=lon_res, lat_res=lat_res,
        method=method, mask_scale=mask_scale, mission="oco3_sif",
    )


def process_oco2_granules(
    soundings: DataFrame,
    targets: DataFrame,
    lon_res: int = 40,
    lat_res: int = 40,
    method: str = "nearest",
    value_cols: list[str] | None = None,
    mask_scale: float = 1.0,
) -> DataFrame:
    """Target-focused OCO-2 pipeline: Target-mode-only segmentation, J2
    nearest-centroid target association with bbox-intersects guard, then the
    shared QF/grid/mask tail (ref processors/OCO2Processor.py end-to-end).
    OCO-2 carries xco2_x2019 as an extra science variable."""
    value_cols = value_cols or ["xco2", "xco2_uncertainty", "xco2_x2019"]
    assoc = associate_oco2_regions(soundings, targets).select(
        "granule", "region_id", F.col("target_id").alias("__assoc_target")
    )
    regions = sess_ops.detect_regions(
        soundings.withColumn("__const", F.lit("run")),
        ["granule"], "sounding_idx", "operation_mode",
        OPERATION_MODE_TARGET, "__const", margin=2,
    ).withColumn("mode", F.lit(int(OPERATION_MODE_TARGET)))
    regions = regions.join(assoc, ["granule", "region_id"], "inner").withColumn(
        "target_id", F.col("__assoc_target")
    )
    rows = sess_ops.assign_rows_to_regions(
        soundings, regions, ["granule"], "sounding_idx",
        carry_cols=["mode", "target_id"],
    )
    return _target_focused_tail(
        rows, targets.drop("centroid_lon", "centroid_lat"),
        good=F.col("xco2_quality_flag") == 0,
        value_cols=value_cols, lon_res=lon_res, lat_res=lat_res,
        method=method, mask_scale=mask_scale, mission="oco2",
    )


def _mask_with_row_halves(
    gridded: DataFrame, footprints: DataFrame, region_keys: list[str], scale: float
) -> DataFrame:
    """Mask variant where cell half-sizes ride on the rows (per-region
    meshes differ). Same coarse+refine structure as
    grid_ops.mask_cells_by_footprints."""
    from ..operators.geometry import boxes_intersect_polygons, scale_footprint

    fp = footprints.select(
        *[F.col(k).alias(f"__f_{k}") for k in region_keys],
        F.col("v_lon"), F.col("v_lat"),
        F.array_min("v_lon").alias("fp_min_lon"),
        F.array_max("v_lon").alias("fp_max_lon"),
        F.array_min("v_lat").alias("fp_min_lat"),
        F.array_max("v_lat").alias("fp_max_lat"),
    )
    cond = F.lit(True)
    for k in region_keys:
        cond = cond & (F.col(k) == F.col(f"__f_{k}"))
    cond = (
        cond
        & (F.col("lon") - F.col("__half_lon") <= F.col("fp_max_lon"))
        & (F.col("lon") + F.col("__half_lon") >= F.col("fp_min_lon"))
        & (F.col("lat") - F.col("__half_lat") <= F.col("fp_max_lat"))
        & (F.col("lat") + F.col("__half_lat") >= F.col("fp_min_lat"))
    )
    paired = gridded.join(fp, cond, "inner")

    @F.pandas_udf(T.BooleanType())
    def refine(
        lon: pd.Series, lat: pd.Series, hlon: pd.Series, hlat: pd.Series,
        v_lon: pd.Series, v_lat: pd.Series,
    ) -> pd.Series:
        if len(lon) == 0:
            return pd.Series([], dtype=bool)
        px = np.stack(v_lon.to_numpy()).astype(np.float64)
        py = np.stack(v_lat.to_numpy()).astype(np.float64)
        if scale != 1.0:
            px, py = scale_footprint(px, py, scale)
        lo = lon.to_numpy(dtype=np.float64)
        la = lat.to_numpy(dtype=np.float64)
        hl = hlon.to_numpy(dtype=np.float64)
        hb = hlat.to_numpy(dtype=np.float64)
        return pd.Series(
            boxes_intersect_polygons(lo - hl, la - hb, lo + hl, la + hb, px, py)
        )

    hits = paired.filter(
        refine(
            F.col("lon"), F.col("lat"), F.col("__half_lon"), F.col("__half_lat"),
            F.col("v_lon"), F.col("v_lat"),
        )
    )
    key = [*region_keys, "lat_idx", "lon_idx"]
    mask_cells = hits.select(*key).distinct()
    return gridded.join(mask_cells, key, "left_semi")


def process_oco3_global(
    soundings: DataFrame,
    lon_res: int = 72,
    lat_res: int = 36,
    method: str = "nearest",
    value_cols: list[str] | None = None,
    mask_scale: float = 1.0,
) -> DataFrame:
    """Global-mode pipeline (ref processors/OCO3SamGlobalProcessor.py:67-625):
    all regions of a day interpolate onto ONE shared global mesh, masked to
    the union of footprints, with target metadata rasterized first-wins (G7).

    Output long rows: (qf, time, lat_idx, lon_idx, lat, lon, <value>...,
    target_id, target_type, operation_mode) — metadata fill is null outside
    any footprint-claimed pixel (the reference uses −1 codes at encode time,
    ref :721-728; the sink applies encoding).

    Scale: the grid kernel groups by (qf, day) — one task per day per QF
    branch; the mask/raster join is partitioned on the same keys, and the
    global mesh never exists densely outside each task.
    """
    from ..functions.scalar import determine_id_type
    from ..operators import grid as grid_ops

    value_cols = value_cols or ["xco2", "xco2_uncertainty"]

    regions = segment_oco3(soundings)  # keeps 'Missing' targets: global mode
    rows = sess_ops.assign_rows_to_regions(
        soundings.drop("target_id", "target_name"), regions,
        ["granule"], "sounding_idx", carry_cols=["mode", "target_id"],
    )
    rows = rows.persist()
    good = F.col("xco2_quality_flag") == 0
    region_cols = ["granule", "mode", "region_id"]
    pre = rows.withColumn("qf", F.lit("pre"))
    post = (
        filter_ops.drop_regions_without_good(rows.filter(good), region_cols, F.lit(True))
        .withColumn("qf", F.lit("post"))
    )
    both = pre.unionByName(post).withColumn("time", F.date_trunc("DAY", F.col("time")))

    # G2: one grid fit per (qf, day) over the shared global mesh
    gridded = grid_ops.grid_regions(
        both, ["qf", "time"], value_cols,
        lon_col="longitude", lat_col="latitude",
        lon_res=lon_res, lat_res=lat_res, method=method, bbox_cols=None,
    )

    half_lon = (grid_ops.GLOBAL_BBOX[2] - grid_ops.GLOBAL_BBOX[0]) / (2 * max(lon_res - 1, 1))
    half_lat = (grid_ops.GLOBAL_BBOX[3] - grid_ops.GLOBAL_BBOX[1]) / (2 * max(lat_res - 1, 1))

    footprints = both.select(
        F.col("qf"), F.col("time"),
        F.col("vertex_longitude").alias("v_lon"),
        F.col("vertex_latitude").alias("v_lat"),
        F.col("granule").alias("f_granule"),
        F.col("mode").alias("f_mode"),
        F.col("region_id").alias("f_region_id"),
        F.col("target_id").alias("f_target_id"),
    )
    hits = grid_ops.footprint_cell_hits(
        gridded.select("qf", "time", "lat_idx", "lon_idx", "lat", "lon"),
        footprints, ["qf", "time"], half_lon, half_lat, mask_scale,
        carry_cols=["f_granule", "f_mode", "f_region_id", "f_target_id"],
    )
    # G7: first-writer-wins metadata per pixel. Typed order columns — a
    # numeric region_id orders numerically (region 2 before 10), matching
    # the reference's loop order; a string concat would sort '10' < '2'.
    meta = grid_ops.first_wins_rasterize(
        hits,
        ["qf", "time", "lat_idx", "lon_idx"],
        ["f_granule", "f_mode", "f_region_id"],
        [
            F.col("f_target_id").alias("target_id"),
            determine_id_type(F.col("f_target_id")).alias("target_type"),
            F.col("f_mode").alias("operation_mode"),
        ],
    )
    # G6: mask = pixels with >= 1 hit; inner join attaches metadata
    out = gridded.join(meta, ["qf", "time", "lat_idx", "lon_idx"], "inner")
    return out


def densify_missing_day(
    spark_template: DataFrame, day, value_cols: list[str]
) -> DataFrame:
    """G9: synthesize an all-null grid for a mission-day with no data
    (ref processors/Processor.py:51-76, OCO3SamGlobalProcessor.py:639-718) so
    day-aligned unions stay rectangular. ``spark_template``: (qf, lat_idx,
    lon_idx, lat, lon) cells."""
    out = spark_template.withColumn("time", F.lit(day).cast("timestamp"))
    for c in value_cols:
        out = out.withColumn(c, F.lit(None).cast("double"))
    return (
        out.withColumn("target_id", F.lit(None).cast("string"))
        .withColumn("target_type", F.lit(None).cast("tinyint"))
        .withColumn("operation_mode", F.lit(None).cast("int"))
    )


def associate_oco2_regions(
    soundings: DataFrame, targets: DataFrame
) -> DataFrame:
    """J2 (OCO-2): segment Target-mode runs (no target id in the data), then
    associate each region with the nearest target centroid, keeping it only
    if the region bbox intersects the target bbox
    (ref processors/OCO2Processor.py:353-435)."""
    # OCO-2 carries no target id, so runs split only on mode gaps: a
    # constant run key makes every contiguous Target-mode stretch one region.
    regions = sess_ops.detect_regions(
        soundings.withColumn("__const", F.lit("run")),
        ["granule"], "sounding_idx", "operation_mode",
        OPERATION_MODE_TARGET, "__const", margin=2,
    ).drop("__const", "n_runs")
    rows = sess_ops.assign_rows_to_regions(soundings, regions, ["granule"], "sounding_idx")
    stats = region_centroid_extent(rows, ["granule", "region_id"], "latitude", "longitude")
    t = targets.select(
        F.col("target_id"), F.col("centroid_lat").alias("t_lat"),
        F.col("centroid_lon").alias("t_lon"),
        F.col("min_lon").alias("t_min_lon"), F.col("min_lat").alias("t_min_lat"),
        F.col("max_lon").alias("t_max_lon"), F.col("max_lat").alias("t_max_lat"),
    )
    nearest = join_ops.nearest_centroid(
        stats, t, ["granule", "region_id"], "lat_c", "lon_c", "t_lat", "t_lon"
    )
    # bbox-intersects guard (ref :427-429): region extent must overlap
    return nearest.filter(
        (F.col("min_lon") <= F.col("t_max_lon"))
        & (F.col("max_lon") >= F.col("t_min_lon"))
        & (F.col("min_lat") <= F.col("t_max_lat"))
        & (F.col("max_lat") >= F.col("t_min_lat"))
    ).select("granule", "region_id", "target_id", "lat_c", "lon_c", "n")


def resolve_sif_targets(
    soundings: DataFrame, sequences: DataFrame
) -> DataFrame:
    """J3: SIF sequence-index target resolution then time from the 1990
    epoch (C3) — prerequisites of segment_sif."""
    from ..functions.scalar import sif_timestamp

    out = join_ops.sequence_index_join(soundings, sequences)
    return out.withColumn("time", sif_timestamp(F.col("delta_time")))
