"""Catalog part 3: the pandas-UDF kernels (gridding, mission pipeline,
multimodal) exposed to the driver.

q41 oracle-checks the *actual grouped-map gridding kernel* (applyInPandas →
numpy argmin) against a DuckDB replica of its math: the float32 linspace
mesh is reproduced with ``CAST(i*step AS REAL)`` (np.linspace computes
float64 ``i*step``, forces the endpoint, then casts), distances in float64.
Coordinates are CRT-unique per region (custkey mod 5/97/89) so no two
points share a coordinate and exact distance ties cannot occur.

q42/q43 are genuinely non-SQL-expressible (multi-stage pipeline with
geometry refine; binary decode) → rows-only checks, unit-tested in
tests/test_pipeline.py and tests/test_multimodal.py.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register
from .functions import scalar as scalar_fns
from .operators import grid as grid_ops
from .operators import multimodal as mm
from .plans import pipeline as pipe
from .schemas import TARGETS_OCO3
from .sources.registry import load

GRID_RES = 8


def _mesh_sql(idx_name: str, res: int, lo: float, hi: float) -> str:
    step = f"(CAST({hi} AS DOUBLE) - CAST({lo} AS DOUBLE)) / {res - 1}"
    return f"""
        SELECT i AS {idx_name},
               CASE WHEN i = {res - 1} THEN CAST({hi} AS REAL)
                    ELSE CAST(CAST({lo} AS DOUBLE) + i * {step} AS REAL) END AS coord
        FROM (SELECT unnest(generate_series(0, {res - 1})) AS i)
    """


_Q41_SQL = f"""
    WITH pts AS (
        SELECT c_custkey % 5 AS region,
               (c_custkey % 97) / CAST(9.7 AS DOUBLE) AS lon,
               (c_custkey % 89) / CAST(8.9 AS DOUBLE) AS lat,
               c_acctbal AS v
        FROM customer),
    lons AS ({_mesh_sql('lon_idx', GRID_RES, 0.0, 10.0)}),
    lats AS ({_mesh_sql('lat_idx', GRID_RES, 0.0, 10.0)}),
    scored AS (
        SELECT p.region, la.lat_idx, lo.lon_idx, p.v,
               (CAST(lo.coord AS DOUBLE) - p.lon) * (CAST(lo.coord AS DOUBLE) - p.lon)
             + (CAST(la.coord AS DOUBLE) - p.lat) * (CAST(la.coord AS DOUBLE) - p.lat) AS d2
        FROM lons lo CROSS JOIN lats la CROSS JOIN pts p),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY region, lat_idx, lon_idx ORDER BY d2) AS rk
        FROM scored)
    SELECT CAST(region AS BIGINT) AS region, lat_idx, lon_idx,
           round(v, 2) AS xco2
    FROM ranked WHERE rk = 1
"""


@register(
    "q41_grid_kernel",
    _Q41_SQL,
    doc="G1/G2 grouped-map gridding kernel (applyInPandas, 'nearest'): "
    "per-region point clouds onto an 8x8 float32 mesh; the DuckDB oracle "
    "replicates the linspace/argmin math bit-for-bit. "
    "ref processors/OCO3SamProcessor.py:66-214.",
)
def q41(spark: SparkSession, sf: str) -> DataFrame:
    cu = load(spark, sf, "customer")
    pts = cu.select(
        (F.col("c_custkey") % 5).alias("region"),
        (F.col("c_custkey") % 97 / F.lit(9.7)).alias("longitude"),
        (F.col("c_custkey") % 89 / F.lit(8.9)).alias("latitude"),
        F.col("c_acctbal").alias("xco2"),
        F.lit(0.0).alias("min_lon"), F.lit(0.0).alias("min_lat"),
        F.lit(10.0).alias("max_lon"), F.lit(10.0).alias("max_lat"),
    )
    out = grid_ops.grid_regions(
        pts, ["region", "min_lon", "min_lat", "max_lon", "max_lat"], ["xco2"],
        lon_res=GRID_RES, lat_res=GRID_RES, method="nearest",
        bbox_cols=("min_lon", "min_lat", "max_lon", "max_lat"),
    )
    return out.select(
        "region", "lat_idx", "lon_idx", F.round("xco2", 2).alias("xco2")
    )


_Q126_SQL = f"""
    WITH lons AS ({_mesh_sql('lon_idx', GRID_RES, 0.0, 10.0)}),
    lats AS ({_mesh_sql('lat_idx', GRID_RES, 0.0, 10.0)}),
    regions AS (SELECT DISTINCT c_custkey % 5 AS region FROM customer)
    SELECT CAST(r.region AS BIGINT) AS region, la.lat_idx, lo.lon_idx,
           TRUE AS lin_ok
    FROM regions r CROSS JOIN lons lo CROSS JOIN lats la
"""


@register(
    "q126_grid_linear_kernel",
    _Q126_SQL,
    doc="G1 'linear' gridding kernel (numpy Delaunay + barycentric, "
    "operators/interp.py) run end-to-end through the grouped-map operator. "
    "Values are affine in (lon, lat) and 4 corner points put every mesh "
    "cell inside the hull, so the interpolant equals the plane at the "
    "float32 mesh coords — regardless of which (valid) triangulation the "
    "kernel picks. Checked as a per-cell CONTRACT verdict "
    "|interp − plane| <= 1e-6 (plane recomputed Spark-side with the same "
    "bit-level linspace math the oracle uses; the oracle predicts every "
    "verdict true). A round(.,4) hash-match was abandoned: the kernel's "
    "deterministic jitter perturbs the interpolant by up to ~3.5e-8, so a "
    "regenerated fixture could flip a cell sitting on a 0.5e-4 rounding "
    "boundary (ADVICE r06); the 1e-6 tolerance is ~30x that bound with no "
    "boundary anywhere. Non-affine behaviour is pinned by the brute-force "
    "Delaunay differential in tests/test_delaunay.py. "
    "ref processors/OCO3SamProcessor.py:161-182 (griddata method='linear').",
)
def q126(spark: SparkSession, sf: str) -> DataFrame:
    return _affine_grid_contract(spark, sf, method="linear", verdict="lin_ok")


def _affine_grid_contract(
    spark: SparkSession, sf: str, method: str, verdict: str
) -> DataFrame:
    """Shared q126/q130 harness: interpolate an affine field end-to-end
    through :func:`grid_regions` with the given kernel and emit the
    per-cell verdict |interp − plane| <= 1e-6 at the operator's own
    float32 mesh coords (both the linear barycentric kernel and the cubic
    Bézier/Nielson kernel reproduce affine fields exactly —
    tests/test_delaunay.py pins both — so the oracle predicts every
    verdict true)."""
    cu = load(spark, sf, "customer")
    pts = cu.select(
        (F.col("c_custkey") % 5).alias("region"),
        (F.col("c_custkey") % 97 / F.lit(9.7)).alias("longitude"),
        (F.col("c_custkey") % 89 / F.lit(8.9)).alias("latitude"),
    )
    corners = spark.createDataFrame(
        [(r, x, y) for r in range(5) for x in (-0.5, 10.5) for y in (-0.5, 10.5)],
        "region long, longitude double, latitude double",
    )
    pts = (
        pts.unionByName(corners)
        .withColumn(
            "xco2",
            F.lit(2.0) + 3.0 * F.col("longitude") - 0.5 * F.col("latitude"),
        )
        .withColumn("min_lon", F.lit(0.0))
        .withColumn("min_lat", F.lit(0.0))
        .withColumn("max_lon", F.lit(10.0))
        .withColumn("max_lat", F.lit(10.0))
    )
    out = grid_ops.grid_regions(
        pts, ["region", "min_lon", "min_lat", "max_lon", "max_lat"], ["xco2"],
        lon_res=GRID_RES, lat_res=GRID_RES, method=method,
        bbox_cols=("min_lon", "min_lat", "max_lon", "max_lat"),
    )

    # the operator emits the float32 mesh coords it interpolated at; the
    # plane at those exact coords is the contract's reference value
    plane = (
        F.lit(2.0)
        + 3.0 * F.col("lon").cast("double")
        - 0.5 * F.col("lat").cast("double")
    )
    return out.select(
        "region", "lat_idx", "lon_idx",
        (F.abs(F.col("xco2") - plane) <= 1e-6).alias(verdict),
    )


_Q130_SQL = _Q126_SQL.replace("TRUE AS lin_ok", "TRUE AS cubic_ok")


@register(
    "q130_grid_cubic_kernel",
    _Q130_SQL,
    doc="G1 'cubic' gridding kernel (numpy Bézier-patch + Nielson-gradient "
    "C1 scheme, operators/interp.cubic_griddata) run end-to-end through the "
    "grouped-map operator — the q126 contract pattern with method='cubic' "
    "(VERDICT r06 item 3: cubic existed only behind unit tests). Nielson "
    "gradient estimation is exact for affine fields "
    "(tests/test_delaunay.py::test_nielson_gradients_exact_for_affine), so "
    "the cubic interpolant reproduces the plane exactly and the oracle "
    "predicts every |interp − plane| <= 1e-6 verdict true; non-affine "
    "behaviour (affine invariance, median-transversal linear derivative, "
    "quadratic precision with exact gradients, C1 at vertices/internal "
    "edges) is pinned by the kernel property suite. Since round 9 the "
    "kernel evaluates Powell's affine-invariant g=-1/2 reduced CT "
    "element with scipy's exact interpnd formulas (round 8 had used the "
    "edge-perpendicular reduction, which is globally C1 but NOT "
    "affine-invariant and hence NOT scipy's element — ADVICE r8 high); "
    "values match scipy to float rounding, bit-parity stays "
    "unverifiable without the wheel, so allow_fallback=False still "
    "raises. "
    "ref processors/OCO3SamProcessor.py:161-182 (griddata method='cubic').",
)
def q130(spark: SparkSession, sf: str) -> DataFrame:
    return _affine_grid_contract(spark, sf, method="cubic", verdict="cubic_ok")


@register(
    "q42_oco3_pipeline",
    None,
    doc="§3.1 end-to-end OCO-3 pipeline (segment → QF split → J1 → grid → "
    "footprint mask) over soundings synthesized deterministically from the "
    "events table; geometry refine + grouped-map kernel make it "
    "non-SQL-expressible (unit goldens in tests/test_pipeline.py).",
)
def q42(spark: SparkSession, sf: str) -> DataFrame:
    soundings = _synth_oco3_soundings(spark, sf)
    targets = spark.createDataFrame(
        [
            ("t0", "Target Zero", -0.5, -0.5, 8.5, 8.5),
            ("t1", "Target One", -0.5, -0.5, 8.5, 8.5),
            # t2 ABSENT -> unknown-target regions dropped by J1
        ],
        TARGETS_OCO3,
    )
    out = pipe.process_oco3_granules(
        soundings, targets, lon_res=6, lat_res=6, method="nearest"
    )
    return out.groupBy("qf", "target_id", "mode").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.countDistinct("region_id").alias("n_regions"),
    )


def _synth_oco3_soundings(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic OCO-3-shaped soundings derived from the events table
    (scales with sf; exercises segmentation, QF, gridding, masking)."""
    ev = load(spark, sf, "events")
    soundings = ev.select(
        F.concat(F.lit("g"), (F.col("user_id") % 4).cast("string")).alias("granule"),
        F.col("event_id").alias("sounding_id"),
        F.col("ts"),
        F.col("event_type"),
        F.col("value"),
    )
    w_idx = F.row_number().over(
        Window.partitionBy("granule").orderBy("ts", "sounding_id")
    ) - 1
    # Region structure must come from RUNS along the sounding index — the
    # real granule shape is contiguous SAM/target observation blocks of
    # O(100) soundings (ref processors/OCO3SamProcessor.py:356-432), not a
    # per-row coin flip. Deriving tkey/mode per row (the first cut used
    # user_id % 3, random along ts) produced |rows|/2 one-row regions at
    # the 10x fixture — 600k grouped-kernel invocations whose per-group
    # Arrow overhead dominated the pipeline. Index blocks of 120 give
    # scale-invariant run lengths: region COUNT grows linearly with rows,
    # region SIZE stays the production shape.
    block = (w_idx / F.lit(120)).cast("long")
    tkey = (block % 3).cast("string")
    mode_in_block = (
        F.when(block % 5 == 4, 0).when(block % 2 == 0, 2).otherwise(4)
    )
    lat = (F.col("value") % 8).cast("float")
    lon = (F.col("value") * 3 % 8).cast("float")
    d = F.lit(0.05)
    # C2: granule time from a date-component vector (the CO2 granule's
    # `date` variable shape), not date_trunc — exercises the reference's
    # datetime(*date[0]) path (functions/scalar.timestamp_from_components)
    date_vec = F.array(
        F.year("ts"), F.month("ts"), F.dayofmonth("ts"),
        F.lit(0), F.lit(0), F.lit(0),
    )
    soundings = soundings.select(
        "granule",
        w_idx.cast("long").alias("sounding_idx"),
        F.col("sounding_id").cast("long"),
        scalar_fns.timestamp_from_components(date_vec).alias("time"),
        lat.alias("latitude"),
        lon.alias("longitude"),
        F.array(lat - d, lat - d, lat + d, lat + d).alias("vertex_latitude"),
        F.array(lon - d, lon + d, lon + d, lon - d).alias("vertex_longitude"),
        mode_in_block.cast("byte").alias("operation_mode"),
        F.concat(F.lit("t"), tkey).alias("target_id"),
        F.concat(F.lit("name-t"), tkey).alias("target_name"),
        (F.col("value") < 5).cast("byte").alias("xco2_quality_flag"),
        F.col("value").cast("double").alias("xco2"),
        (F.col("value") / 10).cast("double").alias("xco2_uncertainty"),
    )
    return soundings


@register(
    "q44_oco3_global_raster",
    None,
    doc="Global-mode pipeline (G2/G6/G7): shared global mesh per (qf, day), "
    "footprint-union mask, first-wins target-metadata rasterization; "
    "geometry refine makes it non-SQL-expressible (goldens in "
    "tests/test_global_pipeline.py). ref OCO3SamGlobalProcessor.py:67-625.",
)
def q44(spark: SparkSession, sf: str) -> DataFrame:
    soundings = _synth_oco3_soundings(spark, sf)
    out = pipe.process_oco3_global(soundings, lon_res=19, lat_res=10)
    return out.groupBy("qf", "target_id", "target_type", "operation_mode").agg(
        F.count(F.lit(1)).alias("n_pixels"),
    )


@register(
    "q43_image_features",
    None,
    doc="Multimodal: synthetic raw-codec image corpus → mapInPandas "
    "decode + intensity features → relational rollup; binary decode is "
    "non-SQL-expressible (goldens in tests/test_multimodal.py).",
)
def q43(spark: SparkSession, sf: str) -> DataFrame:
    n = 200 if "0.1" in sf else 50
    imgs = mm.synthetic_images(spark, n)
    feats = mm.image_features(imgs)
    return feats.groupBy((F.col("item_id") % 4).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("mean_intensity"), 4).alias("avg_intensity"),
        F.round(F.sum("n_bytes"), 0).cast("long").alias("total_bytes"),
    )


@register(
    "q53_audio_features",
    None,
    doc="Multimodal audio: synthetic pcm16 clips → mapInPandas decode + "
    "duration/RMS/peak/zero-crossing features → relational rollup; binary "
    "decode is non-SQL-expressible (goldens in tests/test_multimodal.py).",
)
def q53(spark: SparkSession, sf: str) -> DataFrame:
    n = 200 if "0.1" in sf else 50
    clips = mm.synthetic_audio(spark, n)
    feats = mm.audio_features(clips)
    return feats.groupBy((F.col("item_id") % 5).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("rms"), 4).alias("avg_rms"),
        F.round(F.avg("zero_crossing_rate"), 4).alias("avg_zcr"),
        F.round(F.sum("duration_s"), 2).alias("total_seconds"),
    )


_Q132_SQL = """
    SELECT CAST(doc_id % 7 AS BIGINT) AS bucket,
           COUNT(*) AS n_images,
           TRUE AS png_exact,
           TRUE AS webp_exact
    FROM documents
    WHERE doc_id % 20 = 3
    GROUP BY 1
"""


@register(
    "q132_codec_roundtrip_contract",
    _Q132_SQL,
    doc="Multimodal codec contract: a deterministic image per sampled "
    "document row is encoded AND decoded through the from-spec PNG "
    "(operators/multimodal.py) and lossless-WebP VP8L "
    "(operators/webplite.py) codecs inside one mapInPandas pass — blobs "
    "never leave the task; only per-row verdict booleans reach the "
    "aggregate. Both codecs are lossless, so the oracle predicts every "
    "bit-exactness verdict true and the row count from the same sampling "
    "predicate. Exercises the full Spark plumbing (Arrow batch in/out, "
    "binary columns, codec dispatch) rather than the codecs in isolation.",
)
def q132(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    docs = (
        load(spark, sf, "documents")
        .select(F.col("doc_id").cast("long").alias("doc_id"))
        .where(F.col("doc_id") % 20 == 3)
    )

    def run(batches):
        import numpy as np

        from .operators import multimodal as _mm

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                rng = np.random.default_rng(int(doc_id))
                h = 5 + int(doc_id) % 5
                w = 4 + int(doc_id) % 7
                img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                png_back = _mm.decode_image(
                    "png", _mm.encode_image(img, "png"), w, h, 3
                )
                webp_back = _mm.decode_image(
                    "webp", _mm.encode_image(img, "webp"), w, h, 3
                )
                out.append(
                    (
                        int(doc_id),
                        bool((png_back == img).all()),
                        bool((webp_back[:, :, :3] == img).all()),
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "png_exact", "webp_exact"]
            )

    verdicts = docs.mapInPandas(
        run, "doc_id long, png_exact boolean, webp_exact boolean"
    )
    return verdicts.groupBy((F.col("doc_id") % 7).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_images"),
        F.bool_and("png_exact").alias("png_exact"),
        F.bool_and("webp_exact").alias("webp_exact"),
    )
