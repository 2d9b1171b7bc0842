"""Explicit StructTypes for the mission tables (SURVEY.md §1.3, FIXTURES.md).

The reference's schema is externally fixed per mission (hard-coded
``NEEDED_VARS``/``DEFAULT_INCLUDED_VARS``, ref
processors/OCO3SamProcessor.py:52-59, OCO2Processor.py:58-60,
OCO3SifProcessor.py:55-64) merged with user-selected variables; here each
mission gets an explicit StructType and config-driven projection is a
``select`` (F1 — Catalyst column pruning).
"""

from __future__ import annotations

from pyspark.sql import types as T

_common = [
    T.StructField("granule", T.StringType()),
    T.StructField("sounding_idx", T.LongType()),
    T.StructField("sounding_id", T.LongType()),
    T.StructField("time", T.TimestampType()),
    T.StructField("latitude", T.FloatType()),
    T.StructField("longitude", T.FloatType()),
    T.StructField("vertex_latitude", T.ArrayType(T.FloatType())),
    T.StructField("vertex_longitude", T.ArrayType(T.FloatType())),
    T.StructField("operation_mode", T.ByteType()),
]

# FIXTURES.md §1 — OCO-3 CO2 fact table
SOUNDINGS_OCO3 = T.StructType(
    [
        *_common,
        T.StructField("target_id", T.StringType()),
        T.StructField("target_name", T.StringType()),
        T.StructField("xco2_quality_flag", T.ByteType()),
        T.StructField("xco2", T.DoubleType()),
        T.StructField("xco2_uncertainty", T.DoubleType()),
    ]
)

# FIXTURES.md §2 — OCO-2: no target columns, adds xco2_x2019
SOUNDINGS_OCO2 = T.StructType(
    [
        *_common,
        T.StructField("xco2_quality_flag", T.ByteType()),
        T.StructField("xco2", T.DoubleType()),
        T.StructField("xco2_uncertainty", T.DoubleType()),
        T.StructField("xco2_x2019", T.DoubleType()),
    ]
)

# FIXTURES.md §3 — SIF (source-style capitalized names)
SOUNDINGS_SIF = T.StructType(
    [
        T.StructField("granule", T.StringType()),
        T.StructField("sounding_idx", T.LongType()),
        T.StructField("delta_time", T.DoubleType()),
        T.StructField("Latitude", T.FloatType()),
        T.StructField("Longitude", T.FloatType()),
        T.StructField("Latitude_Corners", T.ArrayType(T.FloatType())),
        T.StructField("Longitude_Corners", T.ArrayType(T.FloatType())),
        T.StructField("MeasurementMode", T.ByteType()),
        T.StructField("Quality_Flag", T.ByteType()),
        T.StructField("SequencesIndex", T.IntegerType()),
        T.StructField("Daily_SIF_757nm", T.DoubleType()),
    ]
)

# FIXTURES.md §4 — SIF sequence dimension
SIF_SEQUENCES = T.StructType(
    [
        T.StructField("granule", T.StringType()),
        T.StructField("seq_idx", T.IntegerType()),
        T.StructField("SequencesId", T.StringType()),
        T.StructField("SequencesName", T.StringType()),
    ]
)

# FIXTURES.md §5/§6 — target dimensions (broadcast side of J1 / J2)
TARGETS_OCO3 = T.StructType(
    [
        T.StructField("target_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("min_lon", T.DoubleType()),
        T.StructField("min_lat", T.DoubleType()),
        T.StructField("max_lon", T.DoubleType()),
        T.StructField("max_lat", T.DoubleType()),
    ]
)

TARGETS_OCO2 = T.StructType(
    [
        T.StructField("target_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("centroid_lon", T.DoubleType()),
        T.StructField("centroid_lat", T.DoubleType()),
        T.StructField("min_lon", T.DoubleType()),
        T.StructField("min_lat", T.DoubleType()),
        T.StructField("max_lon", T.DoubleType()),
        T.StructField("max_lat", T.DoubleType()),
    ]
)

# Long-format gridded store row (FIXTURES.md §8; replaces the Zarr layout)
STORE_SLICE = T.StructType(
    [
        T.StructField("mission", T.StringType()),
        T.StructField("target_id", T.StringType()),
        T.StructField("qf", T.StringType()),  # 'pre' | 'post'
        T.StructField("time", T.TimestampType()),
        T.StructField("lat_idx", T.IntegerType()),
        T.StructField("lon_idx", T.IntegerType()),
        T.StructField("variable", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)
