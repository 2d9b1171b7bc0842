"""Parquet table registry for the driver's synthetic tables (TESTDATA.md).

Reads are plain ``spark.read.parquet`` so Catalyst predicate pushdown /
column pruning reach the scan. The *analyzed DataFrame handle* per
``(session, sf_dir, table)`` is memoized: DataFrames are immutable plan
descriptions, so handing the same handle to every query is semantically
identical to re-reading — but it skips the per-call Py4J round-trips,
file listing, and footer/schema read that otherwise dominate small-query
driver latency (measured: ~46% of the sf0.1 headline total was DataFrame
*construction*, scripts/floor_split.py). The tables here are the driver's
read-only inputs (TESTDATA.md forbids writing them), so a cached file
listing can never go stale. No table DATA is cached — execution still
scans parquet with full pushdown/pruning every run.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Columns stored as parquet TIMESTAMP(NANOS), which Spark only reads via
# spark.sql.legacy.parquet.nanosAsLong (set in session.py) — converted back
# to microsecond timestamps here. Integer division (`div`) avoids the
# precision loss a double division would incur on ns-epoch magnitudes.
NANO_TS_COLS = {"events": ["ts"]}


# (session, sf_dir, table) -> DataFrame handle. The cache holds a strong
# reference to the session object, so identity comparison below can never
# hit a recycled id(); entries for stopped sessions are evicted on miss.
_HANDLE_CACHE: dict[tuple[int, str, str], tuple[SparkSession, DataFrame]] = {}


def _evict_stale(live: SparkSession) -> None:
    for k in [k for k, (sess, _) in _HANDLE_CACHE.items() if sess is not live]:
        stale = _HANDLE_CACHE[k][0]
        try:
            stopped = stale._jsc is None or stale._jsc.sc().isStopped()
        except Exception:
            stopped = True
        if stopped:
            del _HANDLE_CACHE[k]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(name)
    key = (id(spark), sf_dir, name)
    hit = _HANDLE_CACHE.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    _evict_stale(spark)
    # Runtime-settable session conf: required so callers with a vanilla
    # SparkSession (no session.py builder) can still read TIMESTAMP(NANOS)
    # parquet columns. Without it the read throws PARQUET_TYPE_ILLEGAL.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col, dtype in df.dtypes:
        if name in NANO_TS_COLS and col in NANO_TS_COLS[name] and dtype == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    _HANDLE_CACHE[key] = (spark, df)
    return df


def create_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so the full catalog surface is
    reachable through plain ``spark.sql(...)`` — the SQL-first entry point
    (the DataFrame catalog and SQL strings compile to the same Catalyst
    plans, so pushdown/pruning/broadcast behavior is identical)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
