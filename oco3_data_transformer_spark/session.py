"""SparkSession construction with scale-aware defaults.

The reference pipeline is a single 16 vCPU / 120 GiB node with hand-tuned
thread pools and a semaphore memory guard (BASELINE.md). Here all of that is
delegated to Spark: AQE re-plans at runtime (skew joins, coalesced shuffle
partitions), Arrow accelerates the few pandas-UDF kernels, and shuffle
partition counts are sized by config rather than hard-coded pools.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "oco3-data-transformer-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Defaults chosen for 100 TB-scale behavior, verified locally:
      - AQE on: runtime shuffle-partition coalescing + skew-join splitting
        replaces the reference's fixed thread pools and INTERP semaphore.
      - Arrow on: the gridding kernel (applyInPandas) transfers columnar
        batches, not pickled rows.
      - parquet zstd: matches the reference's Blosc-9/zlib-9 stance
        (ref writers/ZarrWriter.py:205) with a splittable columnar format.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # 64 MB broadcast ceiling (default 10 MB is conservative for
        # multi-GB executors): mid-size dimensions (e.g. orders at bench
        # scale) broadcast instead of shuffling the fact side. Still
        # size-gated — AQE applies it to RUNTIME-measured sizes, so a
        # genuinely large table never broadcasts at 100 TB.
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python DataSource V2 scans (sources/granule_datasource.py) absorb
        # scalar predicates into the decode task; off by default in 4.1
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet TIMESTAMP(NANOS) (e.g. events.ts) is read as long nanos and
        # converted to a proper timestamp in sources/registry.py.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
