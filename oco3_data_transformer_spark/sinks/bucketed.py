"""Bucketed-table writes: pre-shuffled storage for exchange-free joins.

At 100 TB the dominant cost of a fact-to-fact equi-join is shuffling both
sides. Spark's bucketing writes a table pre-hash-partitioned on the join
key (``bucketBy``), recording the layout in the catalog; a later join of
two tables bucketed on the same key with the same bucket count needs NO
exchange at all — each task zips the matching bucket files. This is the
table-layout analog of the reference's "merge per target before writing"
batching (ref sam_extract/main.py:424-449, SURVEY §4) and the engine's
standing answer for repeatedly-joined big tables (fact-fact sync diffs,
slice-key upserts, dedup-pair verification reruns).

Operational notes baked into :func:`write_bucketed`:
  - bucket count is fixed at write time — pick it for the TARGET scale
    (buckets ≈ table_size / 128 MB); too few buckets serializes the join.
  - ``sortBy`` the same key so the join can run as a zip-merge without
    even an in-task sort.
  - one file per bucket (repartition on the bucket key first): naive
    bucketed writes emit one file per task per bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Save ``df`` as a managed parquet table bucketed (and by default
    sorted) on ``key`` with ``n_buckets`` buckets, one file per bucket."""
    writer = (
        df.repartition(n_buckets, df[key])
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
