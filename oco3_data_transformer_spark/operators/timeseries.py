"""Time-series regularization: fixed-interval bucketing, gap-filling against
a dense time spine, and last-observation-carried-forward (LOCF) fill.

The reference densifies empty days in its output grid so every day in the
processed range has a slice (ref sam_extract/GapFiller — SURVEY §2 G9);
this operator is the general engine form: bucket an event stream to a fixed
interval, densify every (series, bucket) cell over the observed range, and
carry the last observed aggregate forward into the gaps.

Scale shape: one shuffle to aggregate per (series, bucket); the spine is a
two-row aggregate crossed with the (small) series dimension, so the densify
join broadcasts the spine; the LOCF window repartitions by series only once.
State per series is one running value — at 100 TB the window is bounded by
buckets-per-series, not event count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_bucket(ts_col, interval_s: int):
    """Floor a timestamp to a fixed ``interval_s``-second bucket (epoch-
    aligned, matching DuckDB ``time_bucket`` for intervals that divide the
    2000-01-01 epoch offset)."""
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(ts_col) / interval_s).cast("long") * interval_s
    )


def gapfill_locf(
    events: DataFrame,
    series_col: str,
    ts_col: str,
    value_col: str,
    interval_s: int,
) -> DataFrame:
    """Dense per-series bucket grid over the global observed range, with
    event counts and an LOCF-filled running aggregate.

    The carried value is the bucket **max** (order-insensitive, hence exact
    across engines and partitionings); buckets before a series' first event
    stay null. Returns
    ``(series, bucket_ts, n_events, filled_max, is_gap)``.
    """
    bucketed = events.select(
        F.col(series_col),
        time_bucket(F.col(ts_col), interval_s).alias("bucket_ts"),
        F.col(value_col).alias("__v"),
    )
    agg = bucketed.groupBy(series_col, "bucket_ts").agg(
        F.count(F.lit(1)).alias("__n"), F.max("__v").alias("__mx")
    )
    spine = bucketed.agg(
        F.min("bucket_ts").alias("__lo"), F.max("bucket_ts").alias("__hi")
    ).select(
        F.explode(
            F.sequence("__lo", "__hi", F.expr(f"INTERVAL {interval_s} SECONDS"))
        ).alias("bucket_ts")
    )
    grid = bucketed.select(series_col).distinct().crossJoin(F.broadcast(spine))
    w = (
        Window.partitionBy(series_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(agg, [series_col, "bucket_ts"], "left")
        .select(
            F.col(series_col),
            F.col("bucket_ts"),
            F.coalesce("__n", F.lit(0)).alias("n_events"),
            F.last("__mx", ignorenulls=True).over(w).alias("filled_max"),
            F.col("__n").isNull().cast("int").alias("is_gap"),
        )
    )
