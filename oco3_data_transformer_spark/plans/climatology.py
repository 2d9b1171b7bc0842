"""The climatology tool (§3.3, ref tools/climatology/main.py) as one
declarative plan over the gridded store: read → time subset → per-span
pixel means → optional month-of-year consolidation.

The reference opens the Zarr store lazily, derives span boundaries with
pandas date_range, loops spans computing ``mean(dim='time')`` under a
thread pool, then concats + sorts (ref tools/climatology/main.py:125-331).
Here the span loop is a single ``groupBy(span, pixel)`` — Spark's partial
aggregation does per-span parallelism without a driver loop, and the time
filter prunes store partitions (day-partitioned layout, sinks/store.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.aggregates import climatology_spans, month_of_year_consolidation
from ..operators.filters import time_range

PIXEL_KEYS = ["mission", "target_id", "qf", "variable", "lat_idx", "lon_idx"]


def climatology(
    store_rows: DataFrame,
    freq: str = "month",
    start=None,
    end=None,
    month_of_year: bool = False,
) -> DataFrame:
    """Per-pixel temporal climatology of the long-format store.

    Output per (pixel, span): ``mean`` (skipna), ``valid_count`` (non-null
    member slices), ``n_days`` (distinct days aggregated) — the reference's
    xco2/uncertainty mean + valid_count + n_days triple
    (ref tools/climatology/main.py:223-249). ``month_of_year=True`` adds the
    cross-year calendar-month consolidation (A2, ref :281-329) with spans
    mapped to year 1970.
    """
    df = store_rows
    if start is not None or end is not None:
        df = time_range(df, "time", start or "0001-01-01", end or "9999-12-31")
    spans = climatology_spans(df, "time", ["value"], freq=freq, extra_keys=PIXEL_KEYS)
    spans = spans.select(
        *PIXEL_KEYS,
        "span",
        F.col("value_mean").alias("mean"),
        F.col("value_valid_count").alias("valid_count"),
        "n_days",
    )
    if not month_of_year:
        return spans
    out = month_of_year_consolidation(
        spans, "span", mean_cols=["mean"], count_cols=["valid_count", "n_days"],
        extra_keys=PIXEL_KEYS,
    )
    return out.select(*PIXEL_KEYS, "month", "span", "mean", "valid_count", "n_days")
