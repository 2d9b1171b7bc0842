"""§2.4 segmentation in streaming mode (SURVEY §2.10 'Windows' row).

Batch segmentation orders by the sounding index (operators/sessionize.py);
a stream has no global index, so the streaming analog keys regions by
*event-time session windows*: soundings of the same (granule, mode, target)
whose timestamps are within ``gap`` of each other belong to one region —
the reference's gap-merge margin re-expressed in time (soundings arrive at
a fixed cadence, so index-gap ≈ time-gap × rate).

``session_window`` + watermark gives incremental, state-bounded region
aggregation: Spark merges overlapping sessions per key as data arrives and
emits a region row once the watermark passes its close — the hold-back
semantics the reference gets from day-completeness checks (J6) fall out of
the watermark delay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize_stream(
    soundings: DataFrame,
    time_col: str = "time",
    gap: str = "10 seconds",
    watermark: str = "30 seconds",
    key_cols: tuple[str, ...] = ("granule", "operation_mode", "target_id"),
) -> DataFrame:
    """Streaming region table: one row per closed session window per
    (granule, mode, target) with sounding count and time extent.

    Works identically on a batch DataFrame (session_window is a grouping
    expression) — tests exercise both; only the streaming variant needs the
    watermark for state eviction.
    """
    df = soundings
    if df.isStreaming:
        df = df.withWatermark(time_col, watermark)
    return (
        df.groupBy(*key_cols, F.session_window(F.col(time_col), gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_soundings"),
            F.min(time_col).alias("first_seen"),
            F.max(time_col).alias("last_seen"),
        )
        .select(
            *key_cols,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_soundings",
            "first_seen",
            "last_seen",
        )
    )
