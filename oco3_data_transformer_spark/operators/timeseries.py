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


def _epoch_us(ts):
    """Exact integer microseconds since epoch. ``unix_micros`` rejects
    TIMESTAMP_NTZ (the type parquet event tables read as); the cast to
    TIMESTAMP is lossless because the engine pins the session timezone to
    UTC (session.py), making NTZ→TZ an identity."""
    return F.unix_micros(ts.cast("timestamp"))


def debounce(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    gap_s: int,
) -> DataFrame:
    """Burst-collapse (debounce): per key, consecutive events closer than
    ``gap_s`` seconds chain into one *burst*; each burst is reported once
    with its first timestamp and size — the alert/event-suppression
    pattern ("notify once per burst, not once per occurrence").

    This is gap-based sessionization over event time (complementing the
    key-change islands of operators/sessionize.py): a burst breaks when
    ``ts - lag(ts) > gap_s``, so membership is relative to the *previous
    event*, not the burst head — a burst can extend indefinitely while
    events keep arriving inside the gap.

    One exchange end-to-end: the break flag, the running burst id, and the
    final per-burst aggregate all share the key partitioning (agg keys ⊇
    window partitioning). Timestamp gaps compare as exact microsecond
    integers (``unix_micros``, never second-truncating
    ``unix_timestamp``). Returns
    ``(*key_cols, burst_id, burst_start, burst_end, n_events)`` — the
    burst extent doubles as an interval table for overlap joins
    (``interval_overlap_join`` in operators/joins.py).
    """
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    us = _epoch_us(F.col(ts_col))
    gap = us - F.lag(us).over(w)
    brk = F.when(gap.isNull() | (gap > gap_s * 1_000_000), F.lit(1)).otherwise(F.lit(0))
    with_id = events.withColumn("__brk", brk).withColumn(
        "burst_id",
        F.sum("__brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return with_id.groupBy(*key_cols, "burst_id").agg(
        F.min(ts_col).alias("burst_start"),
        F.max(ts_col).alias("burst_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def rolling_features(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    window_s: int,
) -> DataFrame:
    """Per-event trailing-window features: for every event, the count and
    sum of the key's events in the preceding ``window_s`` seconds
    (inclusive) — the rolling-aggregate feature shape (rate limits,
    activity scores, per-user request velocity).

    Uses a RANGE frame over the microsecond epoch, so the frame is defined
    by *time*, not row position: ties and irregular sampling are handled
    exactly, and the result is independent of any tie-break ordering. The
    sum accumulates in DECIMAL (exact, order-invariant — double summation
    would differ across partitionings in the last ulp) and surfaces as a
    double. One exchange on the key; the frame is computed in a single
    window pass per partition.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(_epoch_us(F.col(ts_col)))
        .rangeBetween(-window_s * 1_000_000, 0)
    )
    return events.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(id_col),
        F.count(F.lit(1)).over(w).alias("n_window"),
        F.round(
            F.sum(F.col(value_col).cast("decimal(18,6)")).over(w).cast("double"), 6
        ).alias("sum_window"),
    )


def transition_matrix(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    state_col: str,
) -> DataFrame:
    """First-order transition counts and probabilities over each key's
    event sequence (the Markov-chain / user-journey profile): for every
    consecutive pair of events per key, count ``state -> next_state`` and
    normalize per source state.

    Shape: one window pass on the key partitioning, then a global
    (from_state, to_state) aggregate — its exchange carries at most
    |states|^2 x partition-count partial rows thanks to map-side combine,
    and the per-source normalization window runs over that tiny result.
    Probabilities are exact integer-ratio doubles.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    pairs = (
        events.withColumn("__next", F.lead(F.col(state_col)).over(w))
        .filter(F.col("__next").isNotNull())
        .groupBy(
            F.col(state_col).alias("from_state"), F.col("__next").alias("to_state")
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    w_tot = Window.partitionBy("from_state")
    return pairs.withColumn(
        "p",
        F.col("n_transitions").cast("double") / F.sum("n_transitions").over(w_tot),
    )
