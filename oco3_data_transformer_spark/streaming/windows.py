"""Native event-time session windows for streaming burst-collapse
(debounce) — the Structured Streaming counterpart of
``operators/timeseries.debounce``.

Spark's ``session_window`` is purpose-built state machinery for gap-based
sessions: windows extend while events arrive within the gap and merge when
they touch, state is evicted by the watermark, and the whole operator is
JVM-side (no Python state function, unlike the applyInPandasWithState
sessionizer in sessionize_stream.py which exists to transcribe the
reference's bespoke merge loop exactly).

Boundary semantics differ from the batch operator by a half-open interval:
``session_window`` closes a session when the next event is ``>= gap``
after the previous one, while the batch debounce keeps an event exactly
``gap`` seconds later in-burst (strict ``>``). For continuous timestamps
the equality case has measure zero; callers that must match the batch
operator bit-for-bit on second-aligned data should add one microsecond to
the gap (``gap_s + 1e-6``), which this module does — making the two
operators equivalent on any input whose timestamps are >= microsecond
granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_bursts(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_s: int,
    watermark: str | None = None,
) -> DataFrame:
    """Per-key burst aggregation over event-time session windows.

    Works on both batch and streaming frames (the equivalence test runs
    the same expression both ways). For streams, ``watermark`` (e.g.
    ``"10 minutes"``) bounds session state and makes results finalize in
    ``append`` output mode: a session emits once the watermark passes its
    close — the completeness hold-back of §2.10, with wall-clock lateness
    instead of a collection predicate.

    Returns ``(*key_cols, burst_start, burst_end, n_events)``.
    """
    # +1 microsecond: align session_window's half-open gap with the batch
    # operator's inclusive boundary (see module docstring)
    gap_us = gap_s * 1_000_000 + 1
    df = events
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    win = F.session_window(F.col(ts_col), f"{gap_us} microseconds")
    return (
        df.groupBy(win, *key_cols)
        .agg(F.count(F.lit(1)).alias("n_events"), F.min(ts_col).alias("burst_start"))
        .select(
            *key_cols,
            "burst_start",
            F.col("session_window.end").alias("burst_end"),
            "n_events",
        )
    )
