"""Stream-stream joins with event-time bounds — the remaining Structured
Streaming join mode the engine exposes (stream-static joins appear in
ingest.py's completeness/ledger lookups; this module covers joining two
live streams).

A stream-stream inner join is only executable when Spark can bound the
state it must keep for each side; that takes BOTH a watermark on each
stream AND a time-range predicate tying the two event times together.
With them, rows older than ``watermark + bound`` are evicted from the join
state — the property that lets the join run forever at constant memory,
which is exactly the late-data reasoning of the reference's day-completeness
hold-back (§2.10) applied to pairs of streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_bound_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    bound_s: int,
    watermark: str,
    prefix_left: str = "l_",
    prefix_right: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Join two (streaming or batch) frames on ``key_cols`` where the
    right event happens within ``[left_ts, left_ts + bound_s]`` — the
    "click followed by a purchase within N minutes" shape.

    Both sides are watermarked (no-op on batch frames), all columns are
    prefixed, and the join condition carries the time-range bound so the
    streaming planner can size and evict state. The same expression runs
    identically on batch frames — the equivalence test drives it both
    ways on the same data.

    ``how='left_outer'`` additionally emits left rows that never matched,
    with nulls on the right — in streaming they surface only once the
    watermark proves no in-bound right row can still arrive (the
    "clicks that did NOT convert" feed), which is why outer stream joins
    REQUIRE the watermark + bound the inner form merely exploits.
    """
    l = left.select(*[F.col(c).alias(prefix_left + c) for c in left.columns])
    r = right.select(*[F.col(c).alias(prefix_right + c) for c in right.columns])
    if left.isStreaming:
        l = l.withWatermark(prefix_left + left_ts, watermark)
    if right.isStreaming:
        r = r.withWatermark(prefix_right + right_ts, watermark)
    lt, rt = F.col(prefix_left + left_ts), F.col(prefix_right + right_ts)
    cond = (rt >= lt) & (rt <= lt + F.expr(f"INTERVAL {bound_s} SECONDS"))
    for k in key_cols:
        cond = cond & (F.col(prefix_left + k) == F.col(prefix_right + k))
    return l.join(r, cond, how)
