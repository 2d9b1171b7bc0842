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

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


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


# ---------------------------------------------------------------------------
# Custom stateful variant (§2.11 applyInPandasWithState): the SIF merge fold
# — 'none'-id adoption with an index-gap margin — is a LEFT FOLD over runs
# (operators/sessionize._merge_runs_fold) that session_window cannot
# express: whether two runs merge depends on the (possibly upgraded) id of
# the previously merged run, not just on time proximity.
# ---------------------------------------------------------------------------

SIF_REGION_SCHEMA = T.StructType(
    [
        T.StructField("granule", T.StringType()),
        T.StructField("target_id", T.StringType()),
        T.StructField("start_idx", T.LongType()),
        T.StructField("stop_excl", T.LongType()),
        T.StructField("n_rows", T.LongType()),
    ]
)

_SIF_STATE_SCHEMA = T.StructType(
    [
        # flushed-but-still-mergeable slices (at most 1 after emission)
        T.StructField("starts", T.ArrayType(T.LongType())),
        T.StructField("stops", T.ArrayType(T.LongType())),
        T.StructField("tids", T.ArrayType(T.StringType())),
        T.StructField("ns", T.ArrayType(T.LongType())),
        # the contiguous run currently being built (reference's
        # in_region/start/target_id loop variables)
        T.StructField("open_start", T.LongType()),
        T.StructField("open_stop", T.LongType()),
        T.StructField("open_tid", T.StringType()),
        T.StructField("open_n", T.LongType()),
    ]
)


def _sif_merge_last_or_append(slices: list, item: list, margin: int,
                              none_id: str) -> None:
    """The reference's merge_last_or_append
    (ref processors/OCO3SifProcessor.py:377-405), mutating ``slices``."""
    if slices:
        last = slices[-1]
        if abs(last[1] - item[0]) <= margin and (
            last[2] == item[2] or none_id in (last[2], item[2])
        ):
            rid = last[2] if last[2] != none_id else item[2]
            slices[-1] = [last[0], item[1], rid, last[3] + item[3]]
            return
    slices.append(list(item))


def sessionize_stream_sif(
    soundings: DataFrame,
    margin: int = 2,
    none_id: str = "none",
    timeout_ms: int = 10_000,
) -> DataFrame:
    """Streaming SIF segmentation as a CUSTOM STATEFUL operator
    (``applyInPandasWithState``), a faithful streaming transcription of the
    reference's row loop (ref processors/OCO3SifProcessor.py:368-477):

      - contiguous soundings extend the OPEN run; a leading ``none`` id
        upgrades to the run's first real id (``if target_id == 'none':
        target_id = target``); a ``none`` inside a real-id run is absorbed;
      - an index gap (= an off-mode stretch in the reference's full-index
        loop) FLUSHES the open run through ``merge_last_or_append`` — where
        the none-adoption left fold lives: a flushed run within ``margin``
        of the previous slice merges when ids match or either is none;
      - every slice except the most recent is final (the fold only ever
        touches ``slices[-1]``) and emits immediately; the open run + last
        slice live in group state (O(1) per granule, not O(stream));
      - a processing-time timeout flushes a quiet granule's tail.

    session_window cannot express this: whether two runs merge depends on
    the previously-merged run's (possibly upgraded) id, not just on
    proximity. Emission is append-mode, each region exactly once.

    Assumes each granule's soundings arrive in index order across batches
    (the reference's queue delivers whole granules; within a batch any
    order is fine — the fold sorts). A late row for an emitted region
    starts a new region — the same situation the reference fixes via its
    repair path."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        granule = key[0]
        if state.exists:
            starts, stops, tids, ns, o_start, o_stop, o_tid, o_n = state.get
            slices = [list(r) for r in zip(starts, stops, tids, ns)]
            open_run = (
                [o_start, o_stop, o_tid, o_n] if o_start is not None else None
            )
        else:
            slices, open_run = [], None

        if not state.hasTimedOut:
            batch = pd.concat(list(pdfs)).sort_values("sounding_idx")
            for idx, tid in zip(batch["sounding_idx"], batch["target_id"]):
                i, tid = int(idx), str(tid)
                if open_run is None:
                    open_run = [i, i + 1, tid, 1]
                elif i == open_run[1]:  # contiguous: extend / upgrade / split
                    if open_run[2] == none_id:
                        open_run[2] = tid
                    if tid != open_run[2] and tid != none_id:
                        _sif_merge_last_or_append(slices, open_run, margin, none_id)
                        open_run = [i, i + 1, tid, 1]
                    else:  # same id, or an absorbed interior none
                        open_run[1] = i + 1
                        open_run[3] += 1
                else:  # index gap = off-mode stretch -> flush the region
                    _sif_merge_last_or_append(slices, open_run, margin, none_id)
                    open_run = [i, i + 1, tid, 1]
        else:
            list(pdfs)  # exhaust the (empty) iterator per contract

        if state.hasTimedOut:
            if open_run is not None:
                _sif_merge_last_or_append(slices, open_run, margin, none_id)
                open_run = None
            closed, slices = slices, []
        else:
            # the fold only ever touches slices[-1]; everything before it
            # is final and emits now
            closed, slices = slices[:-1], slices[-1:]

        if slices or open_run is not None:
            cols = tuple(list(c) for c in zip(*slices)) if slices else ([], [], [], [])
            o = open_run or [None, None, None, None]
            state.update((*cols, o[0], o[1], o[2], o[3]))
            state.setTimeoutDuration(timeout_ms)
        else:
            state.remove()
        if closed:
            yield pd.DataFrame(
                [
                    {
                        "granule": granule,
                        "target_id": r[2],
                        "start_idx": r[0],
                        "stop_excl": r[1],
                        "n_rows": r[3],
                    }
                    for r in closed
                ]
            )

    return soundings.groupBy("granule").applyInPandasWithState(
        fn,
        outputStructType=SIF_REGION_SCHEMA,
        stateStructType=_SIF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
