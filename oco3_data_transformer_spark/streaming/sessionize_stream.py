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
        T.StructField("starts", T.ArrayType(T.LongType())),
        T.StructField("stops", T.ArrayType(T.LongType())),
        T.StructField("tids", T.ArrayType(T.StringType())),
        T.StructField("ns", T.ArrayType(T.LongType())),
    ]
)


def _sif_fold(runs: list, start: int, stop: int, tid: str, n: int,
              margin: int, none_id: str) -> None:
    """One step of the reference's merge_last_or_append
    (ref processors/OCO3SifProcessor.py:377-405), mutating ``runs``."""
    if runs:
        last = runs[-1]
        if abs(start - last[1]) <= margin and (
            last[2] == tid or none_id in (last[2], tid)
        ):
            rid = last[2] if last[2] != none_id else tid
            runs[-1] = [last[0], stop, rid, last[3] + n]
            return
    runs.append([start, stop, tid, n])


def sessionize_stream_sif(
    soundings: DataFrame,
    margin: int = 2,
    none_id: str = "none",
    timeout_ms: int = 10_000,
) -> DataFrame:
    """Streaming SIF segmentation as a CUSTOM STATEFUL operator
    (``applyInPandasWithState``): per granule, open runs live in state as
    parallel arrays; each micro-batch folds its (index-sorted) soundings
    into them with the none-adoption merge; runs that can no longer merge
    (a newer run starts beyond the margin) emit immediately, and a
    processing-time timeout flushes the tail once a granule goes quiet.

    State is O(open runs) per granule — bounded by the merge margin, not by
    stream length. Emission is append-mode (each region exactly once).

    Assumes each granule's soundings arrive in index order across batches
    (the reference's queue delivers whole granules; within a batch any
    order is fine — the fold sorts). Late out-of-order rows for an emitted
    region would start a new region, the same behavior the reference's
    repair path corrects."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        granule = key[0]
        runs: list = (
            [list(r) for r in zip(*state.get)] if state.exists else []
        )
        if not state.hasTimedOut:
            batch = pd.concat(list(pdfs))
            batch = batch.sort_values("sounding_idx")
            for idx, tid in zip(batch["sounding_idx"], batch["target_id"]):
                i = int(idx)
                # each sounding is a width-1 run [i, i+1)
                _sif_fold(runs, i, i + 1, str(tid), 1, margin, none_id)
        else:
            list(pdfs)  # exhaust the (empty) iterator per contract

        if state.hasTimedOut:
            closed, runs = runs, []
        else:
            # the fold only ever extends the LAST run, so every non-last
            # run is final the moment a newer one exists — emit them now;
            # only the tail run stays open in state
            closed, runs = runs[:-1], runs[-1:]

        if runs:
            state.update(tuple(list(c) for c in zip(*runs)))
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
