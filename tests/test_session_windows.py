"""Native session_window burst-collapse (streaming/windows.py): batch
equivalence with operators/timeseries.debounce on random event sequences,
and an end-to-end streaming run with watermark finalization."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import types as T

from oco3_data_transformer_spark.operators import timeseries as ts_ops
from oco3_data_transformer_spark.streaming import windows as win_ops

EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)

T0 = dt.datetime(2024, 1, 1)


def _random_events(rng, n=300):
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                T0
                + dt.timedelta(
                    seconds=rng.randint(0, 5000), microseconds=rng.randint(0, 999999)
                ),
                rng.randint(1, 4),
                rng.choice(["a", "b"]),
            )
        )
    return rows


def _bursts_of(rows):
    """(user, type, burst_start) -> n_events, comparable across operators."""
    return sorted(
        (r["user_id"], r["event_type"], r["burst_start"], r["n_events"]) for r in rows
    )


def test_session_window_matches_batch_debounce(spark):
    rng = random.Random(7)
    ev = spark.createDataFrame(_random_events(rng), EV_SCHEMA)
    gap = 120
    batch = ts_ops.debounce(ev, ["user_id", "event_type"], "ts", "event_id", gap)
    sess = win_ops.session_bursts(ev, ["user_id", "event_type"], "ts", gap)
    assert _bursts_of(batch.collect()) == _bursts_of(sess.collect())


def test_session_window_inclusive_gap_boundary(spark):
    # event exactly gap seconds after the previous stays in the burst,
    # matching the batch operator's strict-> semantics (the +1us alignment)
    ev = spark.createDataFrame(
        [(0, T0, 1, "a"), (1, T0 + dt.timedelta(seconds=120), 1, "a")], EV_SCHEMA
    )
    out = win_ops.session_bursts(ev, ["user_id", "event_type"], "ts", 120).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2


def test_session_bursts_streaming_finalize(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    b1 = [(0, T0, 1, "a"), (1, T0 + dt.timedelta(seconds=30), 1, "a")]
    b2 = [(2, T0 + dt.timedelta(seconds=500), 1, "a")]
    # sentinel far-future event pushes the watermark past every real session
    flush = [(99, T0 + dt.timedelta(days=2), 9, "zz")]
    for batch in (b1, b2, flush):
        spark.createDataFrame(batch, EV_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(EV_SCHEMA).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = (
            win_ops.session_bursts(
                stream, ["user_id", "event_type"], "ts", 120, watermark="1 minute"
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = _bursts_of(
        spark.read.parquet(out).filter("user_id != 9").collect()
    )
    assert got == [
        (1, "a", T0, 2),
        (1, "a", T0 + dt.timedelta(seconds=500), 1),
    ]
