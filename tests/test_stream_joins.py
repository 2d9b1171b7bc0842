"""Stream-stream time-bound join (streaming/joins.py): the streaming run
over file-fed micro-batches must produce exactly the batch join's pairs."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from oco3_data_transformer_spark.streaming import joins as sjoins

CLICK_SCHEMA = T.StructType(
    [
        T.StructField("click_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
BUY_SCHEMA = T.StructType(
    [
        T.StructField("buy_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

T0 = dt.datetime(2024, 1, 1)


def _t(s):
    return T0 + dt.timedelta(seconds=s)


CLICKS = [(1, 1, _t(0)), (2, 1, _t(1000)), (3, 2, _t(50))]
BUYS = [
    (10, 1, _t(200)),   # within 600s of click 1
    (11, 1, _t(1500)),  # within 600s of click 2 only
    (12, 2, _t(40)),    # BEFORE click 3 -> no match (rt >= lt)
    (13, 3, _t(100)),   # no click from user 3
]


def _pairs(rows):
    return sorted((r["l_click_id"], r["r_buy_id"]) for r in rows)


EXPECT = [(1, 10), (2, 11)]


def test_batch_form_matches_expected(spark):
    clicks = spark.createDataFrame(CLICKS, CLICK_SCHEMA)
    buys = spark.createDataFrame(BUYS, BUY_SCHEMA)
    out = sjoins.time_bound_join(
        clicks, buys, ["user_id"], "ts", "ts", 600, "10 minutes"
    )
    assert _pairs(out.collect()) == EXPECT


def test_streaming_matches_batch(spark, tmp_path):
    csrc, bsrc = str(tmp_path / "clicks"), str(tmp_path / "buys")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    # two micro-batch waves, then a far-future flush row on each side so the
    # watermark passes every real event and all pairs finalize
    flush_c = [(99, 9, T0 + dt.timedelta(days=2))]
    flush_b = [(98, 9, T0 + dt.timedelta(days=3))]
    waves = [
        (CLICKS[:2], BUYS[:2]),
        (CLICKS[2:], BUYS[2:]),
        (flush_c, flush_b),
    ]
    for cwave, bwave in waves:
        if cwave:
            spark.createDataFrame(cwave, CLICK_SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(csrc)
        if bwave:
            spark.createDataFrame(bwave, BUY_SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(bsrc)
        clicks = spark.readStream.schema(CLICK_SCHEMA).parquet(csrc)
        buys = spark.readStream.schema(BUY_SCHEMA).parquet(bsrc)
        q = (
            sjoins.time_bound_join(
                clicks, buys, ["user_id"], "ts", "ts", 600, "10 minutes"
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    got = [
        p
        for p in _pairs(spark.read.parquet(out).collect())
        if p[0] != 99  # drop flush-row self-pairs
    ]
    assert got == EXPECT


def test_streaming_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    csrc, bsrc = str(tmp_path / "clicks"), str(tmp_path / "buys")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    flush_c = [(99, 9, T0 + dt.timedelta(days=2))]
    flush_b = [(98, 9, T0 + dt.timedelta(days=3))]
    for cwave, bwave in [(CLICKS, BUYS), (flush_c, flush_b)]:
        spark.createDataFrame(cwave, CLICK_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(csrc)
        spark.createDataFrame(bwave, BUY_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(bsrc)
        clicks = spark.readStream.schema(CLICK_SCHEMA).parquet(csrc)
        buys = spark.readStream.schema(BUY_SCHEMA).parquet(bsrc)
        q = (
            sjoins.time_bound_join(
                clicks, buys, ["user_id"], "ts", "ts", 600, "10 minutes",
                how="left_outer",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    rows = [r for r in spark.read.parquet(out).collect() if r["l_click_id"] != 99]
    matched = sorted(
        (r["l_click_id"], r["r_buy_id"]) for r in rows if r["r_buy_id"] is not None
    )
    unmatched = sorted(r["l_click_id"] for r in rows if r["r_buy_id"] is None)
    assert matched == EXPECT
    assert unmatched == [3]  # click 3's only candidate buy happened BEFORE it
