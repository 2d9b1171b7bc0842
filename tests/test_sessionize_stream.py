"""Streaming sessionization: session_window region detection — batch-mode
semantics plus a real micro-batch stream run."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from oco3_data_transformer_spark.streaming.sessionize_stream import sessionize_stream

SCHEMA = T.StructType(
    [
        T.StructField("granule", T.StringType()),
        T.StructField("operation_mode", T.IntegerType()),
        T.StructField("target_id", T.StringType()),
        T.StructField("time", T.TimestampType()),
    ]
)

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def _rows():
    rows = []
    # session 1: 5 soundings 2s apart (gap 10s holds them together)
    for i in range(5):
        rows.append(("g1", 4, "a", T0 + dt.timedelta(seconds=2 * i)))
    # 30s silence -> session 2, same key
    for i in range(3):
        rows.append(("g1", 4, "a", T0 + dt.timedelta(seconds=40 + 2 * i)))
    # different target interleaved in time: separate key, own session
    rows.append(("g1", 4, "b", T0 + dt.timedelta(seconds=3)))
    return rows


def test_batch_semantics(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    out = sessionize_stream(df).collect()
    by_key = {}
    for r in out:
        by_key.setdefault((r.granule, r.operation_mode, r.target_id), []).append(r)
    a_sessions = sorted(by_key[("g1", 4, "a")], key=lambda r: r.session_start)
    assert [r.n_soundings for r in a_sessions] == [5, 3]
    assert a_sessions[0].first_seen == T0
    assert a_sessions[1].first_seen == T0 + dt.timedelta(seconds=40)
    assert by_key[("g1", 4, "b")][0].n_soundings == 1


def test_streaming_micro_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(_rows(), SCHEMA).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    regions = sessionize_stream(stream, watermark="5 seconds")
    q = (
        regions.writeStream.format("memory")
        .queryName("regions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from regions_out").collect()
    # watermark passed the first session's close -> it must have been emitted
    a = [r for r in got if r.target_id == "a"]
    assert any(r.n_soundings == 5 for r in a)
