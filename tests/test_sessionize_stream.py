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


SIF_SCHEMA = T.StructType(
    [
        T.StructField("granule", T.StringType()),
        T.StructField("sounding_idx", T.LongType()),
        T.StructField("target_id", T.StringType()),
    ]
)


def _sif_rows():
    """Index-run shape exercising the none-adoption fold:
    idx 0-2 'a'; 3-4 'none' (adopts 'a'); 5-6 'a' (chains);
    gap to 12-13 'b'; 14 'none' (adopts 'b'); big gap; 30-31 'none' only."""
    seq = (
        [("g1", i, "a") for i in range(3)]
        + [("g1", i, "none") for i in (3, 4)]
        + [("g1", i, "a") for i in (5, 6)]
        + [("g1", i, "b") for i in (12, 13)]
        + [("g1", 14, "none")]
        + [("g1", i, "none") for i in (30, 31)]
    )
    return seq


EXPECTED_SIF_REGIONS = [
    ("g1", "a", 0, 7, 7),      # 0-6 incl. adopted nones
    ("g1", "b", 12, 15, 3),    # 12-14 incl. trailing none
    ("g1", "none", 30, 32, 2), # all-none run stays none
]


def test_sif_stateful_stream_matches_fold(spark, tmp_path):
    from oco3_data_transformer_spark.streaming.sessionize_stream import (
        sessionize_stream_sif,
    )

    src = str(tmp_path / "src")
    rows = _sif_rows()
    # two micro-batch files splitting MID-RUN (idx 5 continues batch 1's run)
    import time as _time

    spark.createDataFrame(rows[:5], SIF_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _time.sleep(1.1)  # distinct mtimes -> deterministic arrival order
    spark.createDataFrame(rows[5:], SIF_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = spark.readStream.schema(SIF_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = sessionize_stream_sif(stream, margin=2, timeout_ms=1500)
    q = (
        out.writeStream.format("memory")
        .queryName("sif_regions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        import time

        # wait past the processing-time timeout so the tail run flushes
        deadline = time.time() + 90
        while time.time() < deadline:
            got = spark.sql("SELECT * FROM sif_regions").collect()
            if len(got) >= len(EXPECTED_SIF_REGIONS):
                break
            time.sleep(2)
    finally:
        q.stop()
    got_t = sorted(
        (r.granule, r.target_id, r.start_idx, r.stop_excl, r.n_rows) for r in got
    )
    assert got_t == sorted(EXPECTED_SIF_REGIONS)


def test_sif_stream_equals_batch_on_random_sequences(spark, tmp_path):
    """Randomized batch-vs-stream equivalence: the applyInPandasWithState
    fold must produce the same region table as the batch span/fill/fold
    pipeline (detect_regions) on arbitrary index walks with 'none' ids and
    gaps, across arbitrary micro-batch splits."""
    import random

    from oco3_data_transformer_spark.operators.sessionize import detect_regions
    from oco3_data_transformer_spark.streaming.sessionize_stream import (
        sessionize_stream_sif,
    )

    rng = random.Random(20240813)
    rows = []
    for g in range(6):
        idx = 0
        for _ in range(rng.randint(4, 25)):
            rows.append((f"g{g}", idx, rng.choice(["a", "b", "none"])))
            idx += rng.choice([1, 1, 1, 2, 3, 4])  # mostly dense, some gaps

    # batch authority: the span/ffill/fold pipeline (mode-pass trivial)
    bdf = spark.createDataFrame(rows, SIF_SCHEMA).withColumn("m", F.lit(1))
    batch = detect_regions(
        bdf, ["granule"], "sounding_idx", "m", 1, "target_id",
        margin=2, merge_inclusive=True, none_id="none",
    )
    expect = sorted(
        (r.granule, r.target_id, r.start_idx, r.stop_excl, r.n_mode_rows)
        for r in batch.collect()
    )

    # stream: 3 micro-batch files; the operator contract requires each
    # granule's soundings to arrive in INDEX ORDER across batches (the
    # reference's queue delivers granules sequentially), so each file takes
    # a per-granule prefix slice at a random cut — order preserved, cuts
    # landing mid-run
    src = str(tmp_path / "src")
    by_g: dict = {}
    for r in rows:
        by_g.setdefault(r[0], []).append(r)
    # every granule gets rows in EVERY part: a granule quiet for a whole
    # micro-batch can hit the processing-time timeout mid-stream, which
    # correctly closes its tail run early - valid operator behavior, but
    # not the batch-equivalence scenario under test
    parts = [[], [], []]
    for g, grows in by_g.items():
        c1 = rng.randint(1, len(grows) - 2)
        c2 = rng.randint(c1 + 1, len(grows) - 1)
        parts[0] += grows[:c1]
        parts[1] += grows[c1:c2]
        parts[2] += grows[c2:]
    import time as _time

    for part in parts:
        if part:
            spark.createDataFrame(part, SIF_SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            # FileStreamSource orders files by modification time; same-ms
            # writes would arrive in arbitrary order and violate the
            # operator's per-granule arrival-order contract
            _time.sleep(1.1)

    stream = spark.readStream.schema(SIF_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = sessionize_stream_sif(stream, margin=2, timeout_ms=1500)
    q = (
        out.writeStream.format("memory")
        .queryName("sif_rand")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        import time

        deadline = time.time() + 120
        got = []
        while time.time() < deadline:
            got = spark.sql("SELECT * FROM sif_rand").collect()
            if len(got) >= len(expect):
                break
            time.sleep(2)
    finally:
        q.stop()
    got_t = sorted(
        (r.granule, r.target_id, r.start_idx, r.stop_excl, r.n_rows) for r in got
    )
    assert got_t == expect
