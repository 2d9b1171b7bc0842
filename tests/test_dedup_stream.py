"""Streaming exact dedup (streaming/dedup_stream.py): first-seen-wins over
a file-drop document stream, unbounded-state and watermarked variants,
checked against the batch exact_dedup result on the same data."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oco3_data_transformer_spark.operators import dedup as dedup_ops
from oco3_data_transformer_spark.streaming import dedup_stream

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

T0 = dt.datetime(2024, 1, 1)


def _rows(spec):
    """spec: list of (doc_id, text, minutes_after_t0)."""
    return [(i, t, T0 + dt.timedelta(minutes=m)) for i, t, m in spec]


def _drive(spark, tmp_path, batches, dedup_fn, name):
    src = str(tmp_path / f"{name}-src")
    out = str(tmp_path / f"{name}-out")
    ckpt = str(tmp_path / f"{name}-ckpt")
    collected = []
    for batch in batches:
        spark.createDataFrame(_rows(batch), DOC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(DOC_SCHEMA).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = (
            dedup_fn(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    return spark.read.parquet(out)


def test_stream_dedup_matches_batch(spark, tmp_path):
    b1 = [(1, "alpha", 0), (2, "beta", 1), (3, "alpha", 2)]
    b2 = [(4, "alpha", 3), (5, "gamma", 4), (6, "beta", 5)]
    got = _drive(
        spark, tmp_path, [b1, b2],
        lambda s: dedup_stream.streaming_exact_dedup(s, "text"),
        "unbounded",
    )
    # one survivor per distinct text, across batch boundaries
    texts = [r["text"] for r in got.collect()]
    assert sorted(texts) == ["alpha", "beta", "gamma"]
    # matches the batch operator's group count on the union of all rows
    batch = dedup_ops.exact_dedup(
        spark.createDataFrame(_rows(b1 + b2), DOC_SCHEMA), "doc_id", "text"
    )
    assert batch.count() == got.count()
    # dedup state persists across restarts via the checkpoint: a third batch
    # of already-seen texts emits nothing
    got2 = _drive(
        spark, tmp_path, [[(7, "alpha", 6), (8, "gamma", 7)]],
        lambda s: dedup_stream.streaming_exact_dedup(s, "text"),
        "unbounded",
    )
    assert got2.count() == 3


def test_watermarked_dedup_suppresses_near_dupes_only(spark, tmp_path):
    # duplicate arriving 5 min after the original: inside the 30 min
    # watermark -> suppressed. The watermark variant trades completeness
    # for bounded state; in-window behavior must match the exact variant.
    b1 = [(1, "alpha", 0), (2, "beta", 1)]
    b2 = [(3, "alpha", 5), (4, "gamma", 6)]
    got = _drive(
        spark, tmp_path, [b1, b2],
        lambda s: dedup_stream.streaming_exact_dedup_within_watermark(
            s, "text", "ts", "30 minutes"
        ),
        "watermarked",
    )
    texts = sorted(r["text"] for r in got.collect())
    assert texts == ["alpha", "beta", "gamma"]


def test_digest_column_matches_batch_key(spark):
    df = spark.createDataFrame(_rows([(1, "alpha", 0)]), DOC_SCHEMA)
    dig = dedup_stream.with_digest(df, "text").select("digest").first()[0]
    batch_dig = (
        dedup_ops.exact_dedup(df, "doc_id", "text").select("digest").first()[0]
    )
    assert dig == batch_dig


def test_admission_sink_across_batches(spark, tmp_path):
    index_path = str(tmp_path / "index")
    verdict_path = str(tmp_path / "verdicts")
    handle = dedup_stream.admission_sink(
        index_path, "doc_id", "text", n=3, threshold=0.5, verdict_path=verdict_path
    )

    b0 = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely different text about spark parquet files here"),
            (3, "the quick brown fox jumps over the lazy dog today"),  # in-batch dup
        ],
        ["doc_id", "text"],
    )
    handle(b0, 0)
    # in-batch duplicate collapsed (keep min id), both survivors admitted
    assert sorted(
        r.doc_id for r in spark.read.parquet(index_path).collect()
    ) == [1, 2]

    b1 = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog today"),  # exact
            (11, "the quick brown fox jumps over the lazy cat today"),  # near
            (12, "fresh unseen content with no overlap whatsoever at all"),
        ],
        ["doc_id", "text"],
    )
    handle(b1, 1)
    assert sorted(
        r.doc_id for r in spark.read.parquet(index_path).collect()
    ) == [1, 2, 12]
    verdicts = {
        r.id: r.verdict
        for r in spark.read.parquet(verdict_path).filter(F.col("batch_id") == 1).collect()
    }
    assert verdicts == {10: "exact_dup", 11: "near_dup", 12: "new"}


def test_admission_sink_replay_converges(spark, tmp_path):
    index_path = str(tmp_path / "index")
    handle = dedup_stream.admission_sink(index_path, "doc_id", "text")
    b = spark.createDataFrame(
        [(1, "some brand new document text appearing for the first time")],
        ["doc_id", "text"],
    )
    handle(b, 0)
    once = sorted(map(tuple, spark.read.parquet(index_path).collect()))
    handle(b, 0)  # at-least-once redelivery
    assert sorted(map(tuple, spark.read.parquet(index_path).collect())) == once


def test_admission_sink_end_to_end_stream(spark, tmp_path):
    """Full Structured Streaming path: file-drop source ->
    writeStream.foreachBatch(admission_sink) with a checkpoint, two
    triggers — the index admits exactly the batch-deduped new docs and
    verdicts match the handler-driven tests' semantics."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    index_path = str(tmp_path / "index")
    verdict_path = str(tmp_path / "verdicts")
    schema = "doc_id long, text string"

    def run_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(
                dedup_stream.admission_sink(
                    index_path, "doc_id", "text", verdict_path=verdict_path
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog today"),  # in-batch dup
        ]
    )
    run_batch(
        [
            (10, "the quick brown fox jumps over the lazy dog today"),  # exact dup
            (11, "fresh unseen content with no overlap whatsoever at all"),
        ]
    )
    assert sorted(r.doc_id for r in spark.read.parquet(index_path).collect()) == [1, 11]
    verdicts = {
        (r.batch_id, r.id): r.verdict
        for r in dedup_stream.read_verdicts(spark, verdict_path).collect()
    }
    assert verdicts == {(0, 1): "new", (1, 10): "exact_dup", (1, 11): "new"}


def test_read_verdicts_collapses_replay_demotion(spark, tmp_path):
    """Replay AFTER the index append re-records the batch as exact_dup;
    read_verdicts must keep the earlier 'new' truth per (batch_id, id)."""
    index_path = str(tmp_path / "index")
    verdict_path = str(tmp_path / "verdicts")
    handle = dedup_stream.admission_sink(
        index_path, "doc_id", "text", verdict_path=verdict_path
    )
    b = spark.createDataFrame(
        [(1, "a never before seen document body for the replay test case")],
        ["doc_id", "text"],
    )
    handle(b, 0)
    handle(b, 0)  # full replay: doc is now in the index -> demoting row
    raw = spark.read.parquet(verdict_path)
    assert raw.count() == 2  # at-least-once log really is duplicated
    assert {r.verdict for r in raw.collect()} == {"new", "exact_dup"}
    got = dedup_stream.read_verdicts(spark, verdict_path).collect()
    assert len(got) == 1
    assert got[0].verdict == "new"


def test_admission_sink_raises_on_unreadable_index(spark, tmp_path):
    """An EXISTING-but-corrupt index must fail the batch (stream retries),
    never silently classify the whole batch as 'new'."""
    index_path = tmp_path / "index"
    index_path.mkdir()
    (index_path / "part-00000.parquet").write_bytes(b"not a parquet file")
    handle = dedup_stream.admission_sink(str(index_path), "doc_id", "text")
    b = spark.createDataFrame([(1, "some text")], ["doc_id", "text"])
    with pytest.raises(Exception):
        handle(b, 0)
