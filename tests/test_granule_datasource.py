"""Python DataSource V2 granule source (sources/granule_datasource.py):
spark.read.format('granule') with schema inference, per-file partitions,
decoder-level projection, and absorbed filter pushdown — result-checked
against the mapInPandas reader on the same files."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oco3_data_transformer_spark.sources import granules as G
from oco3_data_transformer_spark.sources.granule_datasource import GranuleDataSource


def _write_granule(path, n=10, seed=1):
    rng = np.random.default_rng(seed)
    xco2 = rng.normal(400, 1, n)
    xco2[0] = G.FILL_VALUE_DEFAULT
    np.savez(
        path,
        sounding_idx=np.arange(n, dtype=np.int64),
        operation_mode=rng.choice([0, 2, 4], n).astype(np.int8),
        xco2=xco2,
        vertex_latitude=rng.normal(10, 0.1, (n, 4)).astype(np.float32),
    )


SCHEMA = T.StructType(
    [
        T.StructField("granule", T.StringType()),
        T.StructField("sounding_idx", T.LongType()),
        T.StructField("operation_mode", T.ByteType()),
        T.StructField("xco2", T.DoubleType()),
        T.StructField("vertex_latitude", T.ArrayType(T.FloatType())),
    ]
)


@pytest.fixture()
def granule_dir(spark, tmp_path):
    # runtime conf: the session may predate the session.py default
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(GranuleDataSource)
    _write_granule(tmp_path / "g1.npz", n=10, seed=1)
    _write_granule(tmp_path / "g2.npz", n=7, seed=2)
    return str(tmp_path)


def test_datasource_matches_mapinpandas_reader(spark, granule_dir):
    via_ds = (
        spark.read.format("granule")
        .schema(SCHEMA)
        .load(f"{granule_dir}/*.npz")
    )
    via_mp = G.read_granules(spark, f"{granule_dir}/*.npz", SCHEMA)
    canon = lambda df: sorted(
        (r["granule"], r["sounding_idx"], r["operation_mode"],
         None if r["xco2"] is None else round(r["xco2"], 9),
         tuple(round(float(v), 5) for v in r["vertex_latitude"]))
        for r in df.collect()
    )
    assert canon(via_ds) == canon(via_mp)
    assert via_ds.count() == 17


def test_datasource_reads_hdf5_granules(spark, tmp_path):
    """granule_format=nc4 through the DataSource V2 path: the new
    pure-numpy HDF5 reader composes with per-file partitioning and
    decoder-level projection exactly like npz."""
    from oco3_data_transformer_spark.sources import hdf5lite as H

    spark.dataSource.register(GranuleDataSource)
    rng = np.random.default_rng(5)
    xco2 = rng.normal(400, 1, 12)
    xco2[3] = -999999.0
    blob = H.write_hdf5(
        {"sounding_idx": np.arange(12, dtype=np.int64), "xco2": xco2},
        {"xco2": {"_FillValue": -999999.0}},
        chunk_rows=5, compress=True,
    )
    (tmp_path / "g1.nc4").write_bytes(blob)
    schema = T.StructType(
        [
            T.StructField("granule", T.StringType()),
            T.StructField("sounding_idx", T.LongType()),
            T.StructField("xco2", T.DoubleType()),
        ]
    )
    df = (
        spark.read.format("granule")
        .schema(schema)
        .option("granule_format", "nc4")
        .load(f"{tmp_path}/*.nc4")
    )
    rows = {r.sounding_idx: r.xco2 for r in df.collect()}
    assert len(rows) == 12 and rows[3] is None  # fill -> NaN -> null
    assert abs(rows[0] - xco2[0]) < 1e-9


def test_schema_inference(spark, granule_dir):
    df = spark.read.format("granule").load(f"{granule_dir}/*.npz")
    got = {f.name: f.dataType for f in df.schema.fields}
    assert got["sounding_idx"] == T.LongType()
    assert got["operation_mode"] == T.ByteType()
    assert got["xco2"] == T.DoubleType()
    assert got["vertex_latitude"] == T.ArrayType(T.FloatType())
    assert df.count() == 17


def test_filter_pushdown_absorbed_and_correct(spark, granule_dir):
    df = (
        spark.read.format("granule")
        .schema(SCHEMA)
        .load(f"{granule_dir}/*.npz")
        .filter((F.col("operation_mode") == 4) & (F.col("xco2") > 399.0))
    )
    rows = df.collect()
    assert all(r["operation_mode"] == 4 and r["xco2"] > 399.0 for r in rows)
    # same predicate via the plain reader agrees
    want = (
        G.read_granules(spark, f"{granule_dir}/*.npz", SCHEMA)
        .filter((F.col("operation_mode") == 4) & (F.col("xco2") > 399.0))
        .count()
    )
    assert len(rows) == want > 0
    # pushFilters absorbed both comparisons (reader state is the contract;
    # the Python DS plan does not print a PushedFilters line)
    reader = GranuleDataSource({"path": f"{granule_dir}/*.npz"}).reader(SCHEMA)
    from pyspark.sql.datasource import EqualTo, GreaterThan

    leftover = list(
        reader.pushFilters(
            [EqualTo(("operation_mode",), 4), GreaterThan(("xco2",), 399.0)]
        )
    )
    assert leftover == [] and len(reader.pushed) == 2


def test_one_partition_per_granule(spark, granule_dir):
    reader = GranuleDataSource(
        {"path": f"{granule_dir}/*.npz"}
    ).reader(SCHEMA)
    assert [p.path.rsplit("/", 1)[-1] for p in reader.partitions()] == [
        "g1.npz",
        "g2.npz",
    ]


def test_streaming_granule_source(spark, tmp_path):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(GranuleDataSource)
    drop = tmp_path / "drop"
    drop.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write_granule(drop / "g1.npz", n=10, seed=1)

    def run_once():
        q = (
            spark.readStream.format("granule")
            .schema(SCHEMA)
            .load(f"{drop}/*.npz")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(out).count() == 10
    # second drop: only the NEW granule is delivered (offset = seen files)
    _write_granule(drop / "g2.npz", n=7, seed=2)
    run_once()
    df = spark.read.parquet(out)
    assert df.count() == 17
    assert df.filter(F.col("granule") == "g2.npz").count() == 7
    # re-running with no new files delivers nothing
    run_once()
    assert spark.read.parquet(out).count() == 17


def test_write_read_roundtrip(spark, granule_dir, tmp_path):
    out = str(tmp_path / "written")
    src = (
        spark.read.format("granule").schema(SCHEMA).load(f"{granule_dir}/*.npz")
    )
    # one task per granule so each npz is written whole
    src.repartition(2, "granule").write.format("granule").mode("overwrite").save(out)

    import os

    assert sorted(os.listdir(out)) == ["_SUCCESS", "g1.npz", "g2.npz"]
    manifest = open(os.path.join(out, "_SUCCESS")).read().splitlines()
    assert manifest == ["g1.npz", "g2.npz"]

    back = spark.read.format("granule").schema(SCHEMA).load(f"{out}/*.npz")
    canon = lambda df: sorted(
        (r["granule"], r["sounding_idx"], r["operation_mode"],
         None if r["xco2"] is None else round(r["xco2"], 9),
         tuple(round(float(v), 5) for v in r["vertex_latitude"]))
        for r in df.collect()
    )
    assert canon(back) == canon(src)
    # dtype fidelity survives the round trip (byte stays int8 in the file)
    z = np.load(os.path.join(out, "g1.npz"))
    assert z["operation_mode"].dtype == np.int8
    assert z["vertex_latitude"].dtype == np.float32
    assert (z["xco2"] == G.FILL_VALUE_DEFAULT).sum() == 1  # NaN re-encoded


def test_stream_writer_end_to_end(spark, tmp_path):
    """parquet file-drop -> writeStream.format('granule'): npz granules
    appear per micro-batch with a batch manifest; the written files read
    back exactly through the batch reader."""
    import json
    import os

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(GranuleDataSource)
    src = str(tmp_path / "src")
    out = str(tmp_path / "npz_out")
    ckpt = str(tmp_path / "ckpt")

    def drop_and_run(granule_name, n, seed):
        import pandas as pd

        rng = np.random.default_rng(seed)
        pdf = pd.DataFrame(
            {
                "granule": granule_name,
                "sounding_idx": np.arange(n, dtype=np.int64),
                "operation_mode": rng.choice([0, 2, 4], n).astype(np.int8),
                "xco2": rng.normal(400, 1, n),
                "vertex_latitude": list(
                    rng.normal(10, 0.1, (n, 4)).astype(np.float32)
                ),
            }
        )
        spark.createDataFrame(pdf, SCHEMA).coalesce(1).write.mode("append").parquet(src)
        q = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .repartition(1, "granule")
            .writeStream.format("granule")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drop_and_run("s1.npz", 6, 1)
    drop_and_run("s2.npz", 4, 2)
    assert sorted(f for f in os.listdir(out) if f.endswith(".npz")) == [
        "s1.npz",
        "s2.npz",
    ]
    batches = [json.loads(l) for l in open(os.path.join(out, "_batches"))]
    assert {b["batch"] for b in batches} == {0, 1}
    assert sorted(sum((b["files"] for b in batches), [])) == ["s1.npz", "s2.npz"]
    back = spark.read.format("granule").schema(SCHEMA).load(f"{out}/*.npz")
    assert back.count() == 10
    assert back.filter(F.col("granule") == "s2.npz").count() == 4


def test_stream_writer_crash_recovery_matches_uninterrupted(spark, tmp_path):
    """End-to-end crash recovery (the reference's ack/requeue taxonomy,
    ref main.py:715-735): kill the stream between sink write and
    checkpoint commit — simulated exactly by deleting the newest
    checkpoint commit marker, which is the state a real crash leaves —
    restart from the checkpoint, and require the recovered store state to
    be IDENTICAL to an uninterrupted run: same granule files, same array
    contents, manifest covering the same file set with no duplicate or
    contradictory batch lines."""
    import json
    import os

    import pandas as pd

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(GranuleDataSource)

    def pdf_for(granule_name, n, seed):
        rng = np.random.default_rng(seed)
        return pd.DataFrame(
            {
                "granule": granule_name,
                "sounding_idx": np.arange(n, dtype=np.int64),
                "operation_mode": rng.choice([0, 2, 4], n).astype(np.int8),
                "xco2": rng.normal(400, 1, n),
                "vertex_latitude": list(rng.normal(10, 0.1, (n, 4)).astype(np.float32)),
            }
        )

    GRANULES = [("g1.npz", 5, 1), ("g2.npz", 7, 2), ("g3.npz", 4, 3), ("g4.npz", 6, 4)]

    def drop(src, spec):
        spark.createDataFrame(pdf_for(*spec), SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run(src, out, ckpt):
        q = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .repartition(1, "granule")
            .writeStream.format("granule")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        # MUST be fully terminated before the restart below reuses the
        # checkpoint — a timed-out-but-active query makes Spark reject
        # the second run as concurrent usage (seen under full-suite load)
        try:
            assert q.awaitTermination(300), "stream did not terminate in 300s"
        finally:
            if q.isActive:
                q.stop()

    def store_state(out):
        files = sorted(f for f in os.listdir(out) if f.endswith(".npz"))
        arrays = {
            f: {k: v.tolist() for k, v in np.load(os.path.join(out, f)).items()}
            for f in files
        }
        manifest = [json.loads(ln) for ln in open(os.path.join(out, "_batches"))]
        return files, arrays, manifest

    # --- uninterrupted reference run: all four granules, one invocation
    src_a, out_a, ckpt_a = (str(tmp_path / d) for d in ("srcA", "outA", "ckptA"))
    for spec in GRANULES:
        drop(src_a, spec)
    run(src_a, out_a, ckpt_a)

    # --- crashy run: two granules, then a crash between sink write and
    # checkpoint commit (offset written, commit marker missing), then the
    # remaining granules on restart from the same checkpoint
    src_b, out_b, ckpt_b = (str(tmp_path / d) for d in ("srcB", "outB", "ckptB"))
    for spec in GRANULES[:2]:
        drop(src_b, spec)
    run(src_b, out_b, ckpt_b)
    commits = sorted(
        f for f in os.listdir(os.path.join(ckpt_b, "commits")) if not f.startswith(".")
    )
    os.remove(os.path.join(ckpt_b, "commits", commits[-1]))  # the "crash"
    # the local ChecksumFs pairs every log file with a hidden .crc — a real
    # crash loses both (the commit write renames them together), so the
    # simulation must too or the replayed commit's rename hits the stale crc
    crc = os.path.join(ckpt_b, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    for spec in GRANULES[2:]:
        drop(src_b, spec)
    run(src_b, out_b, ckpt_b)  # restart: replays the uncommitted batch first

    files_a, arrays_a, manifest_a = store_state(out_a)
    files_b, arrays_b, manifest_b = store_state(out_b)
    assert files_b == files_a == [g for g, _, _ in GRANULES]
    assert arrays_b == arrays_a  # byte-identical recovered contents
    # manifest: one line per batch id, and the union of files matches the
    # uninterrupted run's (the replayed batch overwrote its line, not
    # appended a contradictory one)
    ids_b = [m["batch"] for m in manifest_b]
    assert len(ids_b) == len(set(ids_b))
    assert sorted(sum((m["files"] for m in manifest_b), [])) == sorted(
        sum((m["files"] for m in manifest_a), [])
    )
