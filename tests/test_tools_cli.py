"""CLI tool surface (tools.py): climatology / checksum / verify / repair /
sync subcommands over a real store."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from oco3_data_transformer_spark import tools
from oco3_data_transformer_spark.schemas import STORE_SLICE
from oco3_data_transformer_spark.sinks import store

D1 = dt.datetime(2024, 3, 1)
D2 = dt.datetime(2024, 4, 2)


@pytest.fixture()
def filled_store(spark, tmp_path):
    path = str(tmp_path / "store")
    rows = [
        ("oco3", "t1", "post", d, i, i, "xco2", float(v))
        for d, vals in ((D1, [1, 2, 3]), (D2, [5, 6]))
        for i, v in enumerate(vals)
    ]
    store.append(spark, spark.createDataFrame(rows, STORE_SLICE), path)
    return path


def test_climatology_cli(spark, filled_store, tmp_path, capsys):
    out = str(tmp_path / "clim")
    rc = tools.main(["climatology", filled_store, out, "--span", "monthly"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    spans = spark.read.parquet(out)
    assert rep["spans_written"] == spans.count()
    months = {r.span.month for r in spans.select("span").distinct().collect()}
    assert months == {3, 4}


def test_checksum_verify_repair_cli(spark, filled_store, capsys):
    assert tools.main(["checksum", filled_store]) == 0
    d1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["digest"]
    assert len(d1) == 32

    assert tools.main(["verify", filled_store]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["duplicate_keys"] == 0 and rep["rows"] == 5

    assert tools.main(["repair", filled_store]) == 0


def test_export_zarr_cli(spark, filled_store, tmp_path, capsys):
    from oco3_data_transformer_spark.sinks import zarrlite

    out = str(tmp_path / "out.zarr")
    rc = tools.main([
        "export-zarr", filled_store, out,
        "--mission", "oco3", "--target", "t1", "--qf", "post",
        "--lat-res", "4", "--lon-res", "4", "--chunk-t", "1",
        "--bbox=-2,-2,2,2",
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["shape"] == [2, 4, 4] and rep["variables"] == ["xco2"]
    arr, attrs = zarrlite.read_array(out, "xco2")
    assert attrs["_ARRAY_DIMENSIONS"] == ["time", "lat", "lon"]
    # D1 diagonal 1,2,3; D2 diagonal 5,6; everything else fill
    assert [arr[0, i, i] for i in range(3)] == [1.0, 2.0, 3.0]
    assert [arr[1, i, i] for i in range(2)] == [5.0, 6.0]
    ga = zarrlite.group_attrs(out)
    assert ga["coverage_start"].startswith("2024-03-01")


def test_append_and_verify_zarr_cli(spark, filled_store, tmp_path, capsys):
    out = str(tmp_path / "out.zarr")
    assert tools.main([
        "export-zarr", filled_store, out,
        "--mission", "oco3", "--target", "t1", "--qf", "post",
        "--lat-res", "4", "--lon-res", "4", "--chunk-t", "4",
        "--bbox=-2,-2,2,2",
    ]) == 0
    capsys.readouterr()
    # later day appended from a parquet of store rows
    later = str(tmp_path / "later.parquet")
    rows = [("oco3", "t1", "post", dt.datetime(2024, 5, 1), 0, 0, "xco2", 9.0)]
    spark.createDataFrame(rows, STORE_SLICE).write.parquet(later)
    assert tools.main(["append-zarr", later, out]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_appended"] == 1 and not rep["rewritten"]
    assert tools.main(["verify-zarr", out]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["ok"] and rep["n_days"] == 3


def test_compact_cli(spark, filled_store, capsys):
    assert tools.main(["compact", filled_store]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "partitions_rewritten" in rep


def test_sync_cli(spark, tmp_path, capsys):
    local = str(tmp_path / "local")
    remote = str(tmp_path / "remote")
    spark.createDataFrame(
        [("a", 10, 100), ("b", 20, 100), ("c", 30, 100)], "key string, size long, mtime long"
    ).write.parquet(local)
    spark.createDataFrame(
        [("b", 20, 100), ("c", 25, 90), ("d", 40, 100)], "key string, size long, mtime long"
    ).write.parquet(remote)
    rc = tools.main(["sync", local, remote, "--plan-output", str(tmp_path / "plan")])
    assert rc == 0
    counts = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert counts == {"upload_new": 1, "unchanged": 1, "upload_changed": 1, "delete_orphan": 1}


def test_corpus_prep_cli(spark, tmp_path, capsys):
    # corpus with byte-identical dupes, a near-dup pair, and a too-short doc
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base), (2, base), (3, base),            # exact dupes of each other
        (4, base + " extra"),                        # near-dup of the canonical
        (5, "short text"),                           # fails the 5-token floor
        (6, "a completely different document about spark shuffles and joins"),
    ]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    out = str(tmp_path / "packed")
    rc = tools.main([
        "corpus-prep", src, out, "--min-tokens", "5",
        "--capacity", "30", "--shards", "2",
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_input"] == 6
    assert rep["n_after_exact"] == 4          # 2,3 collapsed into 1
    assert rep["n_after_neardup"] == 3        # 4 collapsed into 1
    assert rep["n_after_quality"] == 2        # 5 dropped
    assert sum(rep["split_counts"].values()) == 2
    packed = spark.read.parquet(out)
    assert packed.count() == 2
    assert {f.name for f in packed.schema.fields} >= {
        "doc_id", "n_tok", "shard", "bin", "fill_after", "split"
    }
