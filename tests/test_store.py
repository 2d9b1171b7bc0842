"""Store sink (S6/S7/S10/S12) tests: idempotent append, upsert-repair,
verify/repair invariants, coverage, checksum stability."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from oco3_data_transformer_spark.schemas import STORE_SLICE
from oco3_data_transformer_spark.sinks import store

D1 = dt.datetime(2024, 3, 1)
D2 = dt.datetime(2024, 3, 2)


def _slices(spark, day, values, target="t1", qf="pre"):
    rows = [
        ("oco3", target, qf, day, i, i, "xco2", float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, STORE_SLICE)


def test_append_then_idempotent_reappend(spark, tmp_path):
    path = str(tmp_path / "store")
    n1 = store.append(spark, _slices(spark, D1, [1, 2, 3]), path)
    assert n1 == 3
    # identical batch again: nothing new (keep-first duplicate semantics)
    n2 = store.append(spark, _slices(spark, D1, [9, 9, 9]).withColumn(
        "value", F.lit(9.0)
    ), path)
    assert n2 == 0
    df = spark.read.parquet(path)
    assert df.count() == 3
    assert {r.value for r in df.collect()} == {1.0, 2.0, 3.0}  # first write won


def test_append_new_day_and_verify(spark, tmp_path):
    path = str(tmp_path / "store")
    store.append(spark, _slices(spark, D1, [1, 2]), path)
    store.append(spark, _slices(spark, D2, [5]), path)
    rep = store.verify(spark, path)
    assert rep["duplicate_keys"] == 0
    assert rep["rows"] == 3
    assert rep["coverage_start"] == D1 and rep["coverage_end"] == D2


def test_upsert_replaces_partition(spark, tmp_path):
    path = str(tmp_path / "store")
    store.append(spark, _slices(spark, D1, [1, 2, 3]), path)
    # late-data repair: same day arrives reprocessed with 2 cells only
    store.upsert(spark, _slices(spark, D1, [7, 8]), path)
    df = spark.read.parquet(path)
    assert df.count() == 2
    assert {r.value for r in df.collect()} == {7.0, 8.0}


def test_merge_keeps_unreplaced_rows_of_touched_partition(spark, tmp_path):
    path = str(tmp_path / "store")
    store.append(spark, _slices(spark, D1, [1, 2, 3]), path)      # cells 0,1,2
    store.append(spark, _slices(spark, D2, [6]), path)
    # late granule re-delivers only cell 1 of day 1 with a new value
    late = _slices(spark, D1, [0, 99]).filter(F.col("lat_idx") == 1)
    store.merge(spark, late, path)
    df = spark.read.parquet(path)
    day1 = {(r.lat_idx, r.value) for r in df.filter(F.to_date("time") == D1.date()).collect()}
    # cell 1 replaced, cells 0 and 2 kept (upsert would have wiped them)
    assert day1 == {(0, 1.0), (1, 99.0), (2, 3.0)}
    assert df.count() == 4  # untouched day 2 intact


def test_repair_removes_duplicates(spark, tmp_path):
    path = str(tmp_path / "store")
    # write duplicates directly (bypassing append's guard)
    bad = _slices(spark, D1, [1, 2]).unionAll(_slices(spark, D1, [1, 2]))
    bad.withColumn("day", F.to_date("time")).write.partitionBy(
        "mission", "qf", "day"
    ).parquet(path)
    assert store.verify(spark, path)["duplicate_keys"] == 2
    store.repair(spark, path)
    rep = store.verify(spark, path)
    assert rep["duplicate_keys"] == 0 and rep["rows"] == 2


def test_repair_keep_first_null_values_last(spark, tmp_path):
    """The repair dedup keeps the MIN value with NULLs LAST (a NULL must
    never win over a real measurement). The min_by rewrite encodes
    asc_nulls_last as ordering key (value IS NULL, value) — this pins
    that encoding against a duplicate set where one copy is NULL."""
    path = str(tmp_path / "store")
    good = _slices(spark, D1, [5.0])
    nulled = good.withColumn("value", F.lit(None).cast("double"))
    bad = good.unionAll(nulled).unionAll(_slices(spark, D1, [7.0]))
    bad.withColumn("day", F.to_date("time")).write.partitionBy(
        "mission", "qf", "day"
    ).parquet(path)
    store.repair(spark, path)
    rows = spark.read.parquet(path).collect()
    assert len(rows) == 1 and rows[0].value == 5.0  # min real value, not NULL


def test_time_range_reads_prune_day_partitions(spark, tmp_path):
    # the F8 scale claim: a day filter on the store must become a partition
    # filter on the (mission, qf, day) layout — asserted on the plan, not
    # just documented
    path = str(tmp_path / "store")
    store.append(spark, _slices(spark, D1, [1, 2]), path)
    store.append(spark, _slices(spark, D2, [3]), path)
    df = spark.read.parquet(path).filter(F.col("day") == D2.date())
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "day" in plan.split("PartitionFilters", 1)[1][:200]
    assert df.count() == 1  # only day-2 files were read


def test_join_driven_dynamic_partition_pruning(spark, tmp_path):
    """The 100 TB star-join property: when the day predicate arrives via a
    JOIN against a small dimension (not a literal filter), the store scan
    must still prune partitions — Catalyst's dynamic partition pruning
    injects the dim's day set as a runtime subquery partition filter.
    Without DPP a days-dimension join scans every day of a 100 TB store."""
    path = str(tmp_path / "store")
    store.append(spark, _slices(spark, D1, [1, 2]), path)
    store.append(spark, _slices(spark, D2, [3]), path)
    fact = spark.read.parquet(path)
    days = spark.createDataFrame(
        [(D2.date(), "keep")], "day date, tag string"
    ).filter(F.col("tag") == "keep")
    joined = fact.join(days, "day")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters", 1)
    assert len(pf) == 2 and "dynamicpruning" in pf[1][:400]
    assert joined.count() == 1  # only day-2 files were read


def test_write_read_attrs_roundtrip(spark, tmp_path):
    path = str(tmp_path / "store")
    store.append(spark, _slices(spark, D1, [1, 2]), path)
    store.append(spark, _slices(spark, D2, [5]), path)
    written = store.write_attrs(spark, path, {"title_pre_qf": "Pre QF"})
    got = store.read_attrs(spark, path)
    assert got == written
    assert got["coverage_start"].startswith("2024-03-01")
    assert got["coverage_end"].startswith("2024-03-02")
    assert got["title_pre_qf"] == "Pre QF"
    # the underscore-prefixed sidecar must not pollute the table read
    assert spark.read.parquet(path).count() == 3
    assert store.read_attrs(spark, str(tmp_path / "nope")) is None


def test_compact_merges_small_files_and_preserves_data(spark, tmp_path):
    path = str(tmp_path / "store")
    # three separate appends to the same day -> >= 3 files in its partition
    store.append(spark, _slices(spark, D1, [1]), path)
    store.append(spark, _slices(spark, D1, [0, 2]).filter(F.col("lat_idx") == 1), path)
    base = _slices(spark, D1, [0, 0, 9]).filter(F.col("lat_idx") == 2)
    store.append(spark, base, path)
    store.append(spark, _slices(spark, D2, [7]), path)

    def files_per_day(day):
        return (
            spark.read.parquet(path)
            .filter(F.to_date("time") == day.date())
            .select(F.input_file_name().alias("f")).distinct().count()
        )

    assert files_per_day(D1) >= 3
    before = store.checksum(spark, path)
    d2_files_before = files_per_day(D2)
    n = store.compact(spark, path)
    assert n == 1  # only day 1 was fragmented
    assert files_per_day(D1) == 1
    assert files_per_day(D2) == d2_files_before  # untouched partition kept
    assert store.checksum(spark, path) == before  # content identical


def test_checksum_stable_across_partitioning(spark, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    data = _slices(spark, D1, [1, 2, 3, 4])
    store.append(spark, data, p1)
    store.append(spark, data.repartition(7), p2)
    assert store.checksum(spark, p1) == store.checksum(spark, p2)
    store.append(spark, _slices(spark, D2, [9]), p2)
    assert store.checksum(spark, p1) != store.checksum(spark, p2)


def test_cluster_spatial_sorts_rows_by_morton_within_files(spark, tmp_path):
    import random

    path = str(tmp_path / "store")
    rng = random.Random(3)
    cells = [(rng.randrange(64), rng.randrange(64)) for _ in range(200)]
    rows = [
        ("oco3", "t1", "pre", D1, la, lo, "xco2", float(i))
        for i, (la, lo) in enumerate(dict.fromkeys(cells))
    ]
    store.append(spark, spark.createDataFrame(rows, STORE_SLICE), path)
    before = sorted(map(tuple, spark.read.parquet(path).collect()))

    n = store.cluster_spatial(spark, path)
    assert n == 1
    after_df = spark.read.parquet(path)
    assert sorted(map(tuple, after_df.collect())) == before  # content unchanged

    def ref_z(a, b):
        z = 0
        for i in range(8):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    # per physical file, rows must be in ascending Morton order
    per_file = (
        after_df.withColumn("__f", F.input_file_name())
        .select("__f", "lat_idx", "lon_idx")
        .collect()
    )
    files: dict = {}
    for r in per_file:
        files.setdefault(r["__f"], []).append(ref_z(r.lat_idx, r.lon_idx))
    assert files
    for f, zs in files.items():
        assert zs == sorted(zs), f


def test_cluster_spatial_staged_swap_preserves_attrs_and_cleans_up(spark, tmp_path):
    """The layout pass writes to a staging dir then swaps — the attrs
    sidecar must survive byte-for-byte and no staging/old dirs remain.
    A stale staging dir from a prior crashed run is cleaned up, not
    swapped in."""
    path = str(tmp_path / "store")
    rows = [
        ("oco3", "t1", "pre", D1, la, lo, "xco2", 1.0)
        for la in range(4)
        for lo in range(4)
    ]
    store.append(spark, spark.createDataFrame(rows, STORE_SLICE), path)
    attrs = store.write_attrs(spark, path, {"title": "swap-test"})
    # simulate a crash artifact from an earlier run
    import os

    stale = path + ".__zorder_staging"
    os.makedirs(stale)
    with open(os.path.join(stale, "junk"), "w") as fh:
        fh.write("leftover")

    assert store.cluster_spatial(spark, path) == 1
    assert store.read_attrs(spark, path) == attrs
    assert not os.path.exists(stale)
    assert not os.path.exists(path + ".__zorder_old")
    assert spark.read.parquet(path).count() == len(rows)
