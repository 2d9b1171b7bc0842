"""The storage-adapter seam (sinks/adapter.py): the store's logic must be
format-agnostic above the seam — every physical table operation observable
through a recording adapter — and the Parquet adapter's per-path write lock
must make same-process concurrent writers safe (the claim MIGRATION.md
makes for the Delta/Iceberg swap, demonstrated rather than asserted)."""

from __future__ import annotations

import datetime as dt
import threading

import pytest

from oco3_data_transformer_spark.schemas import STORE_SLICE
from oco3_data_transformer_spark.sinks import store
from oco3_data_transformer_spark.sinks.adapter import (
    DeltaStorageAdapter,
    ParquetStorageAdapter,
    StorageAdapter,
)

D1 = dt.datetime(2020, 1, 1, 12)
D2 = dt.datetime(2020, 1, 2, 12)


def _rows(day, lats):
    return [("oco3", "t1", "pre", day, la, 0, "xco2", float(la)) for la in lats]


class RecordingAdapter(StorageAdapter):
    """Delegates to Parquet but records every seam crossing — swapping the
    format is exactly 'provide another object with these five methods'."""

    def __init__(self):
        self.inner = ParquetStorageAdapter()
        self.calls: list[str] = []

    def exists(self, spark, path):
        self.calls.append("exists")
        return self.inner.exists(spark, path)

    def read(self, spark, path):
        self.calls.append("read")
        return self.inner.read(spark, path)

    def append(self, df, path, partition_cols):
        self.calls.append("append")
        return self.inner.append(df, path, partition_cols)

    def overwrite_partitions(self, df, path, partition_cols):
        self.calls.append("overwrite_partitions")
        return self.inner.overwrite_partitions(df, path, partition_cols)

    def write_lock(self, path):
        self.calls.append("write_lock")
        return self.inner.write_lock(path)


def test_full_store_surface_routes_through_adapter(spark, tmp_path):
    path = str(tmp_path / "store")
    a = RecordingAdapter()
    df1 = spark.createDataFrame(_rows(D1, [1, 2]), STORE_SLICE)
    df2 = spark.createDataFrame(_rows(D1, [2, 3]) + _rows(D2, [9]), STORE_SLICE)

    assert store.append(spark, df1, path, adapter=a) == 2
    assert store.append(spark, df2, path, adapter=a) == 2  # lat 2 deduped
    store.merge(spark, spark.createDataFrame(_rows(D2, [9, 10]), STORE_SLICE), path, adapter=a)
    rep = store.verify(spark, path, adapter=a)
    assert rep["duplicate_keys"] == 0 and rep["rows"] == 5
    assert store.repair(spark, path, adapter=a) == 0

    # every operation crossed the seam; no direct spark.read/write escaped
    assert {"exists", "read", "append", "overwrite_partitions", "write_lock"} <= set(a.calls)
    # the data really is what the plain adapter would have produced
    got = sorted(r.lat_idx for r in store.DEFAULT_ADAPTER.read(spark, path).collect())
    assert got == [1, 2, 3, 9, 10]


def test_concurrent_appends_lose_nothing_and_stay_idempotent(spark, tmp_path):
    """Two writers racing on the same store: every distinct slice must
    survive (no commit-staging clobber) and overlapping slices must not
    duplicate (the check-then-write pair is atomic under the per-path
    lock). 8 racing appends with pairwise-overlapping keys."""
    path = str(tmp_path / "store")
    batches = [
        _rows(D1, [i, i + 1, 100 + i])  # i+1 overlaps the next batch's i
        for i in range(8)
    ]
    errs: list[Exception] = []

    def run(b):
        try:
            store.append(spark, spark.createDataFrame(b, STORE_SLICE), path)
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    threads = [threading.Thread(target=run, args=(b,)) for b in batches]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    expect = sorted({r[4] for b in batches for r in b})
    got = sorted(r.lat_idx for r in spark.read.parquet(path).collect())
    assert got == expect  # no lost slices, no duplicated overlaps
    assert store.verify(spark, path)["duplicate_keys"] == 0


def test_delta_adapter_is_import_gated():
    try:
        import delta  # noqa: F401

        pytest.skip("delta available in this env; gate not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="delta-spark"):
        DeltaStorageAdapter()


class ConflictingAdapter(RecordingAdapter):
    """Simulates the Delta optimistic-concurrency protocol for ONE race:
    writer B commits between writer A's read and A's write. The first
    overwrite_partitions call (A's) raises StorageConflictError AFTER
    letting the configured concurrent commit land — exactly what Delta's
    commit-time conflict check does — so A's retry must re-read and
    observe B's rows."""

    supports_concurrent_writers = True  # ACID semantics under test

    def __init__(self, concurrent_commit=None):
        super().__init__()
        self._concurrent_commit = concurrent_commit
        self.conflicts_raised = 0

    def write_lock(self, path):  # Delta: no in-process serialization
        self.calls.append("write_lock")
        from contextlib import nullcontext

        return nullcontext()

    def overwrite_partitions(self, df, path, partition_cols):
        from oco3_data_transformer_spark.sinks.adapter import (
            StorageConflictError,
        )

        if self._concurrent_commit is not None:
            # the racing writer wins the commit; this writer's txn fails
            commit, self._concurrent_commit = self._concurrent_commit, None
            commit()
            self.conflicts_raised += 1
            raise StorageConflictError("concurrent append to touched partition")
        self.calls.append("overwrite_partitions")
        return self.inner.overwrite_partitions(df, path, partition_cols)


def test_merge_conflict_retry_rereads_and_serializes(spark, tmp_path):
    """Two concurrent merge() writers under an ACID adapter: writer B
    commits between A's read and write; A's first commit attempt raises
    the conflict, and A's retry must RE-READ (picking up B's rows) so the
    final store equals the serialized B-then-A result. This is the
    protocol-level contract the real Delta log enforces; a write-only
    retry would lose B's rows entirely."""
    path = str(tmp_path / "store")
    a_rows = spark.createDataFrame(_rows(D1, [0, 1]), STORE_SLICE)
    b_rows = spark.createDataFrame(_rows(D1, [5, 6]), STORE_SLICE)

    plain = RecordingAdapter()
    plain.supports_concurrent_writers = True

    def writer_b_commit():
        store.merge(spark, b_rows, path, adapter=plain)

    racing = ConflictingAdapter(concurrent_commit=writer_b_commit)
    store.merge(spark, a_rows, path, adapter=racing)

    assert racing.conflicts_raised == 1
    # A's cycle ran twice: read-free first pass (store absent), then after
    # B's commit the retry re-read the store
    assert racing.calls.count("exists") == 2
    got = sorted(
        (r.lat_idx, r.value)
        for r in spark.read.parquet(path).collect()
    )
    assert got == [(0, 0.0), (1, 1.0), (5, 5.0), (6, 6.0)]


def test_conflict_retries_bounded(spark, tmp_path):
    """A persistent conflict storm must not livelock: after
    CONFLICT_RETRIES re-runs the error propagates."""
    from oco3_data_transformer_spark.sinks.adapter import StorageConflictError

    path = str(tmp_path / "store")
    rows = spark.createDataFrame(_rows(D1, [0]), STORE_SLICE)

    class AlwaysConflict(ConflictingAdapter):
        def overwrite_partitions(self, df, p, cols):
            self.conflicts_raised += 1
            raise StorageConflictError("storm")

    a = AlwaysConflict()
    with pytest.raises(StorageConflictError):
        store.merge(spark, rows, path, adapter=a)
    assert a.conflicts_raised == store.CONFLICT_RETRIES + 1


def test_append_conflict_retry_is_idempotent(spark, tmp_path):
    """append() under an ACID adapter: writer B appends the same day
    between A's duplicate-check and A's commit; A's conflict retry
    re-runs the WHOLE cycle, so the re-read duplicate check drops B's
    now-present keys and the store holds each slice exactly once."""
    from oco3_data_transformer_spark.sinks.adapter import StorageConflictError

    path = str(tmp_path / "store")
    a_rows = spark.createDataFrame(_rows(D1, [0, 1]), STORE_SLICE)
    b_rows = spark.createDataFrame(_rows(D1, [1, 2]), STORE_SLICE)  # overlaps

    plain = RecordingAdapter()
    plain.supports_concurrent_writers = True

    class AppendConflict(RecordingAdapter):
        supports_concurrent_writers = True

        def __init__(self):
            super().__init__()
            self.raised = False

        def write_lock(self, p):
            from contextlib import nullcontext

            return nullcontext()

        def append(self, df, p, cols):
            if not self.raised:
                self.raised = True
                store.append(spark, b_rows, path, adapter=plain)  # B commits
                raise StorageConflictError("conflicting append")
            self.calls.append("append")
            return self.inner.append(df, p, cols)

    n = store.append(spark, a_rows, path, adapter=AppendConflict())
    assert n == 1  # retry re-read: only lat 0 was still missing
    got = sorted(r.lat_idx for r in spark.read.parquet(path).collect())
    assert got == [0, 1, 2]  # each slice exactly once
