"""Contract test for DeltaStorageAdapter (sinks/adapter.py) against a MOCK
``delta`` package.

The real delta-spark wheel is unreachable in this sandbox (no network, no
local wheelhouse — ROADMAP.md "Delta activation attempt"), so ACID behavior
can't be demonstrated here. What CAN be pinned is the adapter's call
surface: every method body executes against an injected fake ``delta``
module and a recording fake DataFrame/Session, and the exact Delta API
chain each store primitive must emit (format → mode → options →
partitionBy → save) is asserted. If the adapter's signatures or option
spelling drift, this fails — without the package.

No Spark session needed: these tests are pure call-recording.
"""

from __future__ import annotations

import sys
import types
from unittest.mock import MagicMock

import pytest


class FakeConcurrentAppendException(Exception):
    """Stands in for delta.exceptions.ConcurrentAppendException."""


@pytest.fixture()
def fake_delta(monkeypatch):
    """Inject a minimal ``delta``/``delta.tables``/``delta.exceptions``
    package into sys.modules."""
    delta_mod = types.ModuleType("delta")
    tables_mod = types.ModuleType("delta.tables")
    exc_mod = types.ModuleType("delta.exceptions")

    class FakeDeltaTable:
        is_delta_calls: list[tuple] = []

        @staticmethod
        def isDeltaTable(spark, path):
            FakeDeltaTable.is_delta_calls.append((spark, path))
            return path.endswith("/existing")

    tables_mod.DeltaTable = FakeDeltaTable
    exc_mod.ConcurrentAppendException = FakeConcurrentAppendException
    delta_mod.tables = tables_mod
    delta_mod.exceptions = exc_mod
    monkeypatch.setitem(sys.modules, "delta", delta_mod)
    monkeypatch.setitem(sys.modules, "delta.tables", tables_mod)
    monkeypatch.setitem(sys.modules, "delta.exceptions", exc_mod)
    FakeDeltaTable.is_delta_calls.clear()
    return FakeDeltaTable


def _adapter(fake_delta):
    from oco3_data_transformer_spark.sinks.adapter import DeltaStorageAdapter

    return DeltaStorageAdapter()


def test_constructor_gates_on_delta_import():
    """Without the package the constructor must raise NotImplementedError
    (the env-gate contract shared with the rasterio/xarray sinks)."""
    from oco3_data_transformer_spark.sinks.adapter import DeltaStorageAdapter

    if "delta" in sys.modules:  # pragma: no cover - real package present
        pytest.skip("real delta package available")
    with pytest.raises(NotImplementedError, match="delta-spark"):
        DeltaStorageAdapter()


def test_concurrent_writer_contract(fake_delta):
    """Delta's commit log makes cross-process writers safe: the adapter
    must advertise it and its write_lock must be a no-op (yield without
    serializing — the store skips its in-process lock discipline)."""
    a = _adapter(fake_delta)
    assert a.supports_concurrent_writers is True
    entered = False
    with a.write_lock("/store/t"):
        entered = True
    assert entered


def test_exists_uses_isdeltatable(fake_delta):
    a = _adapter(fake_delta)
    spark = MagicMock(name="spark")
    assert a.exists(spark, "/store/existing") is True
    assert a.exists(spark, "/store/missing") is False
    assert fake_delta.is_delta_calls == [(spark, "/store/existing"), (spark, "/store/missing")]


def test_read_chain(fake_delta):
    a = _adapter(fake_delta)
    spark = MagicMock(name="spark")
    out = a.read(spark, "/store/t")
    spark.read.format.assert_called_once_with("delta")
    spark.read.format.return_value.load.assert_called_once_with("/store/t")
    assert out is spark.read.format.return_value.load.return_value


def test_append_chain(fake_delta):
    a = _adapter(fake_delta)
    df = MagicMock(name="df")
    a.append(df, "/store/t", ["mission", "day"])
    w = df.write.format
    w.assert_called_once_with("delta")
    w.return_value.mode.assert_called_once_with("append")
    w.return_value.mode.return_value.partitionBy.assert_called_once_with("mission", "day")
    w.return_value.mode.return_value.partitionBy.return_value.save.assert_called_once_with(
        "/store/t"
    )


def test_overwrite_partitions_chain(fake_delta):
    """The partition-scoped MERGE primitive: dynamic partition overwrite
    must be requested EXPLICITLY (option spelling is load-bearing — a
    plain overwrite would truncate the whole table)."""
    a = _adapter(fake_delta)
    df = MagicMock(name="df")
    a.overwrite_partitions(df, "/store/t", ["mission", "day"])
    chain = df.write.format
    chain.assert_called_once_with("delta")
    m = chain.return_value.mode
    m.assert_called_once_with("overwrite")
    opt = m.return_value.option
    opt.assert_called_once_with("partitionOverwriteMode", "dynamic")
    pb = opt.return_value.partitionBy
    pb.assert_called_once_with("mission", "day")
    pb.return_value.save.assert_called_once_with("/store/t")


def test_conflict_exceptions_translate_to_storage_conflict(fake_delta):
    """Delta's optimistic-concurrency exceptions must surface as the
    typed StorageConflictError so the store re-runs its WHOLE
    read-compute-write cycle (a write-only retry would drop the
    conflicting commit's rows)."""
    from oco3_data_transformer_spark.sinks.adapter import StorageConflictError

    a = _adapter(fake_delta)
    df = MagicMock(name="df")
    df.write.format.return_value.mode.return_value.partitionBy.return_value.save.side_effect = (
        FakeConcurrentAppendException("txn 12 conflicts with 13")
    )
    with pytest.raises(StorageConflictError):
        a.append(df, "/store/t", ["day"])

    df2 = MagicMock(name="df2")
    (
        df2.write.format.return_value.mode.return_value.option.return_value
        .partitionBy.return_value.save.side_effect
    ) = FakeConcurrentAppendException("txn conflict")
    with pytest.raises(StorageConflictError):
        a.overwrite_partitions(df2, "/store/t", ["day"])


def test_non_conflict_errors_propagate_unchanged(fake_delta):
    """Only the Concurrent*/MetadataChanged family is retryable; any other
    failure (analysis error, IO) must propagate as-is — retrying those
    could mask real corruption."""
    a = _adapter(fake_delta)
    df = MagicMock(name="df")
    df.write.format.return_value.mode.return_value.partitionBy.return_value.save.side_effect = (
        RuntimeError("schema mismatch")
    )
    with pytest.raises(RuntimeError, match="schema mismatch"):
        a.append(df, "/store/t", ["day"])
