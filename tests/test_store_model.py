"""Model-based store test: random interleavings of idempotent appends and
partition upserts, checked after every step against a plain-dict model of
the store's contract:

  - append(batch): keys not yet present are inserted; existing keys keep
    their first-written value (ref ZarrWriter keep-first dedup);
  - upsert(batch): every (mission, qf, day) partition the batch touches is
    replaced by exactly the batch's rows for it (late-data repair);
  - merge(batch): batch rows replace matching slice keys; all other
    existing rows of the touched partitions are kept (true MERGE).
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from oco3_data_transformer_spark.schemas import STORE_SLICE
from oco3_data_transformer_spark.sinks import store

DAYS = [dt.datetime(2024, 3, d) for d in (1, 2, 3)]
QFS = ["pre", "post"]


def _batch(spark, rng, batch_id):
    rows = []
    for _ in range(rng.randint(1, 6)):
        day = rng.choice(DAYS)
        qf = rng.choice(QFS)
        cell = rng.randint(0, 3)
        rows.append(
            ("oco3", "t1", qf, day, cell, cell, "xco2", float(batch_id * 100 + cell))
        )
    return rows, spark.createDataFrame(rows, STORE_SLICE)


def _model_key(row):
    return (row[0], row[1], row[2], row[3], row[4], row[5], row[6])


def _partition_of(row):
    return (row[0], row[2], row[3].date())


def test_random_append_upsert_interleaving(spark, tmp_path):
    rng = random.Random(1234)
    path = str(tmp_path / "store")
    model: dict = {}
    for step in range(12):
        rows, df = _batch(spark, rng, step)
        action = rng.random()
        if action < 0.4:
            store.append(spark, df, path)
            # model: first write wins, within-batch dedup keeps one per key
            for r in rows:
                model.setdefault(_model_key(r), r[7])
        elif action < 0.7 and model:  # merge needs an existing store
            store.merge(spark, df, path)
            batch_keep: dict = {}
            for r in rows:
                batch_keep.setdefault(_model_key(r), r[7])
            model.update(batch_keep)  # replace matches, keep the rest
        else:
            store.upsert(spark, df, path)
            touched = {_partition_of(r) for r in rows}
            model = {
                k: v
                for k, v in model.items()
                if (k[0], k[2], k[3].date()) not in touched
            }
            batch_keep: dict = {}
            for r in rows:
                batch_keep.setdefault(_model_key(r), r[7])
            model.update(batch_keep)

        got = {
            _model_key((r.mission, r.target_id, r.qf, r.time, r.lat_idx, r.lon_idx, r.variable, r.value)): r.value
            for r in spark.read.parquet(path).collect()
        }
        assert set(got) == set(model), f"step {step}: key sets diverged"
        # values must agree except where a batch carried duplicate keys with
        # different values (both engine and model then keep an arbitrary
        # one of the duplicates; our batches generate at most one value per
        # key per batch, so equality is exact)
        assert got == model, f"step {step}: values diverged"
        assert store.verify(spark, path)["duplicate_keys"] == 0


def test_compact_is_checksum_invariant_after_random_history(spark, tmp_path):
    """compact() must never change store content, whatever write history
    produced the fragmentation."""
    rng = random.Random(99)
    path = str(tmp_path / "store")
    for step in range(6):
        rows, df = _batch(spark, rng, step)
        (store.append if step % 2 == 0 else store.merge)(spark, df, path)
    before = store.checksum(spark, path)
    n = store.compact(spark, path)
    assert store.checksum(spark, path) == before
    assert store.verify(spark, path)["duplicate_keys"] == 0
    # second compact is a no-op (nothing fragmented anymore)
    assert store.compact(spark, path) == 0


def test_reapplying_any_write_is_idempotent(spark, tmp_path):
    """Replaying the SAME batch through any write path must leave the store
    unchanged — the at-least-once delivery contract every ingest retry
    relies on (ref util/writer retry semantics)."""
    rng = random.Random(7)
    path = str(tmp_path / "store")
    for step, op in enumerate([store.append, store.merge, store.upsert,
                               store.append, store.upsert, store.merge]):
        rows, df = _batch(spark, rng, step)
        op(spark, df, path)
        before = store.checksum(spark, path)
        op(spark, df, path)  # replay the identical batch
        assert store.checksum(spark, path) == before, f"step {step}: {op.__name__} not idempotent"
        assert store.verify(spark, path)["duplicate_keys"] == 0
