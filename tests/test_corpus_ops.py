"""Unit tests for the corpus-preparation operators (operators/corpus.py,
operators/timeseries.py) — semantics and determinism, independent of the
DuckDB parity check in test_oracle_parity.py."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from oco3_data_transformer_spark.operators import corpus as corpus_ops
from oco3_data_transformer_spark.operators import timeseries as ts_ops


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("lang"),
        (F.col("id") % 37 + 1).alias("n_tok"),
    )


def test_hash_split_partition_invariant_and_exhaustive(spark):
    df = _docs(spark)
    a = {r["doc_id"]: r["split"] for r in corpus_ops.hash_split(df, "doc_id").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in corpus_ops.hash_split(df.repartition(7), "doc_id").collect()
    }
    assert a == b
    assert set(a.values()) <= {"train", "val", "test"}
    assert len(a) == 200
    # hash buckets should land near 80/10/10 (loose: the hash is uniform)
    n_train = sum(1 for v in a.values() if v == "train")
    assert 130 <= n_train <= 190


def test_stratified_sample_exact_k_per_stratum(spark):
    df = _docs(spark)
    out = corpus_ops.stratified_sample(df, "lang", "doc_id", k=10).collect()
    per = {}
    for r in out:
        per.setdefault(r["lang"], []).append(r["sample_rank"])
    assert set(per) == {"0", "1", "2", "3"}
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, 11))
    # small stratum: k larger than the stratum returns the whole stratum
    tiny = df.filter(F.col("doc_id") < 6)
    assert corpus_ops.stratified_sample(tiny, "lang", "doc_id", k=10).count() == 6


def test_pack_next_fit_invariants(spark):
    df = _docs(spark)
    cap = 60
    rows = corpus_ops.pack_next_fit(df, "doc_id", "n_tok", capacity=cap, n_shards=4).collect()
    assert len(rows) == 200
    by_bin: dict[tuple, list] = {}
    for r in rows:
        by_bin.setdefault((r["shard"], r["bin"]), []).append(r)
    for (shard, b), members in by_bin.items():
        total = sum(r["n_tok"] for r in members)
        # a bin only exceeds capacity if it is a single oversized document
        assert total <= cap or len(members) == 1
        # fill_after of the id-latest member equals the bin total
        last = max(members, key=lambda r: r["doc_id"])
        assert last["fill_after"] == total
    # bins are contiguous 0..max per shard
    for shard in {r["shard"] for r in rows}:
        bins = sorted({r["bin"] for r in rows if r["shard"] == shard})
        assert bins == list(range(len(bins)))
    # next-fit is deterministic in the id order, not the physical partitioning
    again = corpus_ops.pack_next_fit(
        df.repartition(13), "doc_id", "n_tok", capacity=cap, n_shards=4
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_pack_next_fit_oversized_doc_gets_own_bin(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 999), (3, 10)], "doc_id long, n_tok long"
    )
    rows = {r["doc_id"]: r for r in corpus_ops.pack_next_fit(
        df, "doc_id", "n_tok", capacity=50, n_shards=1
    ).collect()}
    assert rows[2]["bin"] not in (rows[1]["bin"],)
    # the doc after an oversized one starts a fresh bin (fill already > cap)
    assert rows[3]["bin"] == rows[2]["bin"] + 1


def test_gapfill_locf_semantics(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(h):
        return t0 + dt.timedelta(hours=h)

    ev = spark.createDataFrame(
        [
            ("a", at(0), 1.0),
            ("a", at(1), 5.0),   # same 6h bucket as hour 0
            ("a", at(13), 2.0),  # bucket 2; bucket 1 is a gap for a
            ("b", at(7), 9.0),   # bucket 1 only
        ],
        "user string, ts timestamp, value double",
    )
    out = {
        (r["user"], r["bucket_ts"]): r
        for r in ts_ops.gapfill_locf(ev, "user", "ts", "value", 6 * 3600).collect()
    }
    # spine spans bucket 0..2 for both series -> 6 rows
    assert len(out) == 6
    a0 = out[("a", at(0))]
    assert a0["n_events"] == 2 and a0["filled_max"] == 5.0 and a0["is_gap"] == 0
    a1 = out[("a", at(6))]
    assert a1["n_events"] == 0 and a1["filled_max"] == 5.0 and a1["is_gap"] == 1
    a2 = out[("a", at(12))]
    assert a2["n_events"] == 1 and a2["filled_max"] == 2.0 and a2["is_gap"] == 0
    # b has no events in bucket 0: LOCF has nothing to carry -> null
    b0 = out[("b", at(0))]
    assert b0["n_events"] == 0 and b0["filled_max"] is None and b0["is_gap"] == 1
    b2 = out[("b", at(12))]
    assert b2["filled_max"] == 9.0 and b2["is_gap"] == 1


def test_mix_by_budget_reaches_budget_and_stops(spark):
    df = _docs(spark)  # n_tok = id % 37 + 1 per doc, lang strata reused as source
    budget = F.lit(100)
    out = corpus_ops.mix_by_budget(df, "lang", "doc_id", "n_tok", budget).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["lang"], []).append(r)
    assert set(by_src) == {"0", "1", "2", "3"}
    for rows in by_src.values():
        rows.sort(key=lambda r: r["mix_rank"])
        # ranks are a contiguous prefix of the hash order
        assert [r["mix_rank"] for r in rows] == list(range(1, len(rows) + 1))
        # every kept doc started under budget; total crosses it exactly once
        assert all(r["cum_before"] < 100 for r in rows)
        total = sum(r["n_tok"] for r in rows)
        assert total >= 100  # budget reached (crossing doc included)
        assert total - rows[-1]["n_tok"] < 100  # dropping the last re-opens it


def test_chunk_tokens_offsets_and_coverage(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(25))), (2, "a b"), (3, "")],
        "doc_id long, text string",
    )
    rows = corpus_ops.chunk_tokens(df, "doc_id", "text", window=10, stride=7).collect()
    d1 = sorted((r["chunk_idx"], r["n_chunk_tok"]) for r in rows if r["doc_id"] == 1)
    # starts 0,7,14,21 over 25 tokens: sizes 10,10,10,4
    assert d1 == [(0, 10), (1, 10), (2, 10), (3, 4)]
    d2 = [(r["chunk_idx"], r["n_chunk_tok"]) for r in rows if r["doc_id"] == 2]
    assert d2 == [(0, 2)]
    assert not [r for r in rows if r["doc_id"] == 3]  # empty doc -> no chunks
    # consecutive chunks overlap by window - stride tokens (fingerprints differ)
    md5s = [r["chunk_md5"] for r in rows if r["doc_id"] == 1]
    assert len(set(md5s)) == 4


def test_weighted_sample_uniform_weights_follow_hash_order(spark):
    from oco3_data_transformer_spark.functions import hashing
    df = _docs(spark, 50).withColumn("w", F.lit(1))
    got = [r["doc_id"] for r in corpus_ops.weighted_sample(df, "doc_id", "w", 10).collect()]
    # constant weights: key = -ln(u) is monotone decreasing in u, so the
    # sample is exactly the top-10 ids by hash value
    hs = {
        r["doc_id"]: r["h"]
        for r in df.select("doc_id", hashing.portable_hash64(
            F.col("doc_id").cast("string")).alias("h")).collect()
    }
    expect = sorted(hs, key=lambda d: -hs[d])[:10]
    assert sorted(got) == sorted(expect)


def test_weighted_sample_biases_toward_heavy_rows(spark):
    # two strata of equal size, weight 100 vs 1: the heavy stratum must
    # dominate a k=20 sample of 200 rows
    df = _docs(spark).withColumn(
        "w", F.when(F.col("doc_id") < 100, 100).otherwise(1)
    )
    got = corpus_ops.weighted_sample(df, "doc_id", "w", 20).collect()
    n_heavy = sum(1 for r in got if r["doc_id"] < 100)
    assert n_heavy >= 16
    # zero/negative weights are excluded entirely
    df0 = df.withColumn("w", F.when(F.col("doc_id") == 0, 0).otherwise(F.col("w")))
    assert not [
        r for r in corpus_ops.weighted_sample(df0, "doc_id", "w", 200).collect()
        if r["doc_id"] == 0
    ]


def test_train_order_is_permutation_and_partition_invariant(spark):
    df = spark.range(500).select(F.col("id").alias("doc_id"))
    out = corpus_ops.train_order(df, "doc_id", seed="e0", n_buckets=8)
    rows = out.collect()
    # a permutation: every doc exactly once, positions dense per bucket
    assert sorted(r.doc_id for r in rows) == list(range(500))
    by_bucket: dict = {}
    for r in rows:
        by_bucket.setdefault(r.shuffle_bucket, []).append(r.shuffle_pos)
    assert set(by_bucket) == set(range(8))
    for b, poss in by_bucket.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), b
    # partition-invariant: same coordinates from a different input layout
    re = corpus_ops.train_order(df.repartition(13), "doc_id", "e0", 8)
    assert sorted(map(tuple, re.collect())) == sorted(map(tuple, rows))
    # a new seed is a genuinely different permutation
    e1 = corpus_ops.train_order(df, "doc_id", seed="e1", n_buckets=8)
    assert sorted(map(tuple, e1.collect())) != sorted(map(tuple, rows))


def test_length_batches_bounds_padding_vs_unsorted(spark):
    import random

    rng = random.Random(5)
    lens = [rng.randrange(1, 1000) for _ in range(400)]
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(lens)], "doc_id long, n_chars long"
    )
    out = corpus_ops.length_batches(df, "doc_id", "n_chars", batch_size=16).collect()
    # every row assigned; batch_pos dense within (bucket, batch)
    assert len(out) == 400
    groups: dict = {}
    for r in out:
        assert r.len_bucket == (r.n_chars - 1) // 64
        groups.setdefault((r.len_bucket, r.batch_idx), []).append(r)
    pad = 0
    for (_, bi), grp in groups.items():
        assert sorted(r.batch_pos for r in grp) == list(range(len(grp)))
        assert len(grp) <= 16
        pad += max(r.n_chars for r in grp) * len(grp) - sum(r.n_chars for r in grp)
    # padding waste must beat naive id-order batching by a wide margin
    naive = 0
    for i in range(0, 400, 16):
        grp = lens[i : i + 16]
        naive += max(grp) * len(grp) - sum(grp)
    assert pad < naive / 2


def test_class_balance_equalizes_to_minority(spark):
    rows = (
        [(i, 0) for i in range(100)]
        + [(1000 + i, 1) for i in range(37)]
        + [(2000 + i, 2) for i in range(500)]
    )
    df = spark.createDataFrame(rows, "vec_id long, label int")
    kept = corpus_ops.class_balance(df, "label", "vec_id").collect()
    per = {}
    for r in kept:
        per.setdefault(r.label, set()).add(r.vec_id)
    assert {k: len(v) for k, v in per.items()} == {0: 37, 1: 37, 2: 37}
    assert per[1] == {1000 + i for i in range(37)}  # minority kept whole
    # deterministic: a rerun keeps the same members
    again = corpus_ops.class_balance(df.repartition(7), "label", "vec_id").collect()
    per2: dict = {}
    for r in again:
        per2.setdefault(r.label, set()).add(r.vec_id)
    assert per2 == per
