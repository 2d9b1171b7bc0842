"""Adversarial dedup fixture (VERDICT r02 item 6): the scale claims the
dedup family makes — exact-first sequencing bounds LSH bucket expansion,
join-based pair expansion so hot shingles split, O(log n) star convergence
on chains — are only meaningful on a corpus that actually exhibits skew.
This module builds one deterministically and checks both CORRECTNESS
(against brute-force / closed-form expectations) and BOUNDEDNESS (the hot
shingle must not explode the candidate set; the 500-node chain must
converge in O(log n) rounds, not O(n)).

Corpus (seed 7, deterministic):
  - 1,000 byte-identical docs (``dup###``) — heavy exact-duplicate mass;
  - a 500-node near-dup chain (``chain###``): doc i and i+1 share most of a
    sliding token window (adjacent Jaccard high, distant pairs unrelated) —
    the adversarial case for min-label propagation (diameter 500);
  - 30% of ALL docs additionally contain one common token run (a shared
    hot shingle) — the skewed-key case for shingle-join pair expansion;
  - 1,500 unrelated filler docs.

Timings for this module are recorded in PERF.md (adversarial fixture
section)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from oco3_data_transformer_spark.operators import dedup

SEED = 7
N_DUP = 1000
N_CHAIN = 500
N_FILLER = 1500
HOT = "common boilerplate header shared"  # one 4-token run -> hot shingles


def _corpus():
    rng = random.Random(SEED)
    words = [f"w{i}" for i in range(5000)]
    docs = []  # (doc_id, text)

    dup_text = "identical duplicated body " + " ".join(rng.choices(words, k=40))
    for i in range(N_DUP):
        docs.append((i, dup_text))

    # chain: doc i = tokens[4*i : 4*i + 40] of one long stream — adjacent
    # docs share 36/44 of their token window (Jaccard ~ 0.8), docs >= 10
    # apart share nothing
    stream = rng.choices(words, k=4 * N_CHAIN + 40)
    for i in range(N_CHAIN):
        docs.append((10_000 + i, " ".join(stream[4 * i : 4 * i + 40])))

    for i in range(N_FILLER):
        docs.append((20_000 + i, " ".join(rng.choices(words, k=40))))

    # hot shingle: 30% of all docs get the same 4-token run appended
    out = []
    for doc_id, text in docs:
        if rng.random() < 0.30:
            text = text + " " + HOT
        out.append((doc_id, text))
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.createDataFrame(_corpus(), "doc_id long, text string").repartition(8)
    df = df.localCheckpoint(eager=True)  # freeze: one materialization
    return df


def _survivors(corpus):
    """One doc per exact-duplicate group (exact-first sequencing)."""
    groups = dedup.exact_dedup(corpus, "doc_id", "text")
    return corpus.join(
        groups.select(F.col("canonical_id").alias("doc_id")), "doc_id"
    )


def test_exact_dedup_collapses_identical_mass(corpus):
    groups = dedup.exact_dedup(corpus, "doc_id", "text")
    rows = groups.filter(F.col("canonical_id") < N_DUP).collect()
    # the 1,000 identical docs collapse to at most 2 digests (hot-run
    # variant and plain variant) carrying the full duplicate mass
    assert 1 <= len(rows) <= 2
    assert sum(r.n_dupes for r in rows) == N_DUP
    n = _survivors(corpus).count()
    assert N_CHAIN + N_FILLER <= n <= N_CHAIN + N_FILLER + 2


def test_hot_shingle_does_not_explode_pairs(corpus):
    # exact-first sequencing: dedup identical docs BEFORE pairwise LSH —
    # the documented scale discipline (dedup.py module docstring)
    survivors = _survivors(corpus)
    pairs = dedup.ngram_jaccard_pairs(survivors, "doc_id", "text", n=3, threshold=0.5)
    rows = pairs.collect()
    # ~900 hot docs co-occur on the hot shingles, but 2 shared shingles out
    # of ~40 cannot reach Jaccard 0.5: the verify must kill them all. True
    # positives: chain neighbors (and the <=1 surviving dup pair).
    ids = {(r.id_a, r.id_b) for r in rows}
    for id_a, id_b in ids:
        if id_a >= 10_000:  # chain pairs: must be window-adjacent
            assert id_b - id_a <= 3, (id_a, id_b)
    # every adjacent chain pair IS found (shared 36-token window)
    found_adjacent = sum(1 for a, b in ids if 10_000 <= a and b == a + 1)
    assert found_adjacent >= N_CHAIN - 1 - 10  # hot-run suffix may nudge a few below threshold


def test_minhash_lsh_stays_bounded_and_agrees_with_exact(corpus):
    survivors = _survivors(corpus)
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(
            survivors, "doc_id", "text", n=3, threshold=0.7
        ).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_dedup(
            survivors, "doc_id", "text", n=3, bands=8, threshold=0.7
        ).collect()
    }
    # LSH pairs are verified with the same exact Jaccard -> no false
    # positives; banding recall on a skewed corpus stays high
    assert lsh <= exact
    if exact:
        assert len(lsh) / len(exact) >= 0.8


def test_hot_shingle_salting_is_equivalent_and_spreads_tasks(spark, corpus):
    """The explicit hot-key salting hook (ngram_jaccard_pairs
    hot_shingle_threshold): on the 30%-hot corpus the salted plan must
    return EXACTLY the unsalted result, and the hot keys' pair expansion
    must be spread across many tasks by construction — checked with
    broadcast joins disabled so the spread comes from the salt, not from
    a lucky broadcast of the probe side."""
    survivors = _survivors(corpus).localCheckpoint(eager=True)
    base = {
        (r.id_a, r.id_b, round(r.jacc, 9))
        for r in dedup.ngram_jaccard_pairs(
            survivors, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    salted = dedup.ngram_jaccard_pairs(
        survivors, "doc_id", "text", n=3, threshold=0.5, hot_shingle_threshold=100
    )
    assert {
        (r.id_a, r.id_b, round(r.jacc, 9)) for r in salted.collect()
    } == base

    # spread: the hot keys' raw pair expansion, forced through shuffle
    # joins, must not concentrate in one task. Broadcast off so the spread
    # comes from the salt keys; AQE partition-coalescing off because at
    # toy scale the pair BYTES fit one 64 MB advisory partition and AQE
    # legitimately re-merges them (at real hot-key scale the bytes keep
    # the salted tasks apart — the salt's job is creating the distinct
    # shuffle keys, which is what this asserts).
    # NB: AQE has its own runtime broadcast threshold and its local
    # shuffle-read would otherwise hide the salt partitioning under a
    # runtime-converted broadcast join — pin both thresholds.
    restore = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        sh = dedup.hashed_shingle_table(survivors, "doc_id", "text", 3)
        sh = sh.localCheckpoint(eager=True)
        hot = (
            sh.groupBy("h").agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 100)
        )
        assert hot.count() >= 1  # the fixture really has hot shingles
        from oco3_data_transformer_spark.operators.joins import salted_join

        a = sh.join(hot.select("h"), "h", "left_semi").select(
            F.col("id").alias("id_a"), "h"
        )
        b = sh.join(hot.select("h"), "h", "left_semi").select(
            F.col("id").alias("id_b"), "h"
        )
        expanded = salted_join(a, b, "h", salt_buckets=16).select("id_a", "id_b")
        dist = (
            expanded.withColumn("pid", F.spark_partition_id())
            .groupBy("pid").agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        total = sum(r.n for r in dist)
        assert len(dist) >= 8  # hot mass lands in many tasks...
        assert max(r.n for r in dist) <= 0.3 * total  # ...none dominant
    finally:
        for k, v in restore.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_chain_components_converge_min_label_and_star(spark, corpus):
    # adjacent chain pairs = one 500-node path, the worst case for
    # min-label (diameter bounded) and the motivating case for large/small-
    # star (O(log n) rounds)
    pairs = spark.createDataFrame(
        [(10_000 + i, 10_000 + i + 1) for i in range(N_CHAIN - 1)],
        "id_a long, id_b long",
    )
    nodes = corpus.select(F.col("doc_id").alias("id")).filter(
        (F.col("id") >= 10_000) & (F.col("id") < 10_000 + N_CHAIN)
    )
    star = dedup.canonicalize_pairs_star(nodes, pairs, max_iters=12)
    got = {r.id: r.canonical_id for r in star.collect()}
    assert set(got.values()) == {10_000}, "500-node chain must collapse to one root"
    assert len(got) == N_CHAIN
    # min-label at max_iters=12 would NOT converge on diameter-500 —
    # that asymmetry is exactly why the star variant exists; assert the
    # star version got there within its O(log n) budget (12 >= ~2*log2(500))


def test_auto_salting_no_argument(spark, corpus):
    """hot_shingle_threshold defaults to "auto" (VERDICT r04 item 7): on
    the 30%-hot corpus the sampled frequency profile must actually detect
    the hot shingles, and the self-salted default must return EXACTLY the
    explicitly-unsalted result."""
    survivors = _survivors(corpus).localCheckpoint(eager=True)

    # the auto profile (deterministic ~5% doc sample) sees the hot keys
    sh = dedup.hashed_shingle_table(survivors, "doc_id", "text", 3)
    cutoff = max(2, dedup.AUTO_HOT_DOC_COUNT // dedup.AUTO_PROFILE_MOD)
    hot = (
        sh.filter(F.pmod(F.xxhash64(F.col("id")), F.lit(dedup.AUTO_PROFILE_MOD)) == 0)
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= cutoff)
    )
    assert hot.count() >= 1

    unsalted = {
        (r.id_a, r.id_b, round(r.jacc, 9))
        for r in dedup.ngram_jaccard_pairs(
            survivors, "doc_id", "text", n=3, threshold=0.5,
            hot_shingle_threshold=None,
        ).collect()
    }
    auto = {
        (r.id_a, r.id_b, round(r.jacc, 9))
        for r in dedup.ngram_jaccard_pairs(
            survivors, "doc_id", "text", n=3, threshold=0.5,
        ).collect()
    }
    assert auto == unsalted


def test_minhash_estimate_kernels_identical(corpus):
    """r10 q62 restructure: the array-carry estimate kernel (signature
    minima ride the band-bucket pair expansion, zip_with agreement fold)
    must return EXACTLY the join-form reference — same pairs, same
    jacc_est doubles (both are exact small-int ratios over k) — on the
    adversarial corpus where buckets are hot and duplicate mass is heavy."""
    survivors = _survivors(corpus).localCheckpoint(eager=True)
    join_form = {
        (r.id_a, r.id_b, r.jacc_est)
        for r in dedup.minhash_estimate_pairs(
            survivors, "doc_id", "text", n=3, bands=8, threshold=0.7,
            kernel="join",
        ).collect()
    }
    carry = {
        (r.id_a, r.id_b, r.jacc_est)
        for r in dedup.minhash_estimate_pairs(
            survivors, "doc_id", "text", n=3, bands=8, threshold=0.7,
        ).collect()
    }
    assert carry == join_form
    assert carry  # non-vacuous: the dup mass guarantees estimate pairs
