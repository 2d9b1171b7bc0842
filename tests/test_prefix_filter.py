"""Prefix-filter exact similarity join (operators/dedup.
prefix_filter_jaccard_pairs): must equal the brute-force co-occurrence
join on every corpus and threshold — the prefix bound is an OPTIMIZATION,
never a semantics change. Randomized differential tests stress short docs
(ceil boundary), heavy shared boilerplate (hot shingles excluded from the
index), and thresholds across the range."""

from __future__ import annotations

import random

import pytest

from oco3_data_transformer_spark.operators.dedup import (
    ngram_jaccard_pairs,
    prefix_filter_jaccard_pairs,
)

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _random_docs(seed: int, n_docs: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    base = " ".join(rng.choice(WORDS) for _ in range(12))
    docs = []
    for i in range(n_docs):
        if rng.random() < 0.5 and docs:
            # perturb an earlier doc -> guaranteed near-dups at various jacc
            words = docs[rng.randrange(len(docs))][1].split()
            k = rng.randrange(0, 4)
            for _ in range(k):
                words[rng.randrange(len(words))] = rng.choice(WORDS)
            docs.append((i, " ".join(words)))
        else:
            docs.append(
                (i, base + " " + " ".join(rng.choice(WORDS) for _ in range(8)))
            )
    return docs


def _pairs(df_out) -> set[tuple]:
    return {
        (r["id_a"], r["id_b"], round(r["jacc"], 6)) for r in df_out.collect()
    }


@pytest.mark.parametrize("seed,threshold", [(0, 0.5), (1, 0.7), (2, 0.9), (3, 0.3)])
def test_prefix_filter_equals_bruteforce(spark, seed, threshold):
    docs = spark.createDataFrame(_random_docs(seed, 30), "doc_id long, text string")
    got = _pairs(prefix_filter_jaccard_pairs(docs, "doc_id", "text", 3, threshold))
    want = _pairs(
        ngram_jaccard_pairs(docs, "doc_id", "text", 3, threshold, None)
    )
    assert got == want
    assert want, "fixture must actually produce near-dup pairs"


def test_prefix_filter_identical_docs(spark):
    # jacc = 1.0 pairs survive the tightest threshold (prefix length >= 1)
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "x y z w v u")],
        "doc_id long, text string",
    )
    got = _pairs(prefix_filter_jaccard_pairs(docs, "doc_id", "text", 3, 1.0))
    assert got == {(1, 2, 1.0)}


def test_prefix_filter_short_docs_ceil_boundary(spark):
    # single-shingle docs: n_sh=1, prefix length 1 - ceil(t) + 1 = 1 --
    # the smallest legal prefix must still index the doc
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "a b d")], "doc_id long, text string"
    )
    got = _pairs(prefix_filter_jaccard_pairs(docs, "doc_id", "text", 3, 0.5))
    assert (1, 2, 1.0) in got
    assert all(p[:2] != (1, 3) for p in got)  # jacc 0 pair absent
