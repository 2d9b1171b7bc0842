"""Unit tests for the corpus-curation batch: incremental delta-vs-index
admission, SemDeDup-style semantic dedup, the hashed-feature quality
scorer, and BPE pair statistics — semantics and edge cases, independent of
the DuckDB parity check (tests/test_oracle_parity.py covers q87-q90)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oco3_data_transformer_spark.functions import text
from oco3_data_transformer_spark.operators import dedup as dedup_ops
from oco3_data_transformer_spark.operators import similarity as sim_ops


def test_incremental_dedup_verdicts(spark):
    index = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again today"),
            (2, "completely different indexed text about spark and parquet files"),
        ],
        ["doc_id", "text"],
    )
    delta = spark.createDataFrame(
        [
            # byte-identical to index doc 1 -> exact_dup
            (10, "the quick brown fox jumps over the lazy dog again today"),
            # one word changed -> high Jaccard -> near_dup
            (11, "the quick brown fox jumps over the lazy cat again today"),
            # nothing in common -> new
            (12, "unrelated fresh content never seen before anywhere at all"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.id: (r.verdict, r.max_jacc)
        for r in dedup_ops.incremental_dedup(
            delta, index, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    assert out[10][0] == "exact_dup" and out[10][1] == 1.0
    assert out[11][0] == "near_dup" and 0.5 <= out[11][1] < 1.0
    assert out[12][0] == "new" and out[12][1] == 0.0


def test_incremental_dedup_empty_delta_doc_is_new(spark):
    index = spark.createDataFrame([(1, "some indexed words here")], ["doc_id", "text"])
    delta = spark.createDataFrame([(10, "")], ["doc_id", "text"])
    [row] = dedup_ops.incremental_dedup(delta, index, "doc_id", "text").collect()
    assert (row.id, row.verdict, row.max_jacc) == (10, "new", 0.0)


def test_semantic_dedup_keeps_first_per_near_dup_group(spark):
    # two well-separated cells; vectors 0/1/2 are near-identical (one group,
    # keep id 0), vectors 10/11 are distinct directions (keep both)
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0]),
            (2, [0.998, 0.02, 0.0]),
            (10, [0.0, 1.0, 0.0]),
            (11, [0.0, 0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 0.7, 0.7])],
        "cell int, centroid array<double>",
    )
    prof = {
        r.cell: (r.n_vectors, r.n_dropped, r.n_kept)
        for r in sim_ops.semantic_dedup(emb, cents, 0.95).collect()
    }
    assert prof[0] == (3, 2, 1)  # ids 1 and 2 dropped, 0 kept
    assert prof[1] == (2, 0, 2)  # orthogonal vectors: no pair above 0.95


def test_hashed_feature_score_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "x")],
        ["id", "text"],
    )
    out = df.select(
        "id",
        text.hashed_feature_milli_sum(F.col("text")).alias("milli"),
        text.token_count(F.col("text")).alias("n"),
    ).collect()
    by_id = {r.id: r for r in out}
    # identical text -> identical integer sum; |mean weight| <= 1001 milli
    assert by_id[1].milli == by_id[2].milli
    for r in out:
        assert abs(r.milli) <= 1001 * r.n


def test_char_pairs_edges(spark):
    df = spark.createDataFrame([("abc",), ("ab",)], ["w"])
    got = {r.w: r.p for r in df.select("w", text.char_pairs(F.col("w")).alias("p")).collect()}
    assert got["abc"] == ["ab", "bc"]
    assert got["ab"] == ["ab"]


def test_semantic_dedup_arrow_matches_sql_kernel(spark):
    # differential: the Gram-matrix kernel and the relational fold-cosine
    # kernel must agree on randomized vectors
    import random

    rng = random.Random(7)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0] + [0.0] * 7), (1, [0.0, 1.0] + [0.0] * 6), (2, [0.0] * 7 + [1.0])],
        "cell int, centroid array<double>",
    )
    a = sorted(map(tuple, sim_ops.semantic_dedup(emb, cents, 0.6, kernel="arrow").collect()))
    s = sorted(map(tuple, sim_ops.semantic_dedup(emb, cents, 0.6, kernel="sql").collect()))
    assert a == s
