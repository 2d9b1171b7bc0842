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


# ---------------------------------------------------------------------------
# hypothesis property tests
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]


def _ref_jaccard(a: str, b: str, n: int = 3) -> float:
    def sh(t):
        toks = t.split()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sa, sb = sh(a), sh(b)
    if not sa or not sb:
        return 0.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    st.lists(
        st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(" ".join),
        min_size=1,
        max_size=6,
    ),
)
def test_incremental_dedup_property(spark, delta_texts, index_texts):
    """Verdicts on random corpora match a reference recomputation: exact_dup
    iff the text appears verbatim in the index; otherwise near_dup iff the
    max 3-gram Jaccard vs ANY index doc >= 0.5; max_jacc agrees to 1e-9."""
    from oco3_data_transformer_spark.operators import dedup as dedup_ops

    delta = spark.createDataFrame(
        [(i, t) for i, t in enumerate(delta_texts)], ["doc_id", "text"]
    )
    index = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(index_texts)], ["doc_id", "text"]
    )
    got = {
        r.id: (r.verdict, r.max_jacc)
        for r in dedup_ops.incremental_dedup(delta, index, "doc_id", "text").collect()
    }
    assert set(got) == set(range(len(delta_texts)))
    for i, t in enumerate(delta_texts):
        mj = max((_ref_jaccard(t, it) for it in index_texts), default=0.0)
        if t in index_texts:
            want = "exact_dup"
        elif mj >= 0.5:
            want = "near_dup"
        else:
            want = "new"
        assert got[i][0] == want, (t, got[i], mj)
        assert abs(got[i][1] - mj) < 1e-9


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=50000),  # cents
        ),
        min_size=2,
        max_size=40,
    )
)
def test_zscore_reference(spark, rows):
    """q91's integer z-score formula matches numpy's population z-score on
    random 2-dp values (within float tolerance), and is exactly 0-mean."""
    import numpy as np
    from oco3_data_transformer_spark.catalog import REGISTRY  # noqa: F401

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, k, c) for i, (k, c) in enumerate(rows)], ["id", "k", "c"]
    )
    stats = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    var_num = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    out = df.join(F.broadcast(stats), "k").select(
        "id",
        "k",
        F.when(
            var_num > 0,
            (F.col("c") * F.col("n") - F.col("s")) / F.sqrt(var_num.cast("double")),
        ).alias("z"),
    )
    got = {r.id: (r.k, r.z) for r in out.collect()}
    by_key: dict[str, list[tuple[int, int]]] = {}
    for i, (k, c) in enumerate(rows):
        by_key.setdefault(k, []).append((i, c))
    for k, members in by_key.items():
        cs = np.array([c for _, c in members], dtype=np.float64)
        sd = cs.std()  # population
        for i, c in members:
            z = got[i][1]
            if sd == 0:
                assert z is None  # explicit guard: undefined, not NaN/error
            else:
                assert abs(z - (c - cs.mean()) / sd) < 1e-6


def test_containment_catches_quote_that_jaccard_misses(spark):
    short = "alpha beta gamma delta epsilon zeta"
    long_doc = (
        "intro words before the quote start here now " + short +
        " and then a very long tail of unrelated material continues " +
        "with many more words padding out the document so the union is large " +
        "making the symmetric overlap small relative to the combined size"
    )
    docs = spark.createDataFrame([(1, short), (2, long_doc)], ["doc_id", "text"])
    cont = {
        (r.id_sub, r.id_super): r.containment
        for r in dedup_ops.containment_pairs(docs, "doc_id", "text", 3, 0.6).collect()
    }
    jacc = dedup_ops.ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.5).collect()
    assert cont[(1, 2)] == 1.0  # the short doc is fully contained
    assert (2, 1) not in cont  # the long doc is not contained in the short
    assert jacc == []  # symmetric Jaccard misses the pair entirely


def test_hard_negatives_arrow_matches_sql_and_excludes_labels(spark):
    import random

    rng = random.Random(11)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)], i % 3) for i in range(90)],
        "vec_id long, embedding array<double>, label int",
    )
    q = emb.filter(F.col("vec_id") < 4)
    a = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in sim_ops.hard_negatives(emb, q, k=4, kernel="arrow").collect()
    )
    s = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in sim_ops.hard_negatives(emb, q, k=4, kernel="sql").collect()
    )
    assert a == s and len(a) == 16
    # exclusion is exact: no neighbor shares its query's label (label = id%3)
    for qid, _, nid in a:
        assert nid % 3 != qid % 3


def test_hard_negatives_zero_norm_vector_never_ranks_first(spark):
    """A zero-norm corpus vector would yield NaN cosine, and NaN sorts
    ABOVE every real value under desc — unguarded it becomes the #1 hard
    negative for every query. The clamp pins its cosine to ~0 instead."""
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0], 0),  # the query
            (1, [0.0, 0.0, 0.0], 1),  # zero-norm garbage
            (2, [0.9, 0.1, 0.0], 1),  # genuinely similar, different label
            (3, [0.0, 1.0, 0.0], 1),  # orthogonal
        ],
        "vec_id long, embedding array<double>, label int",
    )
    q = emb.filter(F.col("vec_id") == 0)
    got = sorted(
        (r.rank, r.neighbor_id)
        for r in sim_ops.hard_negatives(emb, q, k=3, kernel="arrow").collect()
    )
    assert got[0] == (1, 2)  # the real near-neighbor wins rank 1
    import math

    for r in sim_ops.hard_negatives(emb, q, k=3, kernel="arrow").collect():
        assert not math.isnan(r.cos)


def test_semantic_dedup_zero_norm_vectors_are_inert(spark):
    """Zero-norm vectors must neither crash the Gram kernel nor spuriously
    drop real vectors; two zero vectors have clamp-cosine 0 (< threshold),
    so both are kept."""
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.001]),  # near-dup of 1 -> dropped
            (3, [0.0, 0.0]),
            (4, [0.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame([(0, [0.5, 0.5])], "cell int, centroid array<double>")
    flags = {
        r.vec_id: r.dropped
        for r in sim_ops.semantic_dedup_flags(emb, cents, 0.95, kernel="arrow").collect()
    }
    assert flags == {1: False, 2: True, 3: False, 4: False}
