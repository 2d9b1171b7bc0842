"""Sketch-operator properties: estimator accuracy, the count-min
over-estimate invariant, partitioning-invariance (the merge contract), and
a hand-computed bigram-LM golden."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from oco3_data_transformer_spark.operators import corpus as corpus_ops
from oco3_data_transformer_spark.operators import sketch


def _values_df(spark, groups: dict[str, int]):
    """One row per (group, v_i) with exactly groups[g] distinct values."""
    rows = [(g, f"{g}-val-{i}") for g, n in groups.items() for i in range(n)]
    return spark.createDataFrame(rows, "g string, v string")


def test_kmins_estimate_within_error_bound(spark):
    # stderr ~ n/sqrt(k) = 12.5% at k=64; 3 sigma ~ 38%. Deterministic
    # hash, so this is a fixed-outcome check, not a flaky statistical one.
    df = _values_df(spark, {"a": 1000, "b": 5000, "c": 200})
    out = {
        r.g: r.est_distinct
        for r in sketch.kmins_distinct(df, ["g"], F.col("v")).collect()
    }
    for g, n in {"a": 1000, "b": 5000, "c": 200}.items():
        assert abs(out[g] - n) / n < 0.38, (g, out[g], n)


def test_kmins_partitioning_invariant(spark):
    # The merge contract: elementwise min is associative/commutative, so
    # the estimate cannot depend on how rows are split across partitions.
    df = _values_df(spark, {"a": 700})
    one = sketch.kmins_distinct(df.coalesce(1), ["g"], F.col("v")).collect()
    many = sketch.kmins_distinct(df.repartition(13), ["g"], F.col("v")).collect()
    assert one == many


def test_kmins_duplicates_do_not_move_estimate(spark):
    # Cardinality, not frequency: replicating every value 5x leaves each
    # permutation's min (hence the estimate) unchanged.
    df = _values_df(spark, {"a": 400})
    dup = df.withColumn("r", F.explode(F.sequence(F.lit(1), F.lit(5)))).drop("r")
    a = sketch.kmins_distinct(df, ["g"], F.col("v")).collect()
    b = sketch.kmins_distinct(dup, ["g"], F.col("v")).collect()
    assert a == b


def test_countmin_never_underestimates(spark):
    # The CMS invariant: est >= true count for EVERY key, even at a width
    # narrow enough to force collisions (97 buckets for 600 keys).
    rows = [(f"key-{i % 600}",) for i in range(3000)]
    df = spark.createDataFrame(rows, "k string")
    grid = sketch.countmin_build(df, F.col("k"), depth=4, width=97)
    keys = df.distinct()
    est = sketch.countmin_estimate(grid, keys, "k", depth=4, width=97)
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"))
    joined = est.join(exact, "k").collect()
    assert len(joined) == 600
    assert all(r.est_cnt >= r.cnt for r in joined)
    # and some collision inflation must exist at this width
    assert any(r.est_cnt > r.cnt for r in joined)


def test_countmin_exact_when_wide(spark):
    # With width >> keys and 4 independent rows, the min-over-depth kills
    # residual collisions: estimates equal exact counts.
    rows = [(f"key-{i % 50}",) for i in range(500)]
    df = spark.createDataFrame(rows, "k string")
    grid = sketch.countmin_build(df, F.col("k"), depth=4, width=8192)
    est = sketch.countmin_estimate(grid, df.distinct(), "k", depth=4, width=8192)
    assert all(r.est_cnt == 10 for r in est.collect())


def test_countmin_grid_bounded(spark):
    # The scale contract: grid rows <= depth * width no matter the input.
    rows = [(f"key-{i}",) for i in range(5000)]
    df = spark.createDataFrame(rows, "k string")
    grid = sketch.countmin_build(df, F.col("k"), depth=3, width=64)
    assert grid.count() <= 3 * 64


def test_bigram_lm_golden(spark):
    # Train: "a b a b" -> unigrams {a:2, b:2}, V=2; bigrams {"a b":2, "b a":1}
    train = spark.createDataFrame([(0, "a b a b")], "doc_id long, text string")
    # Score doc 1: "a b c": bigrams "a b" (c2=2, c1(a)=2) and "b c" (c2=0,
    # c1(b)=2) -> lp = ln(3/4) + ln(1/4); doc 3: "c c" -> OOV history:
    # ln((0+1)/(0+2)) = ln(1/2)
    score = spark.createDataFrame(
        [(1, "a b c"), (3, "c c")], "doc_id long, text string"
    )
    out = {
        r.doc_id: (r.n_bigrams, r.avg_nll)
        for r in corpus_ops.bigram_lm_nll(train, score, "text", "doc_id").collect()
    }
    exp1 = round(-(math.log(3 / 4) + math.log(1 / 4)) / 2, 4)
    exp3 = round(-math.log(1 / 2), 4)
    assert out == {1: (2, exp1), 3: (1, exp3)}


def _toy_embeddings(spark, n=40, dim=16):
    import math as _m

    rows = [
        (i, [float(_m.sin(i * 31 + j * 7)) for j in range(dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pq_encode_covers_and_seeds_are_exact(spark):
    from oco3_data_transformer_spark.operators import similarity as sim

    emb = _toy_embeddings(spark)
    books = sim.pq_codebooks(emb, m=4, dsub=4, n_codes=8)
    assert books.count() == 4 * 8
    enc = sim.pq_encode(emb, books, dsub=4)
    rows = enc.collect()
    # every (vector, subspace) encoded exactly once, codes in range
    assert len(rows) == 40 * 4
    assert all(0 <= r.code < 8 for r in rows)
    # a seed vector quantizes to itself: zero error in every subspace
    zero = [r for r in rows if r.dist == 0.0]
    assert len(zero) >= 8 * 4  # the 8 seeds hit their own codeword per subspace


def test_pq_adc_ranks_are_dense_and_monotone(spark):
    from oco3_data_transformer_spark.operators import similarity as sim

    emb = _toy_embeddings(spark)
    books = sim.pq_codebooks(emb, m=4, dsub=4, n_codes=8)
    codes = sim.pq_encode(emb, books, dsub=4).select("vec_id", "subspace", "code")
    out = sim.pq_adc_knn(
        codes, books, emb.filter(F.col("vec_id") < 3), k=5, dsub=4
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == [1, 2, 3, 4, 5]
        dists = [r.adist for r in rs]
        assert dists == sorted(dists)
        assert all(r.neighbor_id != q for r in rs)


def test_pq_codebooks_partitioning_invariant(spark):
    from oco3_data_transformer_spark.operators import similarity as sim

    emb = _toy_embeddings(spark)
    a = sorted(map(tuple, sim.pq_codebooks(emb.coalesce(1), m=4, dsub=4, n_codes=8).collect()))
    b = sorted(map(tuple, sim.pq_codebooks(emb.repartition(9), m=4, dsub=4, n_codes=8).collect()))
    assert a == b


def test_pq_encode_kernels_agree(spark):
    # arrow (zero-shuffle numpy) vs sql (oracle reference): identical codes,
    # distances equal to fp round-off
    from oco3_data_transformer_spark.operators import similarity as sim

    emb = _toy_embeddings(spark, n=60, dim=16)
    books = sim.pq_codebooks(emb, m=4, dsub=4, n_codes=8)
    a = {
        (r.vec_id, r.subspace): (r.code, r.dist)
        for r in sim.pq_encode(emb, books, dsub=4, kernel="arrow").collect()
    }
    s = {
        (r.vec_id, r.subspace): (r.code, r.dist)
        for r in sim.pq_encode(emb, books, dsub=4, kernel="sql").collect()
    }
    assert set(a) == set(s)
    for key in s:
        assert a[key][0] == s[key][0], key
        assert abs(a[key][1] - s[key][1]) < 1e-9, key


def test_pq_encode_array_layout_matches_long(spark):
    # layout='array' packs the same codes, one row per vector, codes[s]
    # ordered by subspace
    from oco3_data_transformer_spark.operators import similarity as sim

    emb = _toy_embeddings(spark, n=60, dim=16)
    books = sim.pq_codebooks(emb, m=4, dsub=4, n_codes=8)
    long = {
        (r.vec_id, r.subspace): r.code
        for r in sim.pq_encode(emb, books, dsub=4).collect()
    }
    arr = {
        r.vec_id: list(r.codes)
        for r in sim.pq_encode(emb, books, dsub=4, layout="array").collect()
    }
    assert set(arr) == {v for v, _ in long}
    for vec_id, codes in arr.items():
        assert codes == [long[(vec_id, s)] for s in range(4)]


def test_pq_adc_knn_layouts_bit_identical(spark):
    # the array-layout row-local fold must reproduce the long layout's
    # adist BIT-identically (same subspace fold order), hence same ranks
    from oco3_data_transformer_spark.operators import similarity as sim

    emb = _toy_embeddings(spark, n=60, dim=16)
    books = sim.pq_codebooks(emb, m=4, dsub=4, n_codes=8)
    queries = emb.filter(F.col("vec_id") < 5)
    long_codes = sim.pq_encode(emb, books, dsub=4).select(
        "vec_id", "subspace", "code"
    )
    arr_codes = sim.pq_encode(emb, books, dsub=4, layout="array")
    a = sorted(
        map(
            tuple,
            sim.pq_adc_knn(
                long_codes, books, queries, k=4, dsub=4, n_codes=8
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            sim.pq_adc_knn(
                arr_codes, books, queries, k=4, dsub=4, n_codes=8
            ).collect(),
        )
    )
    assert a == b  # exact equality including the double adist


def test_histogram_sketch_bounded_and_merge_is_addition(spark):
    rows = [("g", float(i % 977)) for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, v double")
    hist = sketch.histogram_sketch(df, ["g"], F.col("v"), 64, 8)
    got = {r.bin: r.cnt for r in hist.collect()}
    assert set(got) <= set(range(8))  # tail clamps into the last bin
    # merge contract: histograms of two halves ADD to the full histogram
    h1 = sketch.histogram_sketch(
        spark.createDataFrame(rows[:2500], "g string, v double"), ["g"], F.col("v"), 64, 8
    )
    h2 = sketch.histogram_sketch(
        spark.createDataFrame(rows[2500:], "g string, v double"), ["g"], F.col("v"), 64, 8
    )
    merged = (
        h1.unionByName(h2).groupBy("g", "bin").agg(F.sum("cnt").alias("cnt"))
    )
    assert {r.bin: r.cnt for r in merged.collect()} == got


def test_histogram_quantile_brackets_exact(spark):
    # estimate must land within one bin width of the exact quantile
    rows = [("g", float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "g string, v double")
    hist = sketch.histogram_sketch(df, ["g"], F.col("v"), 32, 64)
    for q, exact in [(0.5, 499.5), (0.9, 899.1)]:
        est = sketch.histogram_quantile(hist, ["g"], q, 32).collect()[0].est_q
        assert abs(est - exact) <= 32, (q, est, exact)


def test_bloom_never_false_negative(spark):
    build = spark.createDataFrame([(f"m-{i}",) for i in range(80)], "k string")
    probe = spark.createDataFrame(
        [(f"m-{i}",) for i in range(80)] + [(f"x-{i}",) for i in range(900)],
        "k string",
    )
    bits = sketch.bloom_build(build, F.col("k"), n_bits=512, n_hashes=3)
    mem = sketch.bloom_membership(probe, bits, F.col("k"), n_bits=512, n_hashes=3)
    rows = mem.collect()
    members = {r.k for r in rows if r.k.startswith("m-")}
    assert all(r.bloom_pass for r in rows if r.k.startswith("m-"))  # no FN ever
    assert len(members) == 80
    # filter sized to produce SOME false positives at this load factor
    fps = [r for r in rows if r.k.startswith("x-") and r.bloom_pass]
    assert 0 < len(fps) < 900


def test_ivfpq_subset_of_adc_on_probed_cells(spark):
    # IVF-PQ must equal plain ADC restricted to the probed cells: the
    # routing only FILTERS candidates, never changes a distance
    from oco3_data_transformer_spark.operators import similarity as sim

    emb = _toy_embeddings(spark, n=50, dim=16)
    emb = emb.withColumn("label", (F.col("vec_id") % 4).cast("int"))
    cents = emb.groupBy(F.col("label").alias("cell")).agg(
        F.min_by("embedding", "vec_id").alias("centroid")
    )
    assigned = sim.ivf_assign(emb.select("vec_id", "embedding"), cents)
    books = sim.pq_codebooks(emb, m=4, dsub=4, n_codes=8)
    codes = sim.pq_encode(emb, books, dsub=4).select("vec_id", "subspace", "code")
    queries = emb.filter(F.col("vec_id") < 3)
    out = sim.ivfpq_knn(
        codes, assigned, books, cents, queries, k=5, nprobe=2, dsub=4
    ).collect()
    # full ADC for comparison
    full = {
        (r.query_id, r.neighbor_id): r.adist
        for r in sim.pq_adc_knn(codes, books, queries, k=50, dsub=4).collect()
    }
    probed = {
        r.query_id: set()
        for r in out
    }
    for r in out:
        assert (r.query_id, r.neighbor_id) in full
        assert abs(full[(r.query_id, r.neighbor_id)] - r.adist) < 1e-12
        probed[r.query_id].add(r.neighbor_id)
    for q, rs in probed.items():
        assert 0 < len(rs) <= 5


def test_countmin_absent_keys_estimate_zero(spark):
    # a probe key outside the sketched corpus with at least one empty cell
    # must estimate exactly 0 (an empty cell PROVES count 0) — the left
    # join + coalesce path
    corpus = spark.createDataFrame([(f"in-{i}",) for i in range(20)], "k string")
    grid = sketch.countmin_build(corpus, F.col("k"), depth=4, width=8192)
    probes = spark.createDataFrame([(f"out-{i}",) for i in range(50)], "k string")
    est = sketch.countmin_estimate(grid, probes, "k", depth=4, width=8192)
    rows = est.collect()
    assert len(rows) == 50
    assert all(r.est_cnt == 0 for r in rows)


def test_pq_kmeans_books_lloyd_decreases_quantization_error(spark):
    """pq_codebooks_kmeans: iters=0 returns the sampled books unchanged,
    and each Lloyd round is monotone — total squared quantization error
    never increases (the classic k-means guarantee, checked end-to-end
    through the Spark training pass + encode)."""
    import numpy as np

    from oco3_data_transformer_spark.operators import similarity as sim

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 16)]) for i in range(300)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    b0 = sim.pq_codebooks(emb, m=4, dsub=4, n_codes=8)
    b0_k = sim.pq_codebooks_kmeans(emb, m=4, dsub=4, n_codes=8, iters=0)
    assert sorted(map(tuple, b0.collect())) == sorted(map(tuple, b0_k.collect()))

    def total_qerr(books):
        enc = sim.pq_encode(emb, books, dsub=4)
        return enc.agg(F.sum("dist")).collect()[0][0]

    e0 = total_qerr(b0)
    e1 = total_qerr(sim.pq_codebooks_kmeans(emb, m=4, dsub=4, n_codes=8, iters=1))
    e3 = total_qerr(sim.pq_codebooks_kmeans(emb, m=4, dsub=4, n_codes=8, iters=3))
    assert e1 <= e0 + 1e-9
    assert e3 <= e1 + 1e-9
    assert e1 < e0  # and it actually moved on random data
