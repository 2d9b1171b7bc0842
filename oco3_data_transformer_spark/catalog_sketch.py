"""Catalog part 5: deterministic sketches and LM-based quality scoring —
the fixed-state aggregation layer (operators/sketch.py) plus the bigram-LM
perplexity filter (operators/corpus.py bigram_lm_nll).

Same conventions as catalog.py. The sketches are built from the committed
portable hash family, so their ESTIMATES (not just inputs) are bit-identical
between Spark and the DuckDB oracle — both engines build the same grid and
the same min-vector and therefore compute the same error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register
from .functions import hashing, text
from .operators import corpus as corpus_ops
from .operators import sketch as sketch_ops
from .sources.registry import load

CMS_DEPTH = 4
CMS_WIDTH = 1024  # narrow on purpose at test scale: ~14k keys / 1024 buckets
#                   makes collisions (and the min-over-depth recovery) visible
CMS_TOPK = 15

_SH3_SQL = text.word_ngrams_sql("text", 3)


def _cms_bucket_sql(d: int) -> str:
    """DuckDB expression for row-``d``'s bucket of hash column ``__b``."""
    return f"({hashing.minhash_value_sql('__b', d)}) % {CMS_WIDTH}"


_CMS_BUCKET_CASE = (
    "CASE dd.d "
    + " ".join(f"WHEN {i} THEN {_cms_bucket_sql(i)}" for i in range(CMS_DEPTH))
    + " END"
)


@register(
    "q106_kmins_distinct",
    f"""
    WITH sh AS (
        SELECT lang, unnest({_SH3_SQL}) AS shingle FROM documents),
    est AS ({sketch_ops.kmins_distinct_sql('sh', ['lang'], 'shingle')}),
    ex AS (
        SELECT lang, CAST(count(DISTINCT shingle) AS BIGINT) AS exact_distinct
        FROM sh GROUP BY 1)
    SELECT lang, est_distinct, exact_distinct,
           round(abs(est_distinct - exact_distinct) / exact_distinct, 4)
               AS rel_err
    FROM est JOIN ex USING (lang)
    """,
    doc="k-mins distinct-count sketch (Flajolet-Martin/Cohen lineage) over "
    "per-language 3-gram shingles, vs the exact count it replaces. The "
    "production sketch (operators/sketch.py kmins_distinct, the streaming "
    "sink's form) is ONE map-side-combined hash aggregate whose per-group "
    "state is 64 int64 mins — nothing key-proportional crosses the "
    "shuffle. THIS query also carries the exact count(distinct) branch "
    "(error exhibit: rel_err ~ 1/sqrt(k) ~ 12.5% at k=64), which "
    "unavoidably shuffles every distinct shingle — so here the sketch "
    "mins and the exact count are computed in ONE aggregate over that "
    "same distinct exchange: min over distinct (lang, shingle) pairs is "
    "identical to min over occurrences, and the md5+64-permutation "
    "projection runs on distinct rows only (r10: one tokenize pass and "
    "|distinct| hashings instead of two passes and |occurrences| "
    "hashings; sf1 14.7 s -> 5.6 s). "
    "Estimates are bit-identical cross-engine: integer min-sum formed "
    "exactly in int64, ONE double division.",
)
def q106(spark: SparkSession, sf: str) -> DataFrame:
    # pre-exchange doc-count rows on the unique id so the CPU-heavy
    # tokenize/explode (and the partial distinct fused into its stage)
    # spreads across all cores regardless of scan split count — the
    # hashed_shingle_table discipline (r10: the 5.8 MB sf1 parquet file
    # yields ~2 splits at the tuned 4 MB maxPartitionBytes, serializing
    # a measured 3.4 s explode onto 2 cores)
    docs = load(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    sh = docs.select(
        "lang", F.explode(text.word_ngrams(F.col("text"), 3)).alias("shingle")
    )
    # Distinct (lang, shingle) pairs feed ONE aggregate computing BOTH the
    # 64 sketch mins AND the exact distinct count (min-over-distinct ==
    # min-over-all; count over distinct pairs == count(distinct)). A
    # two-branch est-join-exact form plans the tokenize+explode+distinct
    # subtree twice — static exchange reuse does not fire across the
    # branches (checked: 0 ReusedExchange) — so the branches are merged
    # into a single pass instead (r10).
    pairs = sh.distinct()
    # expr-built permutation mins: identical aggregates, ~10x less Py4J
    # build chatter (see q111)
    base_sql = hashing.portable_hash28_spark_sql("shingle")
    agg = pairs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("exact_distinct"),
        *[
            F.expr(f"min({hashing.kmins_value_spark_sql(base_sql, i)})").alias(f"__m{i}")
            for i in range(_KM_K)
        ],
    )
    rel = F.round(
        F.abs(F.col("est_distinct") - F.col("exact_distinct"))
        / F.col("exact_distinct"),
        4,
    )
    return agg.select(
        "lang", sketch_ops.kmins_estimate_col(), "exact_distinct"
    ).select("lang", "est_distinct", "exact_distinct", rel.alias("rel_err"))


@register(
    "q107_countmin_heavy",
    f"""
    WITH sh AS (SELECT unnest({_SH3_SQL}) AS shingle FROM documents),
    hashed AS (
        SELECT shingle, {hashing.portable_hash28_sql('shingle')} AS __b
        FROM sh),
    dd AS (SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS d),
    grid AS (
        SELECT d, bucket, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT dd.d AS d, {_CMS_BUCKET_CASE} AS bucket
              FROM hashed CROSS JOIN dd)
        GROUP BY 1, 2),
    cand AS (SELECT DISTINCT shingle, __b FROM hashed),
    est AS (
        SELECT shingle, min(cnt) AS est_cnt
        FROM (SELECT c.shingle, dd.d AS d, {_CMS_BUCKET_CASE} AS bucket
              FROM cand c CROSS JOIN dd) cells
        JOIN grid USING (d, bucket)
        GROUP BY 1),
    top AS (
        SELECT shingle, est_cnt FROM est
        ORDER BY est_cnt DESC, shingle LIMIT {CMS_TOPK}),
    ex AS (
        SELECT shingle, CAST(count(*) AS BIGINT) AS exact_cnt
        FROM sh GROUP BY 1)
    SELECT t.shingle, t.est_cnt, ex.exact_cnt,
           t.est_cnt - ex.exact_cnt AS overcount
    FROM top t JOIN ex USING (shingle)
    """,
    doc="Count-min heavy hitters (Cormode-Muthukrishnan) over corpus "
    "shingles: 4x1024 counter grid, estimate = min over the 4 hashed "
    "cells, top-15 by estimate then exact counts joined back to show the "
    "collision overcount (width deliberately narrow at test scale so "
    "overcount > 0 rows exist and the oracle checks the BIAS, not just "
    "the counts). Scale shape: the grid build is one map-side-combined "
    "aggregate whose output is d*w = 4096 rows REGARDLESS of corpus size "
    "— each partition reduces to <= 4096 partials before the exchange; "
    "the estimate join broadcasts the grid (it can never outgrow d*w); "
    "top-15 plans as TakeOrdered, not a global sort. The committed "
    "MinHash permutations are the row hashes, so Spark and DuckDB build "
    "the identical grid and identical estimates.",
)
def q107(spark: SparkSession, sf: str) -> DataFrame:
    # id-hash pre-exchange spreads the tokenize stage (see q106)
    docs = load(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    sh = docs.select(F.explode(text.word_ngrams(F.col("text"), 3)).alias("shingle"))
    # The exact-count exhibit aggregate is computed first; the grid
    # (weighted build — sum of per-key counts == count over the raw
    # stream) and the probe both hang off it, and the probe CARRIES
    # exact_cnt through the estimate so the result needs no third
    # evaluation of the aggregate (r10; the committed before-plan shows
    # the scan+explode+exchange+agg tree three times — static exchange
    # reuse does not fire across the branches). The md5 row-hash runs
    # once per DISTINCT shingle, not per occurrence; the probe's
    # per-shingle min rides the exact aggregate's hash partitioning
    # (broadcast join preserves it), adding no exchange.
    exact = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("exact_cnt"))
    grid = sketch_ops.countmin_build(
        exact,
        F.col("shingle"),
        depth=CMS_DEPTH,
        width=CMS_WIDTH,
        weight_col=F.col("exact_cnt"),
    )
    est = sketch_ops.countmin_estimate(
        grid,
        exact,
        "shingle",
        depth=CMS_DEPTH,
        width=CMS_WIDTH,
        carry=["exact_cnt"],
    )
    return (
        est.orderBy(F.col("est_cnt").desc(), "shingle")
        .limit(CMS_TOPK)
        .select(
            "shingle",
            "est_cnt",
            "exact_cnt",
            (F.col("est_cnt") - F.col("exact_cnt")).alias("overcount"),
        )
    )


_TOKS_SQL = text.tokens_sql("text")
_BG_SQL = text.word_ngrams_sql("text", 2)


@register(
    "q108_bigram_perplexity",
    f"""
    WITH uni AS (
        SELECT tok AS w1, CAST(count(*) AS BIGINT) AS c1
        FROM (SELECT unnest({_TOKS_SQL}) AS tok
              FROM documents WHERE doc_id % 2 = 0)
        GROUP BY 1),
    v AS (SELECT CAST(count(*) AS BIGINT) AS vocab FROM uni),
    bi AS (
        SELECT bg, CAST(count(*) AS BIGINT) AS c2
        FROM (SELECT unnest({_BG_SQL}) AS bg
              FROM documents WHERE doc_id % 2 = 0)
        GROUP BY 1),
    sb AS (
        SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1
        FROM (SELECT doc_id, unnest({_BG_SQL}) AS bg
              FROM documents WHERE doc_id % 2 = 1)),
    j AS (
        SELECT doc_id,
               ln((coalesce(c2, 0) + 1)
                  / CAST(coalesce(c1, 0) + vocab AS DOUBLE)) AS lp
        FROM sb LEFT JOIN bi USING (bg) LEFT JOIN uni USING (w1)
        CROSS JOIN v)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(-sum(lp) / count(*), 4) AS avg_nll
    FROM j GROUP BY 1
    ORDER BY avg_nll DESC, doc_id LIMIT 20
    """,
    doc="Bigram-LM perplexity filter (the CCNet/Gopher quality signal): "
    "add-one-smoothed bigram model trained on the even-doc_id half of the "
    "corpus, the odd half scored by average negative log-likelihood; the "
    "20 most-surprising docs surface (the ones a perplexity filter "
    "drops). The model IS two count tables — one training scan collapses "
    "map-side into vocab-sized unigram/bigram aggregates, the scoring "
    "scan left-joins both as broadcasts plus a one-row vocab cross join; "
    "for a web-scale bigram table beyond the broadcast ceiling the same "
    "plan falls back to two shuffle joins keyed on the n-gram, nothing "
    "else changes. Top-20 plans as TakeOrdered on (avg_nll, doc_id), not "
    "a global sort.",
)
def q108(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    score = docs.filter(F.col("doc_id") % 2 == 1)
    nll = corpus_ops.bigram_lm_nll(train, score, "text", "doc_id")
    return nll.orderBy(F.col("avg_nll").desc(), "doc_id").limit(20)


# ---------------------------------------------------------------------------
# Product quantization (vector sketching): the compression layer of the ANN
# family (q34 exact / q40 IVF / q46 SRP-LSH) — codes instead of floats.
# ---------------------------------------------------------------------------

PQ_M = 8       # subspaces (64-dim -> 8 slices of 8)
PQ_DSUB = 8
PQ_CODES = 16  # codewords per subspace -> 4 bits/code, 8 B per vector
PQ_K = 5

from .functions import vector as vector_fns  # noqa: E402
from .operators import similarity as sim_ops  # noqa: E402

_PQ_SEED_H = hashing.portable_hash64_sql("CAST(vec_id AS VARCHAR) || ':pq-seed'")


def _pq_books_sql() -> str:
    """CTE body for the deterministic codebooks (mirrors sim_ops.pq_codebooks)."""
    slc = f"list_slice(__v, ss.s * {PQ_DSUB} + 1, ss.s * {PQ_DSUB} + {PQ_DSUB})"
    return f"""
    seeds AS (
        SELECT vec_id AS __id, embedding AS __v, {_PQ_SEED_H} AS __h
        FROM embeddings ORDER BY __h, __id LIMIT {PQ_CODES}),
    coded AS (
        SELECT __v,
               CAST(row_number() OVER (ORDER BY __h, __id) AS INT) - 1 AS code
        FROM seeds),
    books AS (
        SELECT CAST(ss.s AS INT) AS subspace, code,
               list_transform({slc}, x -> CAST(x AS DOUBLE)) AS codeword
        FROM coded CROSS JOIN
             (SELECT unnest(generate_series(0, {PQ_M - 1})) AS s) ss)
    """


_PQ_ENC_SQL = f"""
    enc0 AS (
        SELECT e.vec_id, b.subspace, b.code,
               {vector_fns.l2sq_sql(
                   f"list_slice(e.embedding, b.subspace * {PQ_DSUB} + 1,"
                   f" b.subspace * {PQ_DSUB} + {PQ_DSUB})",
                   "b.codeword")} AS dist
        FROM embeddings e CROSS JOIN books b),
    enc AS (
        SELECT vec_id, subspace,
               min({{'dist': dist, 'code': code}}) AS mm
        FROM enc0 GROUP BY 1, 2)
    """


@register(
    "q109_pq_encode",
    f"""
    WITH {_pq_books_sql().strip()},
    {_PQ_ENC_SQL.strip()}
    SELECT vec_id, subspace, mm.code AS code, round(mm.dist, 6) AS qerr
    FROM enc
    """,
    doc="Product-quantization encode (Jegou et al. 2011): each 64-dim "
    "vector becomes 8 sub-codes (argmin codeword per 8-dim subspace) — "
    "the compression layer under Faiss-style IVFPQ that lets 100 TB of "
    "embeddings live memory-resident (8 B/vector at these parameters, "
    "32x smaller than float32). Codebooks are the hash-ranked sample "
    "slices (deterministic; production swaps in per-subspace k-means = "
    "q50's build per slice, same plan shape). Scale shape: books "
    "broadcast (m*k rows always), the argmin is min(struct(dist, code)) "
    "— a MAP-SIDE-combining aggregate, not a rank window, so the only "
    "corpus-sized exchange is the (vec, subspace) key; ties break to the "
    "smallest code identically in both engines (lexicographic struct "
    "compare over bit-identical sequential-fold doubles).",
)
def q109(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    books = sim_ops.pq_codebooks(
        emb, m=PQ_M, dsub=PQ_DSUB, n_codes=PQ_CODES
    )
    enc = sim_ops.pq_encode(emb, books, dsub=PQ_DSUB, kernel="sql")
    return enc.select(
        "vec_id", "subspace", "code", F.round("dist", 6).alias("qerr")
    )


@register(
    "q110_pq_adc_knn",
    f"""
    WITH {_pq_books_sql().strip()},
    {_PQ_ENC_SQL.strip()},
    q AS (SELECT vec_id AS query_id, embedding AS q_vec
          FROM embeddings WHERE vec_id < 10),
    lut AS (
        SELECT q.query_id, b.subspace, b.code,
               {vector_fns.l2sq_sql(
                   f"list_slice(q.q_vec, b.subspace * {PQ_DSUB} + 1,"
                   f" b.subspace * {PQ_DSUB} + {PQ_DSUB})",
                   "b.codeword")} AS d
        FROM q CROSS JOIN books b),
    folded AS (
        SELECT query_id, vec_id,
               list_sum(list_transform(
                   list_sort(list({{'s': subspace, 'd': d}})),
                   x -> x.d)) AS adist
        FROM (SELECT vec_id, subspace, mm.code AS code FROM enc) c
        JOIN lut USING (subspace, code)
        WHERE vec_id <> query_id
        GROUP BY 1, 2),
    ranked AS (
        SELECT query_id, vec_id AS neighbor_id, adist,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY adist, vec_id) AS INT)
                   AS rank
        FROM folded)
    SELECT query_id, neighbor_id, rank, round(adist, 6) AS adist
    FROM ranked WHERE rank <= {PQ_K}
    """,
    doc="Asymmetric-distance (ADC) top-k over PQ codes: the query stays "
    "exact, the corpus is 8-byte codes; approx dist = sum over subspaces "
    "of the query-to-codeword table entry. The per-query lookup table "
    "(|q|*m*k rows) broadcasts, the code table equi-joins it — at 100 TB "
    "the scan reads CODES (32x less IO than float vectors), which is the "
    "entire point of PQ serving. The per-vector sum folds its 8 subspace "
    "terms in SORTED subspace order (collect -> sort -> fold) so the "
    "double total is bit-identical cross-engine — a plain SUM would add "
    "in partition order and flip equal-distance ranks. Top-k is a "
    "per-query rank window, never a global sort.",
)
def q110(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    books = sim_ops.pq_codebooks(
        emb, m=PQ_M, dsub=PQ_DSUB, n_codes=PQ_CODES
    )
    # array layout (r10): one row per vector, ADC fold is row-local —
    # no per-(query, vector) aggregate, m x fewer join rows
    enc = sim_ops.pq_encode(emb, books, dsub=PQ_DSUB, layout="array")
    queries = emb.filter(F.col("vec_id") < 10)
    out = sim_ops.pq_adc_knn(
        enc, books, queries, k=PQ_K, dsub=PQ_DSUB, n_codes=PQ_CODES
    )
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"),
        F.round("adist", 6).alias("adist"),
    )


_KM_K = sketch_ops.KMINS_K
_KM_UNION_MINS = ", ".join(f"min(__m{i}) AS __m{i}" for i in range(_KM_K))


@register(
    "q111_sketch_setops",
    f"""
    WITH sh AS (
        SELECT doc_id % 2 AS half, unnest({_SH3_SQL}) AS shingle
        FROM documents),
    sk AS ({sketch_ops.kmins_sketch_sql('sh', ['half'], 'shingle')}),
    u AS (SELECT {_KM_UNION_MINS} FROM sk),
    e AS (SELECT half, {sketch_ops.kmins_estimate_sql()} AS est FROM sk),
    eu AS (SELECT {sketch_ops.kmins_estimate_sql()} AS est_union FROM u),
    ov AS (
        SELECT CAST(count(*) AS BIGINT) AS exact_overlap
        FROM (SELECT shingle FROM sh
              GROUP BY shingle HAVING count(DISTINCT half) = 2))
    SELECT e0.est AS est_even, e1.est AS est_odd, eu.est_union,
           round(e0.est + e1.est - eu.est_union, 2) AS est_overlap,
           ov.exact_overlap
    FROM (SELECT est FROM e WHERE half = 0) e0,
         (SELECT est FROM e WHERE half = 1) e1, eu, ov
    """,
    doc="Sketch set-operation estimates: distinct-shingle cardinality of "
    "two corpus halves, their UNION (elementwise min-merge of the two "
    "sketches — exact sketch algebra, no rescan), and their INTERSECTION "
    "by inclusion-exclusion, against the exact overlap for error exhibit. "
    "This is why mergeable sketches matter at 100 TB: per-partition (or "
    "per-day, per-source) sketches persisted once can answer any later "
    "cross-slice distinct/union/overlap question in milliseconds from "
    "k-vector state — the same merge the streaming sink "
    "(streaming/sketch_stream.py) applies incrementally. Here the whole "
    "query is ONE linear plan (r10): a shingle-keyed aggregate records "
    "which halves each distinct shingle appears in, then one global "
    "aggregate computes all three min-vectors (conditional mins for the "
    "halves, unconditional for the union — exactly the elementwise "
    "min-merge) plus the exact overlap; one tokenize pass, md5 on "
    "|distinct| rows only, zero joins (sf1 13.2 s -> 4.4 s). The "
    "production sketch without the exhibit (kmins_sketch) stays the pure "
    "map-side form.",
)
def q111(spark: SparkSession, sf: str) -> DataFrame:
    # id-hash pre-exchange spreads the tokenize stage (see q106)
    docs = load(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    sh = docs.select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(text.word_ngrams(F.col("text"), 3)).alias("shingle"),
    )
    # ONE pass (r10): a shingle-keyed aggregate records which halves each
    # distinct shingle appears in, then a single global aggregate computes
    # all three 64-min vectors (even = min over shingles with has0, odd =
    # has1, union = unconditional — elementwise min-merge of the half
    # sketches IS the unconditional min) plus the exact overlap count
    # (shingles present in both halves). Value-identical to the per-half
    # sketch + min-merge + distinct-overlap form it replaces (min over
    # distinct (half, shingle) pairs == min over occurrences), but the
    # corpus is tokenized once, the md5 + 64-permutation projection runs
    # on |distinct shingle| rows, and the three-branch plan (which planned
    # the distinct subtree three times — 0 ReusedExchange) collapses to a
    # linear one with ZERO joins.
    per_sh = sh.groupBy("shingle").agg(
        F.max(F.when(F.col("half") == 0, 1).otherwise(0)).alias("has0"),
        F.max(F.when(F.col("half") == 1, 1).otherwise(0)).alias("has1"),
    )
    # the 3*64 conditional permutation mins are built as SQL strings (one
    # JVM parse each) — identical aggregate expressions to the composed
    # Columns they replace at ~10x less Py4J build chatter (the 2.8 s
    # sf1 "build" was driver-side construction, not compute)
    base_sql = hashing.portable_hash28_spark_sql("shingle")
    hv = [hashing.kmins_value_spark_sql(base_sql, i) for i in range(_KM_K)]
    glob = per_sh.agg(
        *[
            F.expr(f"min(CASE WHEN has0 = 1 THEN {hv[i]} END)").alias(f"__e{i}")
            for i in range(_KM_K)
        ],
        *[
            F.expr(f"min(CASE WHEN has1 = 1 THEN {hv[i]} END)").alias(f"__o{i}")
            for i in range(_KM_K)
        ],
        *[F.expr(f"min({hv[i]})").alias(f"__u{i}") for i in range(_KM_K)],
        F.sum(
            F.when((F.col("has0") == 1) & (F.col("has1") == 1), 1).otherwise(0)
        ).alias("exact_overlap"),
    )

    def _est_sql(prefix: str) -> str:
        msum = " + ".join(f"__{prefix}{i}" for i in range(_KM_K))
        return (
            f"round(CAST({_KM_K * hashing.MINHASH_PRIME} AS DOUBLE)"
            f" / ({msum}) - 1, 2)"
        )

    return glob.select(
        F.expr(_est_sql("e")).alias("est_even"),
        F.expr(_est_sql("o")).alias("est_odd"),
        F.expr(_est_sql("u")).alias("est_union"),
        F.expr(
            f"round(({_est_sql('e')}) + ({_est_sql('o')}) - ({_est_sql('u')}), 2)"
        ).alias("est_overlap"),
        "exact_overlap",
    )


# ---------------------------------------------------------------------------
# q113/q114 — the rest of the sketch quartet: quantiles and membership.
# ---------------------------------------------------------------------------

HIST_BIN_W = 64
HIST_BINS = 64
BLOOM_BITS = 1024
BLOOM_HASHES = 3

_HIST_SQL = f"""
    hist AS (
        SELECT lang,
               least(CAST(floor(n_chars / {HIST_BIN_W}) AS INT),
                     {HIST_BINS - 1}) AS bin,
               CAST(count(*) AS BIGINT) AS cnt
        FROM documents GROUP BY 1, 2)
    """


@register(
    "q113_histogram_quantiles",
    f"""
    WITH {_HIST_SQL.strip()},
    e50 AS ({sketch_ops.histogram_quantile_sql('hist', ['lang'], 0.5, HIST_BIN_W)}),
    e90 AS ({sketch_ops.histogram_quantile_sql('hist', ['lang'], 0.9, HIST_BIN_W)}),
    ex AS (
        SELECT lang,
               round(quantile_cont(n_chars, 0.50), 6) AS exact_p50,
               round(quantile_cont(n_chars, 0.90), 6) AS exact_p90
        FROM documents GROUP BY 1)
    SELECT lang, e50.est_q AS est_p50, e90.est_q AS est_p90,
           exact_p50, exact_p90
    FROM e50 JOIN (SELECT lang, est_q FROM e90) e90 USING (lang)
    JOIN ex USING (lang)
    """,
    doc="Histogram-sketch quantiles (the deterministic analog of "
    "percentile_approx's t-digest): per-language p50/p90 of document "
    "length estimated from a <= 64-bin fixed-width histogram, against the "
    "exact interpolated percentiles (q104's sort-based form) for error "
    "exhibit. The sketch is one map-side-combined aggregate whose "
    "per-group state is bounded by the bin count and merges by addition "
    "— quantiles at 100 TB without q104's per-group sort; the window "
    "passes that locate the crossing bin run over the SKETCH (|groups| x "
    "64 rows), never the data. Estimates are integer-derived (bin counts "
    "and one division), bit-identical cross-engine.",
)
def q113(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    hist = sketch_ops.histogram_sketch(
        docs, ["lang"], F.col("n_chars"), HIST_BIN_W, HIST_BINS
    )
    e50 = sketch_ops.histogram_quantile(hist, ["lang"], 0.5, HIST_BIN_W)
    e90 = sketch_ops.histogram_quantile(
        hist, ["lang"], 0.9, HIST_BIN_W
    ).withColumnRenamed("est_q", "est_p90")
    ex = docs.groupBy("lang").agg(
        F.round(F.expr("percentile(n_chars, 0.50)"), 6).alias("exact_p50"),
        F.round(F.expr("percentile(n_chars, 0.90)"), 6).alias("exact_p90"),
    )
    return (
        e50.withColumnRenamed("est_q", "est_p50")
        .join(e90, "lang")
        .join(ex, "lang")
        .select("lang", "est_p50", "est_p90", "exact_p50", "exact_p90")
    )


def _bloom_bits_sql() -> str:
    base = hashing.portable_hash28_sql("CAST(c_custkey AS VARCHAR)")
    sels = " UNION ".join(
        f"SELECT DISTINCT ({hashing.minhash_value_sql(base, i)}) % {BLOOM_BITS} AS bit"
        f" FROM build"
        for i in range(BLOOM_HASHES)
    )
    return sels


@register(
    "q114_bloom_semijoin",
    f"""
    WITH build AS (SELECT c_custkey FROM customer WHERE c_nationkey = 1),
    bits AS ({_bloom_bits_sql()}),
    bs AS (SELECT list(bit ORDER BY bit) AS bits FROM bits),
    probe AS (
        SELECT o_custkey,
               {hashing.portable_hash28_sql("CAST(o_custkey AS VARCHAR)")}
                   AS __b
        FROM orders),
    mem AS (
        SELECT o_custkey,
               {" AND ".join(
                   f"list_contains(bits, ({hashing.minhash_value_sql('__b', i)}) % {BLOOM_BITS})"
                   for i in range(BLOOM_HASHES))} AS bloom_pass
        FROM probe CROSS JOIN bs),
    ex AS (
        SELECT CAST(count(*) AS BIGINT) AS exact_pass FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM build))
    SELECT CAST(count(*) AS BIGINT) AS n_probe,
           CAST(sum(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
               AS bloom_pass,
           ex.exact_pass,
           CAST(sum(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
               - ex.exact_pass AS false_pos
    FROM mem, ex GROUP BY ex.exact_pass
    """,
    doc="Bloom-filter semi-join pruning profile: the nation-1 customer "
    "keys set 3 committed-hash bits in a 1024-bit filter; every order "
    "probes it ROW-LOCALLY — the bit set collapses to one broadcast array "
    "row and the test is three array_contains, a scan-local projection "
    "with ZERO shuffle of the probe side (the explicit form of the "
    "runtime bloom join injection Spark applies to shuffle joins, usable "
    "when the probe is a 100 TB scan you want pruned BEFORE any "
    "exchange). The filter is sized small on purpose so false positives "
    "exist and the oracle checks the FP count, not just membership; "
    "false negatives are impossible by construction (asserted in "
    "tests/test_sketch.py).",
)
def q114(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    build = cust.filter(F.col("c_nationkey") == 1).select("c_custkey")
    bits = sketch_ops.bloom_build(
        build, F.col("c_custkey").cast("string"),
        n_bits=BLOOM_BITS, n_hashes=BLOOM_HASHES,
    )
    mem = sketch_ops.bloom_membership(
        orders.select("o_custkey"), bits,
        F.col("o_custkey").cast("string"),
        n_bits=BLOOM_BITS, n_hashes=BLOOM_HASHES,
    )
    passed = mem.agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0)).alias("bloom_pass"),
    )
    exact = (
        orders.join(
            F.broadcast(build), orders.o_custkey == build.c_custkey, "left_semi"
        ).agg(F.count(F.lit(1)).alias("exact_pass"))
    )
    return passed.crossJoin(exact).select(
        "n_probe",
        "bloom_pass",
        "exact_pass",
        (F.col("bloom_pass") - F.col("exact_pass")).alias("false_pos"),
    )


# ---------------------------------------------------------------------------
# q115 — IVF-PQ: the full ANN serving composition (routing × compression)
# ---------------------------------------------------------------------------

IVFPQ_K = 3
IVFPQ_NPROBE = 2

from .functions import vector as _vec  # noqa: E402


@register(
    "q115_ivfpq_knn",
    f"""
    WITH cents AS (
        SELECT label AS cell, arg_min(embedding, vec_id) AS centroid
        FROM embeddings GROUP BY label),
    assigned AS (
        SELECT vec_id, cell FROM (
            SELECT e.vec_id, c.cell,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {_vec.cosine_sql('e.embedding', 'c.centroid')} DESC, c.cell)
                       AS rk
            FROM embeddings e CROSS JOIN cents c) WHERE rk = 1),
    probes AS (
        SELECT query_id, cell FROM (
            SELECT q.vec_id AS query_id, c.cell,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_vec.cosine_sql('q.embedding', 'c.centroid')} DESC, c.cell)
                       AS rk
            FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 10)
        WHERE rk <= {IVFPQ_NPROBE}),
    {_pq_books_sql().strip().lstrip()},
    {_PQ_ENC_SQL.strip()},
    cands AS (
        SELECT p.query_id, a.vec_id
        FROM probes p JOIN assigned a USING (cell)
        WHERE a.vec_id <> p.query_id),
    lut AS (
        SELECT q.vec_id AS query_id, b.subspace, b.code,
               {_vec.l2sq_sql(
                   f"list_slice(q.embedding, b.subspace * {PQ_DSUB} + 1,"
                   f" b.subspace * {PQ_DSUB} + {PQ_DSUB})",
                   "b.codeword")} AS d
        FROM embeddings q CROSS JOIN books b WHERE q.vec_id < 10),
    folded AS (
        SELECT c.query_id, c.vec_id,
               list_sum(list_transform(
                   list_sort(list({{'s': l.subspace, 'd': l.d}})),
                   x -> x.d)) AS adist
        FROM cands c
        JOIN (SELECT vec_id, subspace, mm.code AS code FROM enc) e
          USING (vec_id)
        JOIN lut l
          ON l.query_id = c.query_id AND l.subspace = e.subspace
         AND l.code = e.code
        GROUP BY 1, 2)
    SELECT query_id, vec_id AS neighbor_id,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY adist, vec_id) AS INT) AS rank,
           round(adist, 6) AS adist
    FROM folded
    QUALIFY rank <= {IVFPQ_K}
    """,
    doc="IVF-PQ — the full Faiss-style ANN serving composition: IVF "
    "routing picks nprobe=2 cells per query (broadcast-bank projection, "
    "zero shuffle), then asymmetric PQ distance ranks only the CODES of "
    "vectors in those cells. The two scale savings multiply: the cell "
    "equi-join touches nprobe/nlist of the corpus, and what it touches "
    "is 8-byte codes, not float vectors — a query never reads a raw "
    "corpus vector. LUT broadcasts; subspace fold sums in sorted order "
    "(bit-identical cross-engine); per-query rank window, no global "
    "sort. Composes q40 (routing) x q109 (encode) x q110 (ADC) into one "
    "declarative plan.",
)
def q115(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    cents = emb.groupBy(F.col("label").alias("cell")).agg(
        F.min_by("embedding", "vec_id").alias("centroid")
    )
    assigned = sim_ops.ivf_assign(
        emb.select("vec_id", "embedding"), cents, drop_vec=True
    )
    books = sim_ops.pq_codebooks(emb, m=PQ_M, dsub=PQ_DSUB, n_codes=PQ_CODES)
    codes = sim_ops.pq_encode(emb, books, dsub=PQ_DSUB).select(
        "vec_id", "subspace", "code"
    )
    queries = emb.filter(F.col("vec_id") < 10)
    out = sim_ops.ivfpq_knn(
        codes, assigned, books, cents, queries,
        k=IVFPQ_K, nprobe=IVFPQ_NPROBE, dsub=PQ_DSUB,
    )
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"),
        F.round("adist", 6).alias("adist"),
    )


# ---------------------------------------------------------------------------
# q116 — ANN quality evaluation: ADC shortlist recall (the rerank metric)
# ---------------------------------------------------------------------------

RECALL_K = 3
SHORTLIST = 50


@register(
    "q116_ann_recall",
    f"""
    WITH {_pq_books_sql().strip().lstrip()},
    {_PQ_ENC_SQL.strip()},
    q AS (SELECT vec_id AS query_id, embedding AS q_vec
          FROM embeddings WHERE vec_id < 10),
    lut AS (
        SELECT q.query_id, b.subspace, b.code,
               {_vec.l2sq_sql(
                   f"list_slice(q.q_vec, b.subspace * {PQ_DSUB} + 1,"
                   f" b.subspace * {PQ_DSUB} + {PQ_DSUB})",
                   "b.codeword")} AS d
        FROM q CROSS JOIN books b),
    shortlist AS (
        SELECT query_id, vec_id AS neighbor_id FROM (
            SELECT e.vec_id, l.query_id,
                   row_number() OVER (
                       PARTITION BY l.query_id
                       ORDER BY list_sum(list_transform(
                           list_sort(list({{'s': l.subspace, 'd': l.d}})),
                           x -> x.d)), e.vec_id) AS rank
            FROM (SELECT vec_id, subspace, mm.code AS code FROM enc) e
            JOIN lut l USING (subspace, code)
            WHERE e.vec_id <> l.query_id
            GROUP BY e.vec_id, l.query_id)
        WHERE rank <= {SHORTLIST}),
    exact AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY {_vec.l2sq_sql('q.q_vec', 'e.embedding')},
                                e.vec_id) AS rank
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id <> q.query_id)
        WHERE rank <= {RECALL_K}),
    hits AS (
        SELECT CAST(count(*) AS BIGINT) AS n_hits
        FROM shortlist JOIN exact USING (query_id, neighbor_id)),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM exact)
    SELECT n_exact, n_hits,
           round(n_hits / CAST(n_exact AS DOUBLE), 4) AS recall
    FROM tot, hits
    """,
    doc="ANN quality evaluation — shortlist recall@(3, 50): the fraction "
    "of each query's EXACT L2 top-3 captured by the ADC top-50 shortlist "
    "— the metric of the deployed two-stage architecture (PQ codes "
    "shortlist candidates from compressed storage, exact rerank touches "
    "only |shortlist| raw vectors). Both sides are deterministic, so the "
    "recall NUMBER is oracle-checkable — unusual for ANN evaluation and "
    "exactly why the committed-hash design pays off. On this synthetic "
    "near-uniform corpus it measures 0.50 (high-dim distance "
    "concentration makes random data the worst case; codebook sweep "
    "16->128 codewords lifts direct recall@3 0.07->0.23 — PERF.md); on "
    "clustered real embeddings the same pipeline scores far higher, and "
    "this query is precisely the dial-reader a deployment tunes "
    "(shortlist depth, codebook size, k-means-trained books) until "
    "recall clears its bar.",
)
def q116(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load(spark, sf, "embeddings")
    books = sim_ops.pq_codebooks(emb, m=PQ_M, dsub=PQ_DSUB, n_codes=PQ_CODES)
    # array layout (r10): row-local ADC fold, see q110
    codes = sim_ops.pq_encode(emb, books, dsub=PQ_DSUB, layout="array")
    queries = emb.filter(F.col("vec_id") < 10)
    shortlist = sim_ops.pq_adc_knn(
        codes, books, queries, k=SHORTLIST, dsub=PQ_DSUB, n_codes=PQ_CODES
    ).select("query_id", "neighbor_id")

    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_vec")
    )
    d2 = vector_fns.l2sq(F.col("q_vec"), F.col("c_vec"))
    w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    exact = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("d2", d2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= RECALL_K)
        .select("query_id", "neighbor_id")
    )
    hits = shortlist.join(exact, ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    tot = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    return tot.crossJoin(hits).select(
        "n_exact",
        "n_hits",
        F.round(F.col("n_hits") / F.col("n_exact"), 4).alias("recall"),
    )


# ---------------------------------------------------------------------------
# q118 — k-means-trained PQ codebooks (the production training path)
# ---------------------------------------------------------------------------

_Q118_SLICE = (
    f"list_slice(e.embedding, b.subspace * {PQ_DSUB} + 1,"
    f" b.subspace * {PQ_DSUB} + {PQ_DSUB})"
)


@register(
    "q118_pq_kmeans_books",
    f"""
    WITH {_pq_books_sql().strip()},
    t0 AS (
        SELECT e.vec_id, b.subspace, b.code,
               {vector_fns.l2sq_sql(_Q118_SLICE, "b.codeword")} AS dist
        FROM embeddings e CROSS JOIN books b),
    asg AS (
        SELECT vec_id, subspace, min({{'dist': dist, 'code': code}}).code AS code
        FROM t0 GROUP BY 1, 2),
    sl AS (
        SELECT a.subspace, a.code,
               list_slice(e.embedding, a.subspace * {PQ_DSUB} + 1,
                          a.subspace * {PQ_DSUB} + {PQ_DSUB}) AS s
        FROM asg a JOIN embeddings e USING (vec_id)),
    flat AS (
        SELECT subspace, code, generate_subscripts(s, 1) AS pos,
               CAST(unnest(s) AS DOUBLE) AS x
        FROM sl),
    upd AS (
        SELECT subspace, code, list(m ORDER BY pos) AS codeword
        FROM (SELECT subspace, code, pos, avg(x) AS m
              FROM flat GROUP BY 1, 2, 3)
        GROUP BY 1, 2),
    b1 AS (
        -- an empty cell keeps its previous codeword (mirrors the
        -- nonempty-only update in pq_codebooks_kmeans)
        SELECT b.subspace, b.code, coalesce(u.codeword, b.codeword) AS codeword
        FROM books b LEFT JOIN upd u ON b.subspace = u.subspace AND b.code = u.code),
    t1 AS (
        SELECT e.vec_id, b.subspace, b.code,
               {vector_fns.l2sq_sql(_Q118_SLICE, "b.codeword")} AS dist
        FROM embeddings e CROSS JOIN b1 b),
    enc1 AS (
        SELECT vec_id, subspace, min({{'dist': dist, 'code': code}}).code AS code
        FROM t1 GROUP BY 1, 2)
    SELECT subspace, code, CAST(count(*) AS BIGINT) AS n_vectors
    FROM enc1 GROUP BY 1, 2
    """,
    doc="PQ codebook TRAINING (one per-subspace Lloyd round over the "
    "hash-sampled init — the production path pq_codebooks documents) and "
    "the resulting code histogram: vectors per (subspace, codeword) after "
    "re-encoding against the trained books. The corpus never shuffles "
    "(all m subspaces train in one mapInPandas pass; driver reduces "
    "m x n_codes partial rows — kmeans_centroids' shape); ties break to "
    "the smallest code in both engines, and the oracle replays the "
    "identical round relationally (argmin assignment -> elementwise "
    "means via generate_subscripts/unnest -> re-encode), the q50 "
    "technique. Like q50 the compared values are the integer assignment "
    "counts, which are invariant to last-ulp float summation-order "
    "differences between the engines.",
)
def q118(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    books = sim_ops.pq_codebooks_kmeans(
        emb, m=PQ_M, dsub=PQ_DSUB, n_codes=PQ_CODES, iters=1
    )
    codes = sim_ops.pq_encode(emb, books, dsub=PQ_DSUB)
    return codes.groupBy("subspace", "code").agg(
        F.count(F.lit(1)).alias("n_vectors")
    )


# ---------------------------------------------------------------------------
# q127/q128 — percentile_approx variants of q104/q60: the 100 TB path the
# exact queries document ("swap percentile_approx"), registered as
# executable, oracle-checked queries (VERDICT r05 item 7)
# ---------------------------------------------------------------------------

PA_ACCURACY = 100  # GK summary: rank error <= n / accuracy = 1% of n


def _approx_band_query(
    df: DataFrame, group_col: str, value_col: str, ps: list[float],
    approx_fn=None,
) -> DataFrame:
    """percentile_approx vs its own accuracy contract: Spark's aggregate
    is a Greenwald-Khanna quantile summary whose guarantee is on RANK —
    the returned value's rank is within n/accuracy of p·n. So the check
    is rank-based, not value-based (a value-band comparison against
    interpolated exact percentiles fails on small discrete groups where
    one rank step is a big value jump): re-join the per-group approx
    value onto the rows (broadcast — |groups| rows) and verify
    count(<= v)/n >= p − ε − 2/n and count(< v)/n <= p + ε + 2/n,
    with ε = 1/accuracy and 2/n slack for duplicate/boundary ranks.
    The query emits the verdict per group; a DuckDB oracle cannot replay
    GK's merge order, but it CAN predict every verdict is true — which
    makes the accuracy contract itself the hash-checked value (an approx
    operator's testable property IS its error bound). At 100 TB this is
    the quantile plan to run: GK state is mergeable map-side and bounded
    per group, no per-group sort.
    """
    eps = 1.0 / PA_ACCURACY
    v = F.col(value_col)
    if approx_fn is None:  # the real operator; tests inject a broken one
        def approx_fn(col, p):
            return F.percentile_approx(col, F.lit(p), F.lit(PA_ACCURACY))
    ap = df.groupBy(group_col).agg(
        *[approx_fn(value_col, p).alias(f"__ap{int(p * 100)}") for p in ps]
    )
    # null-safe join key: a plain equi-join would drop a NULL group, while
    # the DuckDB oracle's GROUP BY retains it — the same NULL-key
    # divergence fixed in similarity.py's block kernels (ADVICE r06).
    # The approx side's key is renamed first: ap derives from df, so
    # df[group_col]/ap[group_col] resolve to the SAME attribute and Spark
    # would build a trivially-true self-join predicate.
    ap = ap.withColumnRenamed(group_col, "__g")
    joined = df.join(
        F.broadcast(ap), F.col(group_col).eqNullSafe(F.col("__g"))
    ).drop("__g")
    n = F.count(F.lit(1))
    aggs = [n.alias("n")]
    for p in ps:
        tag = str(int(p * 100))
        apc = F.col(f"__ap{tag}")
        le = F.sum((v <= apc).cast("long")) / n
        lt = F.sum((v < apc).cast("long")) / n
        slack = F.lit(eps) + F.lit(2.0) / n
        aggs.append(
            ((le >= F.lit(p) - slack) & (lt <= F.lit(p) + slack)).alias(
                f"p{tag}_ok"
            )
        )
    return joined.groupBy(group_col).agg(*aggs)


_PA_DOC = (
    "percentile_approx (Greenwald-Khanna mergeable summary, accuracy "
    f"{PA_ACCURACY}) checked against its rank-error contract: the approx "
    "value must lie within the exact percentiles at p±2/accuracy. The "
    "oracle predicts every verdict true — the error bound is the "
    "hash-checked property (the honest cross-engine check for an approx "
    "aggregate whose internal merge order no other engine replays). "
    "This is the executable 100 TB form of the exact sort-based "
)


@register(
    "q127_length_percentiles_approx",
    """
    SELECT lang, CAST(count(*) AS BIGINT) AS n,
           true AS p50_ok, true AS p95_ok
    FROM documents GROUP BY lang
    """,
    doc=_PA_DOC + "q104 profile.",
)
def q127(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select("lang", "n_chars")
    return _approx_band_query(docs, "lang", "n_chars", [0.50, 0.95])


@register(
    "q128_price_percentiles_approx",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
           true AS p50_ok, true AS p90_ok
    FROM orders GROUP BY o_orderpriority
    """,
    doc=_PA_DOC + "q60 profile.",
)
def q128(spark: SparkSession, sf: str) -> DataFrame:
    od = load(spark, sf, "orders").select("o_orderpriority", "o_totalprice")
    return _approx_band_query(od, "o_orderpriority", "o_totalprice", [0.50, 0.90])
