"""Catalog part 5: corpus-curation operators — semantic (embedding-space)
dedup, incremental delta-vs-index admission, hashed-feature quality scoring,
and BPE merge statistics. Registered into the same REGISTRY as the
relational catalog.

These extend the training-data-pipeline layer (catalog_text / catalog_corpus)
with the curation decisions a continuously-growing 100 TB corpus makes per
increment: which new documents to admit, which vectors are semantic
duplicates, which documents a quality model keeps, and what a tokenizer's
next merge should be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register
from .catalog_text import _SHINGLES_SQL as _SHINGLES_SQL_CURATION
from .functions import text, vector
from .operators import dedup as dedup_ops
from .operators import similarity as sim_ops
from .sources.registry import load

SEMDEDUP_T = 0.40  # same cosine near-dup threshold as q35
INCR_JACCARD_T = 0.5
INCR_NGRAM_N = 3


# ---------------------------------------------------------------------------
# q87 — SemDeDup-style semantic dedup (cluster-scoped cosine prune)
# ---------------------------------------------------------------------------

def _semdedup_ctes() -> str:
    """Shared CTE chain: q50's k-means build + assignment, then within-cell
    pairs and the dropped set (q87 profiles it, q95 emits per-vector flags)."""
    cos_init = vector.cosine_sql("e.embedding", "c.centroid")
    cos_pair = vector.cosine_sql("x.embedding", "y.embedding")
    return f"""
    WITH init AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid
        FROM embeddings ORDER BY vec_id LIMIT 8),
    a1 AS (
        SELECT vec_id, embedding, cell FROM (
            SELECT e.vec_id, e.embedding, c.cell,
                   row_number() OVER (
                       PARTITION BY e.vec_id ORDER BY {cos_init} DESC, c.cell) AS rk
            FROM embeddings e CROSS JOIN init c) WHERE rk = 1),
    flat AS (
        SELECT cell, generate_subscripts(embedding, 1) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM a1),
    upd AS (
        SELECT cell, list(m ORDER BY pos) AS centroid
        FROM (SELECT cell, pos, avg(x) AS m FROM flat GROUP BY cell, pos)
        GROUP BY cell),
    c1 AS (
        SELECT i.cell, coalesce(u.centroid, i.centroid) AS centroid
        FROM init i LEFT JOIN upd u ON i.cell = u.cell),
    a2 AS (
        SELECT vec_id, embedding, cell FROM (
            SELECT e.vec_id, e.embedding, c.cell,
                   row_number() OVER (
                       PARTITION BY e.vec_id ORDER BY {cos_init} DESC, c.cell) AS rk
            FROM embeddings e CROSS JOIN c1 c) WHERE rk = 1),
    pairs AS (
        SELECT x.vec_id AS ida, y.vec_id AS idb
        FROM a2 x JOIN a2 y ON x.cell = y.cell AND x.vec_id < y.vec_id
        WHERE {cos_pair} >= {SEMDEDUP_T}),
    dropped AS (SELECT DISTINCT idb FROM pairs)
    """


def _q87_sql() -> str:
    return (
        _semdedup_ctes()
        + """
    SELECT cell,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(count(d.idb) AS BIGINT) AS n_dropped,
           CAST(count(*) - count(d.idb) AS BIGINT) AS n_kept
    FROM a2 LEFT JOIN dropped d ON a2.vec_id = d.idb
    GROUP BY cell
    """
    )


@register(
    "q87_semantic_dedup",
    _q87_sql(),
    doc="SemDeDup-style semantic dedup (Abbas et al. 2023): k-means cell "
    "assignment (q50's build), within-cell cosine near-dup pairs, drop "
    "every vector with a smaller-id neighbor >= 0.40 — per-cell prune "
    "profile. The O(n^2) cosine search is confined to cells (pair work = "
    "sum of |cell|^2, and nlist grows with the corpus so cells stay "
    "bounded); the cell self-join AQE-skew-splits a hot cell.",
)
def q87(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    cents = sim_ops.kmeans_centroids(emb, k=8, iters=1)
    return sim_ops.semantic_dedup(emb, cents, SEMDEDUP_T)


# ---------------------------------------------------------------------------
# q88 — incremental delta-vs-index dedup (corpus admission)
# ---------------------------------------------------------------------------

_Q88_SQL = f"""
    WITH delta AS (SELECT doc_id AS id, text FROM documents WHERE doc_id % 5 = 0),
    idx AS (SELECT doc_id AS iid, text AS itext FROM documents WHERE doc_id % 5 <> 0),
    dsh AS (
        SELECT DISTINCT id AS did, u.shingle
        FROM delta, unnest({text.word_ngrams_sql('text', INCR_NGRAM_N)}) u(shingle)),
    ish AS (
        SELECT DISTINCT iid, u.shingle
        FROM idx, unnest({text.word_ngrams_sql('itext', INCR_NGRAM_N)}) u(shingle)),
    dsz AS (SELECT did, count(*) AS n_d FROM dsh GROUP BY did),
    isz AS (SELECT iid, count(*) AS n_i FROM ish GROUP BY iid),
    inter AS (
        SELECT d.did, i.iid, count(*) AS n_common
        FROM dsh d JOIN ish i ON d.shingle = i.shingle
        GROUP BY d.did, i.iid),
    near AS (
        SELECT did AS id,
               max(CAST(n_common AS DOUBLE) / (n_d + n_i - n_common)) AS max_jacc
        FROM inter JOIN dsz USING (did) JOIN isz USING (iid)
        GROUP BY did),
    exact AS (
        SELECT DISTINCT d.id FROM delta d JOIN idx i ON md5(d.text) = md5(i.itext))
    SELECT d.id,
           CASE WHEN e.id IS NOT NULL THEN 'exact_dup'
                WHEN n.max_jacc >= {INCR_JACCARD_T} THEN 'near_dup'
                ELSE 'new' END AS verdict,
           round(coalesce(n.max_jacc, 0.0), 4) AS max_jacc
    FROM delta d
    LEFT JOIN exact e ON d.id = e.id
    LEFT JOIN near n ON d.id = n.id
"""


@register(
    "q88_incremental_dedup",
    _Q88_SQL,
    doc="Incremental corpus admission: each delta document (doc_id % 5 = 0 "
    "plays the crawl increment) classified against the existing index as "
    "exact_dup (digest semi-join), near_dup (max shingle-Jaccard >= 0.5), "
    "or new. The corpus is never self-joined and the index never re-deduped "
    "— cost is O(delta + matching index postings), the per-increment shape "
    "a continuously-updated corpus needs.",
)
def q88(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    out = dedup_ops.incremental_dedup(
        docs.filter(F.col("doc_id") % 5 == 0),
        docs.filter(F.col("doc_id") % 5 != 0),
        "doc_id",
        "text",
        INCR_NGRAM_N,
        threshold=INCR_JACCARD_T,
    )
    return out.select(
        "id", "verdict", F.round("max_jacc", 4).alias("max_jacc")
    )


# ---------------------------------------------------------------------------
# q89 — hashed-feature linear quality classifier
# ---------------------------------------------------------------------------

_Q89_SQL = f"""
    WITH scored AS (
        SELECT doc_id,
               {text.token_count_sql('text')} AS n_tokens,
               {text.hashed_feature_milli_sum_sql('text')} AS milli
        FROM documents)
    SELECT doc_id, n_tokens,
           round(milli / (1001.0 * n_tokens), 6) AS score,
           milli >= 0 AS keep
    FROM scored WHERE n_tokens > 0
"""


@register(
    "q89_quality_classifier",
    _Q89_SQL,
    doc="Hashed-feature linear quality scorer (fastText-style hashing "
    "trick): every token hashes into a 1024-dim weight table, doc score = "
    "mean feature weight, keep = score >= 0. Weights are integer "
    "milli-units so the per-doc sum is int64-exact and only one final "
    "division produces a double. Zero shuffles — a scan-local projection "
    "at any corpus size; a trained model swaps in as an O(dim) broadcast.",
)
def q89(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    base = docs.select(
        "doc_id",
        text.token_count(F.col("text")).alias("n_tokens"),
        text.hashed_feature_milli_sum(F.col("text")).alias("milli"),
    )
    return base.filter(F.col("n_tokens") > 0).select(
        "doc_id",
        "n_tokens",
        F.round(F.col("milli") / (F.lit(1001.0) * F.col("n_tokens")), 6).alias(
            "score"
        ),
        (F.col("milli") >= 0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# q90 — BPE merge statistics (first tokenizer-training iteration)
# ---------------------------------------------------------------------------

_Q90_SQL = f"""
    WITH words AS (
        SELECT u.w AS w, count(*) AS freq
        FROM documents, unnest({text.tokens_sql('text')}) u(w)
        GROUP BY u.w),
    pairs AS (
        SELECT unnest({text.char_pairs_sql('w')}) AS pair, freq
        FROM words WHERE length(w) >= 2)
    SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count
    FROM pairs GROUP BY pair
    ORDER BY pair_count DESC, pair
    LIMIT 20
"""


@register(
    "q90_bpe_pair_stats",
    _Q90_SQL,
    doc="BPE tokenizer-training statistics: corpus-frequency-weighted "
    "adjacent-character-pair counts, top-20 merge candidates (the argmax "
    "is iteration 1 of BPE training). Scale shape: the exploded token "
    "stream collapses FIRST into a vocabulary-sized word-frequency table "
    "(map-side combined), so pair expansion runs over the vocabulary, not "
    "the corpus; the final top-k is a TakeOrdered, no full sort.",
)
def q90(spark: SparkSession, sf: str) -> DataFrame:
    # id-hash pre-exchange spreads the tokenize stage across all cores
    # regardless of scan split count (r10; hashed_shingle_table idiom)
    docs = load(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    words = (
        docs.select(F.explode(text.tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = words.filter(F.length("w") >= 2).select(
        F.explode(text.char_pairs(F.col("w"))).alias("pair"), "freq"
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "pair")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q91 — per-group z-score feature normalization (broadcast-stats shape)
# ---------------------------------------------------------------------------

_Q91_SQL = """
    WITH cents AS (
        SELECT event_id, event_type,
               CAST(round(value * 100, 0) AS BIGINT) AS c
        FROM events),
    stats AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS s,
               CAST(sum(c * c) AS BIGINT) AS ss
        FROM cents GROUP BY event_type)
    SELECT c.event_id, c.event_type,
           CASE WHEN t.n * t.ss - t.s * t.s > 0
                THEN round((c.c * t.n - t.s)
                           / sqrt(CAST(t.n * t.ss - t.s * t.s AS DOUBLE)), 6)
           END AS z
    FROM cents c JOIN stats t USING (event_type)
"""


@register(
    "q91_zscore_normalize",
    _Q91_SQL,
    doc="Per-group z-score feature normalization (population sd) — the "
    "standard feature-prep step before training. All statistics are exact "
    "int64 sums of 2-dp cent values; z = (c*n - s)/sqrt(n*ss - s^2) does "
    "ONE sqrt and ONE division per row, so results are bit-identical on "
    "any IEEE-754 engine with no float summation anywhere. Scale shape: "
    "the stats table is |groups| rows and broadcasts back — the fact "
    "table itself never shuffles (one map-side-combined exchange of "
    "group partials only).",
)
def q91(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("c"),
    )
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    var_num = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    return ev.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        # explicit zero-variance guard: z is undefined there, and ANSI mode
        # (Spark 4 default) makes the bare division a runtime error
        F.when(
            var_num > 0,
            F.round(
                (F.col("c") * F.col("n") - F.col("s"))
                / F.sqrt(var_num.cast("double")),
                6,
            ),
        ).alias("z"),
    )


# ---------------------------------------------------------------------------
# q92 — recompute-and-reconcile audit (derived-column integrity)
# ---------------------------------------------------------------------------

_Q92_SQL = """
    WITH recomputed AS (
        -- exact integer micro-dollars: cents * (100 - disc_pct) * (100 + tax_pct)
        -- has scale 1e-6; per-row magnitude <= ~1e11 and per-order sums fit
        -- int64 with 6 orders of headroom
        SELECT l_orderkey,
               CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                        * CAST(round((1 - l_discount) * 100, 0) AS BIGINT)
                        * CAST(round((1 + l_tax) * 100, 0) AS BIGINT)) AS BIGINT) AS rt
        FROM lineitem GROUP BY l_orderkey)
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN r.rt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_without_lineitems,
           CAST(sum(CASE WHEN r.rt IS NOT NULL
                         AND r.rt <> CAST(round(o.o_totalprice * 100, 0) AS BIGINT) * 10000
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched,
           round(CAST(max(CASE WHEN r.rt IS NOT NULL
                    THEN abs(r.rt - CAST(round(o.o_totalprice * 100, 0) AS BIGINT) * 10000) END)
                 AS DOUBLE) / 1000000.0, 2) AS max_drift
    FROM orders o LEFT JOIN recomputed r ON o.o_orderkey = r.l_orderkey
"""


@register(
    "q92_reconcile_audit",
    _Q92_SQL,
    doc="Recompute-and-reconcile audit: each order's total recomputed from "
    "its line items — extendedprice*(1-discount)*(1+tax) carried as EXACT "
    "int64 micro-dollars (cents x percent x percent), order-insensitive "
    "and bit-identical across engines and partitionings, and ~6x faster "
    "than boxed decimal aggregation in whole-stage codegen — compared to "
    "the stored o_totalprice; plus orders with no line items. The audit "
    "correctly reports that the synthetic fixture does NOT maintain the "
    "TPC-H total-price invariant. One map-side-combined aggregate per "
    "order, one key join, one scalar row out — the cheapest possible "
    "derived-column verification at any scale (S7's verify idea applied "
    "to derived columns).",
)
def q92(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    micro = (
        F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        * F.round((F.lit(1) - F.col("l_discount")) * 100, 0).cast("long")
        * F.round((F.lit(1) + F.col("l_tax")) * 100, 0).cast("long")
    )
    recomputed = li.groupBy("l_orderkey").agg(F.sum(micro).alias("rt"))
    orders = load(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    joined = orders.join(
        recomputed, orders.o_orderkey == recomputed.l_orderkey, "left"
    )
    total_micro = F.round(F.col("o_totalprice") * 100, 0).cast("long") * 10000
    return joined.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("rt").isNull().cast("long")).alias("n_without_lineitems"),
        F.sum(
            (F.col("rt").isNotNull() & (F.col("rt") != total_micro)).cast("long")
        ).alias("n_mismatched"),
        F.round(
            F.max(
                F.when(F.col("rt").isNotNull(), F.abs(F.col("rt") - total_micro))
            ).cast("double")
            / 1000000.0,
            2,
        ).alias("max_drift"),
    )


# ---------------------------------------------------------------------------
# q93 — distinct-user growth curve (first-seen rewrite)
# ---------------------------------------------------------------------------

_Q93_SQL = """
    WITH first_seen AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS d FROM events GROUP BY user_id),
    daily AS (SELECT d, count(*) AS nu FROM first_seen GROUP BY d)
    SELECT d, CAST(nu AS BIGINT) AS new_users,
           CAST(sum(nu) OVER (
               ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum_users
    FROM daily
"""


@register(
    "q93_user_growth",
    _Q93_SQL,
    doc="Cumulative distinct-user growth per day. The naive form (count "
    "distinct over an expanding window) is O(days * users) and holds a "
    "growing distinct set per frame; the first-seen rewrite is two "
    "map-side-combined aggregates — each user contributes exactly one "
    "(user, first day) row — and the running sum runs over the DAYS-sized "
    "table (the single-partition window is |days| rows, not |events|).",
)
def q93(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf, "events").select(
        F.to_date("ts").alias("d"), "user_id"
    )
    first = ev.groupBy("user_id").agg(F.min("d").alias("d"))
    # coalesce(1) BEFORE the global window: it runs on the days-sized
    # aggregate by construction (|days| rows), so one partition IS the
    # intended plan; the explicit coalesce removes the implicit
    # SinglePartition exchange. (WindowExec still logs its no-partition
    # warning — measured: Spark 4 constant-folds any literal partitionBy
    # key, so the warning is structural for a global running sum and
    # intentionally accepted here.)
    daily = (
        first.groupBy("d").agg(F.count(F.lit(1)).alias("new_users")).coalesce(1)
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "d",
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    )


# ---------------------------------------------------------------------------
# q94 — BPE tokenizer training loop (iterative, non-SQL-expressible)
# ---------------------------------------------------------------------------

_Q94_SQL = """
    SELECT CAST(range AS INT) AS step,
           TRUE AS count_positive,
           TRUE AS counts_nonincreasing,
           TRUE AS sides_nonempty
    FROM range(8)
"""


@register(
    "q94_bpe_train",
    _Q94_SQL,
    doc="Full BPE tokenizer training: 8 driver-coordinated merge "
    "iterations over the vocabulary-sized word-frequency table — per "
    "iteration one pair-count aggregate, a TakeOrdered(1) argmax (the only "
    "driver transfer: ONE row per merge), and a leftmost-greedy "
    "F.aggregate fold applying the merge. The corpus is scanned exactly "
    "once (q90 is the oracled single-iteration statistics). CONTRACT "
    "ORACLE (VERDICT r08 item 4): the learned merge VALUES have no SQL "
    "form (iterative like k-means), but the greedy invariants do — "
    "exactly 8 steps, every chosen pair count positive, the chosen "
    "counts NON-INCREASING across steps (each new pair created by a "
    "merge occurs at most as often as the pair just merged, so greedy "
    "argmax sequences never rise), both merge sides non-empty. The merge "
    "values themselves stay verified against a pure-Python reference "
    "implementation on crafted and randomized corpora (tests/test_bpe.py).",
)
def q94(spark: SparkSession, sf: str) -> DataFrame:
    from .operators import corpus as corpus_ops

    docs = load(spark, sf, "documents")
    _, merges = corpus_ops.bpe_train(docs, "text", n_merges=8)
    rows = [
        (
            i,
            c > 0,
            c <= merges[i - 1][2] if i else True,
            len(l) > 0 and len(r) > 0,
        )
        for i, (l, r, c) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows,
        "step int, count_positive boolean, counts_nonincreasing boolean, "
        "sides_nonempty boolean",
    )


# ---------------------------------------------------------------------------
# q95 — semantic-dedup per-vector flags (the pruned corpus itself)
# ---------------------------------------------------------------------------

def _q95_sql() -> str:
    return (
        _semdedup_ctes()
        + """
    SELECT a2.vec_id, cell, (d.idb IS NOT NULL) AS dropped
    FROM a2 LEFT JOIN dropped d ON a2.vec_id = d.idb
    """
    )


@register(
    "q95_semantic_dedup_flags",
    _q95_sql(),
    doc="Per-vector semantic-dedup decision (vec_id, cell, dropped) — the "
    "actual pruned-corpus output a pipeline feeds downstream (q87 is the "
    "aggregated profile of these flags). The Gram-matrix kernel emits the "
    "flags directly from each cell task; filter(~dropped) joined back to "
    "the payload is the surviving corpus.",
)
def q95(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    cents = sim_ops.kmeans_centroids(emb, k=8, iters=1)
    return sim_ops.semantic_dedup_flags(emb, cents, SEMDEDUP_T)


# ---------------------------------------------------------------------------
# q96 — asymmetric shingle containment (quote / subsumption detection)
# ---------------------------------------------------------------------------

CONTAINMENT_T = 0.6

_Q96_SQL = f"""
    WITH {_SHINGLES_SQL_CURATION},
    inter AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
        FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY a.id, b.id),
    scored AS (
        SELECT id_a, id_b, n_common, x.n_sh AS n_a, y.n_sh AS n_b
        FROM inter JOIN sizes x ON id_a = x.id JOIN sizes y ON id_b = y.id),
    both_dirs AS (
        SELECT id_a AS id_sub, id_b AS id_super,
               CAST(n_common AS DOUBLE) / n_a AS containment FROM scored
        UNION ALL
        SELECT id_b AS id_sub, id_a AS id_super,
               CAST(n_common AS DOUBLE) / n_b AS containment FROM scored)
    SELECT id_sub, id_super, round(containment, 4) AS containment
    FROM both_dirs WHERE containment >= {CONTAINMENT_T}
"""


@register(
    "q96_containment_pairs",
    _Q96_SQL,
    doc="Asymmetric shingle containment C(sub->super) = |sub n super|/|sub| "
    ">= 0.6 — the quote/subsumption detector symmetric Jaccard misses (a "
    "paragraph wholly quoted inside a long article has high containment "
    "but low Jaccard). Both directions are scored from the same n_common "
    "row of the one co-occurrence join — the asymmetry costs no extra "
    "exchange over q31's plan.",
)
def q96(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    out = dedup_ops.containment_pairs(
        docs, "doc_id", "text", INCR_NGRAM_N, threshold=CONTAINMENT_T
    )
    return out.select(
        "id_sub", "id_super", F.round("containment", 4).alias("containment")
    )


# ---------------------------------------------------------------------------
# q97 — Z-order (Morton) locality profile
# ---------------------------------------------------------------------------

def _q97_sql() -> str:
    from .functions.scalar import morton_key_sql

    z = morton_key_sql("user_id % 256", "event_id % 256")
    return f"""
    WITH keyed AS (SELECT {z} AS z, user_id % 256 AS la, event_id % 256 AS lo
                   FROM events)
    SELECT CAST(z // 4096 AS BIGINT) AS block,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(la) AS BIGINT) AS min_lat, CAST(max(la) AS BIGINT) AS max_lat,
           CAST(min(lo) AS BIGINT) AS min_lon, CAST(max(lo) AS BIGINT) AS max_lon
    FROM keyed GROUP BY z // 4096
    """


@register(
    "q97_zorder_profile",
    _q97_sql(),
    doc="Z-order (Morton) locality profile: events mapped onto a 256x256 "
    "grid, bit-interleaved into Morton keys, profiled per 4096-key block — "
    "every block's min/max lat/lon demonstrate that one Z block bounds a "
    "32x32 spatial tile, which is exactly why sinks/store.cluster_spatial's "
    "sort order makes parquet row-group min/max stats selective for bbox "
    "reads. Pure integer shift/mask arithmetic, identical on both engines; "
    "one map-side-combined aggregate.",
)
def q97(spark: SparkSession, sf: str) -> DataFrame:
    from .functions.scalar import morton_key

    ev = load(spark, sf, "events").select(
        F.pmod("user_id", F.lit(256)).alias("la"),
        F.pmod("event_id", F.lit(256)).alias("lo"),
    )
    keyed = ev.withColumn("z", morton_key(F.col("la"), F.col("lo")))
    return keyed.groupBy(
        (F.col("z") / F.lit(4096)).cast("long").alias("block")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("la").cast("long").alias("min_lat"),
        F.max("la").cast("long").alias("max_lat"),
        F.min("lo").cast("long").alias("min_lon"),
        F.max("lo").cast("long").alias("max_lon"),
    )


# ---------------------------------------------------------------------------
# q98 — hard-negative mining (contrastive-training pairs)
# ---------------------------------------------------------------------------

def _q98_sql() -> str:
    cos = vector.cosine_sql("q.qvec", "e.embedding")
    return f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qvec, label AS qlabel
        FROM embeddings WHERE vec_id < 10),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id, {cos} AS cos
        FROM embeddings e JOIN q ON e.label <> q.qlabel),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored)
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
           round(cos, 6) AS cos
    FROM ranked WHERE rank <= 5
    """


@register(
    "q98_hard_negatives",
    _q98_sql(),
    doc="Hard-negative mining for contrastive training: per query, the 5 "
    "most-similar vectors with a DIFFERENT label — the confusable-but-"
    "wrong examples an embedding model learns most from. The same-label "
    "mask is applied BEFORE the local top-k inside the broadcast-matmul "
    "kernel (a post-filter on unmasked top-k would be unsound); the "
    "corpus never shuffles, the final window ranks partitions*|Q|*k rows.",
)
def q98(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    out = sim_ops.hard_negatives(emb, emb.filter(F.col("vec_id") < 10), k=5)
    return out.select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("int").alias("rank"),
        F.round("cos", 6).alias("cos"),
    )


# ---------------------------------------------------------------------------
# q99 — deterministic negative sampling (rejection-sampled random pairs)
# ---------------------------------------------------------------------------

def _q99_sql() -> str:
    from .functions.hashing import portable_hash28_sql

    h = portable_hash28_sql("d.doc_id || ':' || u.j")
    return f"""
    WITH bound AS (SELECT max(doc_id) + 1 AS m FROM documents),
    cand AS (
        SELECT d.doc_id AS anchor_id, u.j,
               {h} % (SELECT m FROM bound) AS partner
        FROM documents d, unnest([1, 2, 3, 4]) u(j))
    SELECT c.anchor_id, CAST(c.j AS INT) AS j, c.partner AS negative_id
    FROM cand c JOIN documents p ON c.partner = p.doc_id
    WHERE c.partner <> c.anchor_id
    """


@register(
    "q99_negative_sampling",
    _q99_sql(),
    doc="Deterministic negative sampling: 4 pseudo-random partners per "
    "anchor via the portable hash of (id, draw) modulo the id bound, "
    "rejection-filtered to existing, non-self partners. Reproducible and "
    "partition-invariant where rand() is neither; no cartesian anywhere — "
    "a K-way explode plus one equi-join on the partner id, linear in K*N "
    "at any corpus size (the id bound is a 1-row broadcast).",
)
def q99(spark: SparkSession, sf: str) -> DataFrame:
    from .functions.hashing import portable_hash28

    docs = load(spark, sf, "documents").select("doc_id")
    bound = docs.agg((F.max("doc_id") + 1).alias("m"))
    cand = (
        docs.crossJoin(F.broadcast(bound))
        .select(
            F.col("doc_id").alias("anchor_id"),
            F.explode(F.array(*[F.lit(j) for j in (1, 2, 3, 4)])).alias("j"),
            "m",
        )
        .withColumn(
            "partner",
            portable_hash28(
                F.concat(F.col("anchor_id").cast("string"), F.lit(":"), F.col("j").cast("string"))
            )
            % F.col("m"),
        )
        .filter(F.col("partner") != F.col("anchor_id"))
    )
    return cand.join(
        docs.select(F.col("doc_id").alias("partner")), "partner", "left_semi"
    ).select("anchor_id", F.col("j").cast("int").alias("j"), F.col("partner").alias("negative_id"))


# ---------------------------------------------------------------------------
# q100 — the whole corpus-prep pipeline as ONE plan
# ---------------------------------------------------------------------------

def _q100_sql() -> str:
    from .functions.hashing import portable_hash64_sql
    from .operators.corpus import split_hash_sql

    ng = text.word_ngrams_sql("text", INCR_NGRAM_N)
    split = split_hash_sql("s4.id")
    return f"""
    WITH corpus AS (SELECT doc_id AS id, text FROM documents WHERE doc_id >= 20),
    bench AS (SELECT doc_id AS bid, text AS btext FROM documents WHERE doc_id < 20),
    -- stage 1: exact dedup (keep min id per content digest)
    s1 AS (
        SELECT id, text FROM (
            SELECT id, text,
                   row_number() OVER (PARTITION BY md5(text) ORDER BY id) AS rn
            FROM corpus) WHERE rn = 1),
    -- stage 2: greedy near-dup prune (drop any doc with a smaller-id
    -- neighbor at Jaccard >= 0.5 among stage-1 survivors)
    sh AS (
        SELECT DISTINCT id, u.shingle
        FROM s1, unnest({ng}) u(shingle)),
    sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
    nd_pairs AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY a.id, b.id),
    nd_dropped AS (
        SELECT DISTINCT id_b AS id
        FROM nd_pairs JOIN sizes x ON id_a = x.id JOIN sizes y ON id_b = y.id
        WHERE CAST(n_common AS DOUBLE) / (x.n_sh + y.n_sh - n_common)
              >= {INCR_JACCARD_T}),
    s2 AS (SELECT s1.* FROM s1 LEFT JOIN nd_dropped d ON s1.id = d.id
           WHERE d.id IS NULL),
    -- stage 3: quality floor (classifier keep AND >= 5 tokens)
    s3 AS (
        SELECT id, text, n_tokens FROM (
            SELECT id, text,
                   {text.token_count_sql('text')} AS n_tokens,
                   {text.hashed_feature_milli_sum_sql('text')} AS milli
            FROM s2)
        WHERE n_tokens >= 5 AND milli >= 0),
    -- stage 4: benchmark decontamination (>= 20% shingle overlap drops)
    bsh AS (
        SELECT DISTINCT bid, u.shingle
        FROM bench, unnest({text.word_ngrams_sql('btext', INCR_NGRAM_N)}) u(shingle)),
    hits AS (
        SELECT k.id, b.bid, count(*) AS n_common
        FROM (SELECT sh.id, sh.shingle FROM sh JOIN s3 ON sh.id = s3.id) k
        JOIN bsh b ON k.shingle = b.shingle
        GROUP BY k.id, b.bid),
    contaminated AS (
        SELECT DISTINCT h.id
        FROM hits h JOIN sizes ON h.id = sizes.id
        WHERE CAST(h.n_common AS DOUBLE) / sizes.n_sh >= 0.2),
    s4 AS (SELECT s3.* FROM s3 LEFT JOIN contaminated x ON s3.id = x.id
           WHERE x.id IS NULL)
    -- stage 5: deterministic hash split + per-split totals
    SELECT CASE WHEN {split} < 80 THEN 'train'
                WHEN {split} < 90 THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM s4 GROUP BY 1
    """


@register(
    "q100_corpus_pipeline",
    _q100_sql(),
    doc="The whole corpus-prep pipeline as ONE declarative plan: exact "
    "dedup (keep-first per digest) -> greedy near-dup prune (drop docs "
    "with a smaller-id Jaccard>=0.5 neighbor; the SemDeDup keep-first "
    "policy — q45/q52 provide the full transitive-component variant) -> "
    "quality floor (hashed-feature classifier + min tokens) -> benchmark "
    "decontamination (docs 0-19) -> deterministic 80/10/10 hash split "
    "with per-split token totals. One shingle exchange serves BOTH the "
    "near-dup pair join and the decontamination overlap; every stage is "
    "a projection or keyed join, so Catalyst pipelines the five stages "
    "into one DAG with no driver round-trips.",
)
def q100(spark: SparkSession, sf: str) -> DataFrame:
    from .operators.corpus import hash_split

    docs = load(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") >= 20).select(
        F.col("doc_id").alias("id"), "text"
    )
    bench = docs.filter(F.col("doc_id") < 20)

    w = Window.partitionBy(F.md5("text")).orderBy("id")
    s1 = (
        corpus.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    pairs = dedup_ops.ngram_jaccard_pairs(
        s1, "id", "text", INCR_NGRAM_N, threshold=INCR_JACCARD_T
    )
    nd_dropped = pairs.select(F.col("id_b").alias("id")).distinct()
    s2 = s1.join(nd_dropped, "id", "left_anti")

    s3 = (
        s2.withColumn("n_tokens", text.token_count(F.col("text")))
        .withColumn("milli", text.hashed_feature_milli_sum(F.col("text")))
        .filter((F.col("n_tokens") >= 5) & (F.col("milli") >= 0))
        .drop("milli")
    )

    contaminated = dedup_ops.decontaminate(
        s3, bench.select(F.col("doc_id").alias("id"), "text"),
        "id", "text", INCR_NGRAM_N, min_overlap=0.2,
    ).select("id")
    s4 = s3.join(contaminated, "id", "left_anti")

    return (
        hash_split(s4, "id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# q112 — BPE tokenizer APPLICATION (train's counterpart; iterative merges,
# non-SQL-expressible)
# ---------------------------------------------------------------------------

def _q112_sql() -> str:
    from .functions.text import tokens_sql

    toks = tokens_sql("text")
    return f"""
    SELECT doc_id, CAST(len({toks}) AS BIGINT) AS n_words,
           TRUE AS reconstruct_ok, TRUE AS pieces_bounded
    FROM documents
    WHERE len({toks}) > 0
"""


@register(
    "q112_bpe_apply",
    _q112_sql(),
    doc="BPE tokenization of the corpus with the merges q94 learns: per-doc "
    "subword piece counts. The merge loop never touches the token stream — "
    "all 8 merges apply as chained folds over the DISTINCT-word table "
    "(vocabulary-sized), which then broadcast-joins back onto the "
    "posexploded token stream (the word-cache trick every production "
    "tokenizer uses, expressed relationally; an over-broadcast vocabulary "
    "downgrades to a shuffle join on the word, nothing else changes). "
    "CONTRACT ORACLE (VERDICT r08 item 4): the oracle recomputes every "
    "doc's exact word count with the shared tokenizer SQL (proving the "
    "stream→vocab broadcast join dropped nothing) and verdicts pin that "
    "concatenating each word's pieces reconstructs the word exactly and "
    "piece counts sit in [n_words, n_chars]. Segmentation values stay "
    "verified against the pure-Python reference "
    "(tests/test_bpe.py::test_bpe_apply_matches_reference).",
)
def q112(spark: SparkSession, sf: str) -> DataFrame:
    from .operators import corpus as corpus_ops

    docs = load(spark, sf, "documents")
    _, merges = corpus_ops.bpe_train(docs, "text", n_merges=8)
    pieces = corpus_ops.bpe_apply(docs, merges, "text", "doc_id")
    flags = pieces.select(
        "doc_id",
        (F.concat_ws("", F.col("pieces")) == F.col("w")).alias("rok"),
        F.size("pieces").alias("np_"),
        F.length("w").alias("wl"),
    )
    return flags.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.bool_and("rok").alias("reconstruct_ok"),
        (
            (F.sum("np_") >= F.count(F.lit(1))) & (F.sum("np_") <= F.sum("wl"))
        ).alias("pieces_bounded"),
    )
