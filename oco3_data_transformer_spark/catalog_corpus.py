"""Catalog part 3: corpus-preparation and time-series operators — the
training-data-pipeline surface downstream of dedup/quality (splits,
sampling, packing, TF-IDF/PMI statistics, embedding quantization,
cluster-representative selection) plus dense-spine gap-filling.

Same conventions as catalog.py: every computed column aliased identically
on both sides, fractions either exact integer-ratio doubles or rounded on
both sides, counts BIGINT, window ties broken by a unique key. All
operators are deterministic (hash-ranked sampling, not ``rand()``) so the
DuckDB oracle checks them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register
from .catalog_text import _SHINGLES_SQL, JACCARD_T, NGRAM_N
from .functions import text
from .operators import corpus as corpus_ops
from .operators import dedup as dedup_ops
from .operators import timeseries as ts_ops
from .sources.registry import load

PACK_CAPACITY = 120
PACK_SHARDS = 8
GAPFILL_INTERVAL_S = 6 * 3600


@register(
    "q63_hash_split",
    f"""
    WITH b AS (
        SELECT {corpus_ops.split_hash_sql('doc_id')} AS h,
               {text.token_count_sql('text')} AS n_tok
        FROM documents)
    SELECT CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM b GROUP BY 1
    """,
    doc="Deterministic train/val/test split by portable id-hash bucket "
    "(80/10/10), with per-split document and token totals. The split "
    "column is a zero-shuffle projection — membership is decided row-local "
    "from the md5 hash, so a 100 TB corpus splits without any exchange and "
    "identically on every engine and rerun.",
)
def q63(spark: SparkSession, sf: str) -> DataFrame:
    docs = corpus_ops.hash_split(load(spark, sf, "documents"), "doc_id")
    return docs.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(text.token_count(F.col("text"))).alias("n_tokens"),
    )


@register(
    "q64_stratified_sample",
    f"""
    SELECT doc_id, lang, CAST(sample_rank AS INT) AS sample_rank
    FROM (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY {corpus_ops.split_hash_sql('doc_id')}, doc_id)
                   AS sample_rank
        FROM documents)
    WHERE sample_rank <= 25
    """,
    doc="Stratified deterministic sample: 25 documents per language, "
    "selected by smallest id-hash (equivalent to uniform sampling without "
    "replacement, but reproducible and oracle-checkable). One shuffle on "
    "the stratum key + one window pass.",
)
def q64(spark: SparkSession, sf: str) -> DataFrame:
    out = corpus_ops.stratified_sample(load(spark, sf, "documents"), "lang", "doc_id", k=25)
    return out.select("doc_id", "lang", F.col("sample_rank").cast("int").alias("sample_rank"))


@register(
    "q65_gapfill_locf",
    f"""
    WITH b AS (
        SELECT user_id, time_bucket(INTERVAL 6 HOURS, ts) AS bucket_ts, value AS v
        FROM events),
    agg AS (
        SELECT user_id, bucket_ts, count(*) AS n, max(v) AS mx
        FROM b GROUP BY user_id, bucket_ts),
    spine AS (
        SELECT unnest(generate_series(min(bucket_ts), max(bucket_ts),
                                      INTERVAL 6 HOURS)) AS bucket_ts
        FROM b),
    grid AS (
        SELECT u.user_id, s.bucket_ts
        FROM (SELECT DISTINCT user_id FROM b) u CROSS JOIN spine s)
    SELECT g.user_id, g.bucket_ts,
           CAST(coalesce(a.n, 0) AS BIGINT) AS n_events,
           last_value(a.mx IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.bucket_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_max,
           CAST(a.n IS NULL AS INT) AS is_gap
    FROM grid g LEFT JOIN agg a
      ON a.user_id = g.user_id AND a.bucket_ts = g.bucket_ts
    """,
    doc="Time-series gap-fill: 6-hour buckets per user, densified against "
    "the global bucket spine, last observed bucket-max carried forward "
    "into gaps (LOCF). The carried aggregate is a max (order-insensitive, "
    "exact across engines); generalizes the reference's empty-day "
    "densification (G9) to arbitrary series/intervals.",
)
def q65(spark: SparkSession, sf: str) -> DataFrame:
    return ts_ops.gapfill_locf(
        load(spark, sf, "events"), "user_id", "ts", "value", GAPFILL_INTERVAL_S
    )


_TOKS_SQL = f"""
    toks AS (
        SELECT doc_id AS id, u.tok
        FROM documents, unnest({text.tokens_sql('text')}) u(tok))
"""


@register(
    "q66_tfidf_topk",
    f"""
    WITH {_TOKS_SQL},
    tokc AS (SELECT id, tok, count(*) AS tf FROM toks GROUP BY id, tok),
    dfc AS (SELECT tok, count(*) AS dfreq FROM tokc GROUP BY tok),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT id, tok, tf,
               tf * ln(CAST(n_docs AS DOUBLE) / dfreq) AS score
        FROM tokc JOIN dfc USING (tok) CROSS JOIN n)
    SELECT id AS doc_id, tok AS term, CAST(rk AS INT) AS rank,
           round(score, 6) AS tfidf
    FROM (SELECT *, row_number() OVER (
              PARTITION BY id ORDER BY score DESC, tok) AS rk
          FROM scored)
    WHERE rk <= 3
    """,
    doc="TF-IDF top-3 terms per document (natural-log idf, ties by term). "
    "Scale shape: term counts groupBy(id, tok) after the id pre-exchange is "
    "exchange-free; the document-frequency table is vocabulary-sized and "
    "broadcasts back; one window pass per document partition.",
)
def q66(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    toks = docs.select(
        F.col("doc_id").alias("id"), F.explode(text.tokens(F.col("text"))).alias("tok")
    )
    tokc = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfc = tokc.groupBy("tok").agg(F.count(F.lit(1)).alias("dfreq"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tokc.join(F.broadcast(dfc), "tok")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("dfreq")),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("tok").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            F.col("id").alias("doc_id"),
            F.col("tok").alias("term"),
            F.col("rk").cast("int").alias("rank"),
            F.round("score", 6).alias("tfidf"),
        )
    )


@register(
    "q67_pmi_bigrams",
    f"""
    WITH {_TOKS_SQL},
    uni AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM uni),
    bg AS (
        SELECT u.g
        FROM documents, unnest({text.word_ngrams_sql('text', 2)}) u(g)),
    btot AS (SELECT CAST(count(*) AS DOUBLE) AS bt FROM bg),
    bgc AS (SELECT g, count(*) AS c_ab FROM bg GROUP BY g HAVING count(*) >= 5),
    scored AS (
        SELECT g AS bigram, c_ab,
               ln(CAST(c_ab AS DOUBLE) * t * t / (bt * ua.c * ub.c)) AS pmi
        FROM bgc CROSS JOIN tot CROSS JOIN btot
        JOIN uni ua ON ua.tok = split_part(g, ' ', 1)
        JOIN uni ub ON ub.tok = split_part(g, ' ', 2))
    SELECT bigram, CAST(c_ab AS BIGINT) AS n_pair, round(pmi, 6) AS pmi
    FROM scored ORDER BY pmi DESC, bigram LIMIT 20
    """,
    doc="Corpus collocations: top-20 bigrams by pointwise mutual "
    "information (min pair count 5). Unigram/bigram counts are two "
    "map-side-combined aggregations; the scalar totals broadcast; output "
    "is a global top-k (tiny). PMI is computed with an identical "
    "double-expression shape on both engines so even the ln() inputs are "
    "bit-equal.",
)
def q67(spark: SparkSession, sf: str) -> DataFrame:
    # id-hash pre-exchange spreads both tokenize stages across all cores
    # regardless of scan split count (r10; hashed_shingle_table idiom)
    docs = load(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    toks = docs.select(F.explode(text.tokens(F.col("text"))).alias("tok"))
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = uni.agg(F.sum("c").cast("double").alias("t"))
    bg = docs.select(F.explode(text.word_ngrams(F.col("text"), 2)).alias("g"))
    btot = bg.agg(F.count(F.lit(1)).cast("double").alias("bt"))
    bgc = bg.groupBy("g").agg(F.count(F.lit(1)).alias("c_ab")).filter(F.col("c_ab") >= 5)
    ua = uni.select(F.col("tok").alias("__w1"), F.col("c").alias("__ca"))
    ub = uni.select(F.col("tok").alias("__w2"), F.col("c").alias("__cb"))
    scored = (
        bgc.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
        .withColumn("__w1", F.split_part(F.col("g"), F.lit(" "), F.lit(1)))
        .withColumn("__w2", F.split_part(F.col("g"), F.lit(" "), F.lit(2)))
        .join(F.broadcast(ua), "__w1")
        .join(F.broadcast(ub), "__w2")
        .withColumn(
            "pmi",
            F.log(
                F.col("c_ab").cast("double") * F.col("t") * F.col("t")
                / (F.col("bt") * F.col("__ca") * F.col("__cb"))
            ),
        )
    )
    return (
        scored.orderBy(F.col("pmi").desc(), F.col("g").asc())
        .limit(20)
        .select(
            F.col("g").alias("bigram"),
            F.col("c_ab").alias("n_pair"),
            F.round("pmi", 6).alias("pmi"),
        )
    )


@register(
    "q68_embedding_quantize",
    """
    WITH ex AS (
        SELECT unnest(range(0, len(embedding))) AS dim,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings),
    am AS (SELECT dim, max(abs(v)) AS amax FROM ex GROUP BY dim),
    codes AS (
        SELECT ex.dim, amax,
               CASE WHEN amax = 0 THEN 0
                    ELSE CAST(round(v / amax * 127, 0) AS BIGINT) END AS code
        FROM ex JOIN am USING (dim))
    SELECT CAST(dim AS INT) AS dim,
           round(max(amax), 6) AS amax_r,
           CAST(sum(code) AS BIGINT) AS sum_code,
           CAST(sum(abs(code)) AS BIGINT) AS sum_abs_code,
           CAST(count(CASE WHEN abs(code) = 127 THEN 1 END) AS BIGINT) AS n_sat
    FROM codes GROUP BY dim
    """,
    doc="Per-dimension symmetric int8 quantization of the embedding "
    "column: absmax scale per dimension, code = round(v/amax*127). Output "
    "is per-dim integer aggregates (exact, order-insensitive — no float "
    "summation) plus the rounded scale. Scale shape: the per-dim scale "
    "table is dims-sized and broadcasts back onto the exploded values; "
    "both aggregations are map-side combined.",
)
def q68(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    ex = emb.select(F.posexplode("embedding").alias("dim", "__f")).select(
        "dim", F.col("__f").cast("double").alias("v")
    )
    am = ex.groupBy("dim").agg(F.max(F.abs("v")).alias("amax"))
    codes = ex.join(F.broadcast(am), "dim").select(
        "dim",
        "amax",
        F.when(F.col("amax") == 0, F.lit(0).cast("long"))
        .otherwise(F.round(F.col("v") / F.col("amax") * 127, 0).cast("long"))
        .alias("code"),
    )
    return codes.groupBy(F.col("dim").cast("int").alias("dim")).agg(
        F.round(F.max("amax"), 6).alias("amax_r"),
        F.sum("code").alias("sum_code"),
        F.sum(F.abs("code")).alias("sum_abs_code"),
        F.count(F.when(F.abs(F.col("code")) == 127, 1)).alias("n_sat"),
    )


_CC_SQL = f"""
    {_SHINGLES_SQL},
    inter AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
        FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY a.id, b.id),
    pairs AS (
        SELECT id_a, id_b
        FROM inter JOIN sizes x ON id_a = x.id JOIN sizes y ON id_b = y.id
        WHERE CAST(n_common AS DOUBLE) / (x.n_sh + y.n_sh - n_common) >= {JACCARD_T}),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
    cc AS (
        WITH RECURSIVE walk(node, label) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.src, w.label FROM walk w JOIN edges e ON w.node = e.dst)
        SELECT node AS id, min(label) AS canonical_id FROM walk GROUP BY node)
"""


@register(
    "q69_cluster_representative",
    f"""
    WITH {_CC_SQL},
    ranked AS (
        SELECT cc.canonical_id, d.doc_id,
               {text.token_count_sql('d.text')} AS n_words,
               row_number() OVER (
                   PARTITION BY cc.canonical_id
                   ORDER BY {text.token_count_sql('d.text')} DESC, d.doc_id)
                   AS rk,
               count(*) OVER (PARTITION BY cc.canonical_id) AS gs
        FROM cc JOIN documents d ON d.doc_id = cc.id)
    SELECT canonical_id, doc_id AS rep_doc_id,
           CAST(gs AS BIGINT) AS group_size,
           CAST(n_words AS BIGINT) AS rep_n_words
    FROM ranked WHERE rk = 1
    """,
    doc="Near-dup cluster representative selection: connected components "
    "over n-gram-Jaccard pairs, then keep each group's BEST document "
    "(longest by token count, ties to smallest id) rather than q51's "
    "min-id canonical — the quality-aware dedup survivor policy a "
    "training pipeline actually wants. One window pass over the "
    "(component, doc) table.",
)
def q69(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    pairs = dedup_ops.ngram_jaccard_pairs(docs, "doc_id", "text", NGRAM_N, JACCARD_T)
    comp = dedup_ops.canonicalize_pairs(
        docs.select(F.col("doc_id").alias("id")), pairs.select("id_a", "id_b")
    )
    scored = comp.join(
        docs.select("doc_id", text.token_count(F.col("text")).alias("n_words")),
        comp.id == F.col("doc_id"),
    )
    w = Window.partitionBy("canonical_id")
    ranked = scored.select(
        "canonical_id",
        "doc_id",
        "n_words",
        F.row_number()
        .over(w.orderBy(F.col("n_words").desc(), F.col("doc_id").asc()))
        .alias("rk"),
        F.count(F.lit(1)).over(w).alias("gs"),
    )
    return ranked.filter(F.col("rk") == 1).select(
        "canonical_id",
        F.col("doc_id").alias("rep_doc_id"),
        F.col("gs").alias("group_size"),
        F.col("n_words").cast("long").alias("rep_n_words"),
    )


@register(
    "q73_funnel",
    """
    WITH v AS (
        SELECT user_id, min(ts) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY e.user_id),
    p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id)
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
           CAST(1 + (c.t_click IS NOT NULL)::INT
                  + (p.t_purchase IS NOT NULL)::INT AS INT) AS stage_reached
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
    doc="Ordered event funnel per user: earliest view, earliest click "
    "AFTER that view, earliest purchase AFTER that click — the sequential "
    "constraint that a plain per-type min() gets wrong. Three conditional "
    "aggregations chained on the user key; each stage's type filter pushes "
    "to the scan, the per-user stage tables shrink monotonically, and "
    "every join is keyed on user_id so AQE broadcasts the later stages.",
)
def q73(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id").agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id").agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id", "t_view", "t_click", "t_purchase",
            (
                F.lit(1)
                + F.col("t_click").isNotNull().cast("int")
                + F.col("t_purchase").isNotNull().cast("int")
            ).cast("int").alias("stage_reached"),
        )
    )


@register(
    "q74_key_skew_profile",
    """
    WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id)
    SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(cnt) AS BIGINT) AS max_key_rows,
           round(quantile_cont(cnt, 0.95), 4) AS p95_key_rows,
           (CAST(sum(cnt) AS DOUBLE) / count(*)) AS mean_key_rows
    FROM c
    """,
    doc="Shuffle-key skew profile: per-key row counts for a prospective "
    "join/groupBy key reduced to the numbers that predict skew at scale "
    "(max vs mean vs p95). This is the diagnostic run before choosing "
    "salting/AQE-skew-split for a 100 TB join; two map-side-combined "
    "aggregations, output is one row. Exact percentile matches DuckDB "
    "quantile_cont (q60 semantics); at scale swap percentile_approx.",
)
def q74(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    return c.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_key_rows"),
        F.round(F.expr("percentile(cnt, 0.95)"), 4).alias("p95_key_rows"),
        (F.sum("cnt").cast("double") / F.count(F.lit(1))).alias("mean_key_rows"),
    )


@register(
    "q75_weighted_sample",
    f"""
    WITH sized AS (
        SELECT doc_id, CAST({text.token_count_sql('text')} AS BIGINT) AS n_tok
        FROM documents),
    keyed AS (
        SELECT doc_id, n_tok,
               {corpus_ops.weighted_sample_key_sql('doc_id', 'n_tok')} AS sample_key
        FROM sized WHERE n_tok > 0)
    SELECT doc_id, n_tok, round(sample_key, 6) AS sample_key
    FROM keyed ORDER BY sample_key, doc_id LIMIT 50
    """,
    doc="Weighted sample without replacement (50 docs, inclusion "
    "probability ∝ token count) via Efraimidis-Spirakis exponential keys "
    "computed from the portable id hash — deterministic and "
    "partition-invariant where rand()-based sampling is neither. The "
    "global top-k by key is a TakeOrdered (per-partition heaps, no full "
    "sort) at any scale.",
)
def q75(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select(
        "doc_id", text.token_count(F.col("text")).cast("long").alias("n_tok")
    )
    out = corpus_ops.weighted_sample(docs, "doc_id", "n_tok", k=50)
    return out.select("doc_id", "n_tok", F.round("sample_key", 6).alias("sample_key"))


MIX_BUDGET_SQL = "CASE WHEN source IN ('src0','src1','src2') THEN 600 ELSE 250 END"
CHUNK_WINDOW = 40
CHUNK_STRIDE = 30


@register(
    "q71_corpus_mix",
    f"""
    WITH sized AS (
        SELECT doc_id, source,
               CAST({text.token_count_sql('text')} AS BIGINT) AS n_tok,
               {corpus_ops.split_hash_sql('doc_id')} AS h
        FROM documents),
    ranked AS (
        SELECT doc_id, source, n_tok,
               row_number() OVER (
                   PARTITION BY source ORDER BY h, doc_id) AS mix_rank,
               coalesce(sum(n_tok) OVER (
                   PARTITION BY source ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
        FROM sized)
    SELECT doc_id, source, CAST(mix_rank AS INT) AS mix_rank,
           CAST(cum_before AS BIGINT) AS cum_before
    FROM ranked WHERE cum_before < ({MIX_BUDGET_SQL})
    """,
    doc="Corpus mixing: each source subsampled to a per-source token budget "
    "(600 tokens for src0-2, 250 for the rest), documents taken in "
    "deterministic hash order until the budget is crossed — the quota step "
    "of a data-mixture schedule. One shuffle on the source key; the "
    "running-total window and the quota filter share that partitioning.",
)
def q71(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select(
        "doc_id", "source", text.token_count(F.col("text")).alias("n_tok")
    )
    budget = (
        F.when(F.col("source").isin("src0", "src1", "src2"), F.lit(600))
        .otherwise(F.lit(250))
    )
    out = corpus_ops.mix_by_budget(docs, "source", "doc_id", "n_tok", budget)
    return out.select(
        "doc_id",
        "source",
        F.col("mix_rank").cast("int").alias("mix_rank"),
        F.col("cum_before").cast("long").alias("cum_before"),
    )


@register(
    "q72_chunk_overlap",
    f"""
    WITH toked AS (
        SELECT doc_id, {text.tokens_sql('text')} AS toks FROM documents)
    SELECT doc_id,
           CAST(u.s // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(len(toks[u.s + 1 : u.s + {CHUNK_WINDOW}]) AS INT) AS n_chunk_tok,
           md5(array_to_string(toks[u.s + 1 : u.s + {CHUNK_WINDOW}], ' '))
               AS chunk_md5
    FROM toked, unnest(range(0, len(toks), {CHUNK_STRIDE})) u(s)
    """,
    doc=f"Context-window chunking: overlapping {CHUNK_WINDOW}-token windows "
    f"at stride {CHUNK_STRIDE} per document (last chunk short, empty docs "
    "produce none), each chunk carried as an md5 fingerprint + token "
    "count. Zero shuffles — a pure projection+explode that runs scan-local "
    "at any scale.",
)
def q72(spark: SparkSession, sf: str) -> DataFrame:
    return corpus_ops.chunk_tokens(
        load(spark, sf, "documents"), "doc_id", "text",
        window=CHUNK_WINDOW, stride=CHUNK_STRIDE,
    )


@register(
    "q70_pack_sequences",
    f"""
    WITH RECURSIVE base AS (
        SELECT doc_id,
               CAST({corpus_ops.shard_hash_sql('doc_id', PACK_SHARDS)} AS INT)
                   AS shard,
               CAST({text.token_count_sql('text')} AS BIGINT) AS n_tok,
               row_number() OVER (
                   PARTITION BY {corpus_ops.shard_hash_sql('doc_id', PACK_SHARDS)}
                   ORDER BY doc_id) AS rn
        FROM documents),
    pack AS (
        SELECT shard, rn, doc_id, n_tok, n_tok AS fill, CAST(0 AS BIGINT) AS bin
        FROM base WHERE rn = 1
        UNION ALL
        SELECT d.shard, d.rn, d.doc_id, d.n_tok,
               CASE WHEN p.fill + d.n_tok > {PACK_CAPACITY}
                    THEN d.n_tok ELSE p.fill + d.n_tok END,
               CASE WHEN p.fill + d.n_tok > {PACK_CAPACITY}
                    THEN p.bin + 1 ELSE p.bin END
        FROM pack p JOIN base d ON d.shard = p.shard AND d.rn = p.rn + 1)
    SELECT doc_id, n_tok, shard, bin, fill AS fill_after FROM pack
    """,
    doc="Sharded next-fit sequence packing: documents are sharded by id "
    "hash, each shard packs independently (ordered by id) into "
    f"{PACK_CAPACITY}-token bins. The per-shard recurrence is sequential "
    "by nature, so it runs as an Arrow-batched applyInPandas kernel per "
    "shard — shard count tracks cluster width, which is how packing "
    "parallelizes at corpus scale. Oracle is a recursive CTE running the "
    "identical recurrence.",
)
def q70(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select(
        "doc_id", text.token_count(F.col("text")).alias("n_tok")
    )
    return corpus_ops.pack_next_fit(
        docs, "doc_id", "n_tok", capacity=PACK_CAPACITY, n_shards=PACK_SHARDS
    )


DEBOUNCE_GAP_S = 600
ROLL_WINDOW_S = 3600


@register(
    "q78_event_debounce",
    f"""
    WITH g AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            > {DEBOUNCE_GAP_S} * 1000000
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
    b AS (
        SELECT user_id, event_type, ts,
               sum(brk) OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS burst_id
        FROM g)
    SELECT user_id, event_type, CAST(burst_id AS BIGINT) AS burst_id,
           min(ts) AS burst_start, max(ts) AS burst_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM b GROUP BY user_id, event_type, burst_id
    """,
    doc=f"Event debounce: per (user, type), bursts of events chained "
    f"closer than {DEBOUNCE_GAP_S} s collapse to one row (first "
    "timestamp + size) — gap-based sessionization over event time, "
    "complementing q17/q18's key-change islands. One exchange end-to-end "
    "(break flag, running burst id, and the burst aggregate all share the "
    "key partitioning); gaps compare as exact microsecond integers.",
)
def q78(spark: SparkSession, sf: str) -> DataFrame:
    return ts_ops.debounce(
        load(spark, sf, "events"), ["user_id", "event_type"], "ts", "event_id",
        DEBOUNCE_GAP_S,
    )


@register(
    "q79_rolling_features",
    f"""
    SELECT user_id, ts, event_id,
           CAST(count(*) OVER w AS BIGINT) AS n_window,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE), 6)
               AS sum_window
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL {ROLL_WINDOW_S} SECONDS PRECEDING
                 AND CURRENT ROW)
    """,
    doc=f"Per-event trailing {ROLL_WINDOW_S} s window features (count + "
    "sum) via a RANGE frame over the microsecond epoch — frame membership "
    "is defined by time, not row position, so ties and irregular sampling "
    "are exact and no tie-break ordering is needed. The sum accumulates "
    "in DECIMAL (order-invariant, bit-identical across engines and "
    "partitionings) and surfaces as a double. One exchange on the key, "
    "one window pass.",
)
def q79(spark: SparkSession, sf: str) -> DataFrame:
    return ts_ops.rolling_features(
        load(spark, sf, "events"), "user_id", "ts", "event_id", "value",
        ROLL_WINDOW_S,
    )


WINDOW_GAP_S = 60
INTERVAL_BIN_S = 3600


@register(
    "q81_interval_overlap_join",
    f"""
    WITH g1 AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            > {DEBOUNCE_GAP_S} * 1000000
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
    s1 AS (
        SELECT user_id, event_type, ts,
               sum(brk) OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS burst_id
        FROM g1),
    bursts AS (
        SELECT user_id, event_type, min(ts) AS burst_start, max(ts) AS burst_end
        FROM s1 GROUP BY user_id, event_type, burst_id),
    g2 AS (
        SELECT event_type, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            > {WINDOW_GAP_S} * 1000000
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
    s2 AS (
        SELECT event_type, ts,
               sum(brk) OVER (PARTITION BY event_type ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS win_id
        FROM g2),
    wins AS (
        SELECT event_type, min(ts) AS window_start, max(ts) AS window_end
        FROM s2 GROUP BY event_type, win_id)
    SELECT x.user_id, x.event_type AS burst_type, x.burst_start,
           w.event_type AS window_type, w.window_start
    FROM bursts x JOIN wins w
      ON x.event_type <> w.event_type
     AND x.burst_start <= w.window_end AND w.window_start <= x.burst_end
    """,
    doc=f"Interval-overlap join: per-(user,type) activity bursts "
    f"(gap {DEBOUNCE_GAP_S} s) joined to cross-type global spike windows "
    f"(gap {WINDOW_GAP_S} s) on closed-interval overlap — 'which user "
    "bursts co-occurred with spikes of a different event type'. The "
    "engine form bins both interval sets into fixed time bins, "
    "equi-joins on the bin, refines the exact predicate in-task, and "
    "emits multi-bin pairs exactly once via the overlap-start bin rule — "
    "no theta-join/BroadcastNestedLoop, both sides shuffle once. The "
    "oracle is the naive overlap join.",
)
def q81(spark: SparkSession, sf: str) -> DataFrame:
    from .operators import joins as join_ops

    ev = load(spark, sf, "events")
    bursts = ts_ops.debounce(
        ev, ["user_id", "event_type"], "ts", "event_id", DEBOUNCE_GAP_S
    ).select("user_id", "event_type", "burst_start", "burst_end")
    wins = ts_ops.debounce(ev, ["event_type"], "ts", "event_id", WINDOW_GAP_S).select(
        "event_type", F.col("burst_start").alias("window_start"),
        F.col("burst_end").alias("window_end"),
    )
    pairs = join_ops.interval_overlap_join(
        bursts, wins,
        "burst_start", "burst_end", "window_start", "window_end",
        bin_s=INTERVAL_BIN_S,
    )
    return (
        pairs.filter(F.col("a_event_type") != F.col("b_event_type"))
        .select(
            F.col("a_user_id").alias("user_id"),
            F.col("a_event_type").alias("burst_type"),
            F.col("a_burst_start").alias("burst_start"),
            F.col("b_event_type").alias("window_type"),
            F.col("b_window_start").alias("window_start"),
        )
    )


@register(
    "q82_transition_matrix",
    """
    WITH p AS (
        SELECT event_type AS from_state,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS to_state
        FROM events),
    c AS (
        SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n_transitions
        FROM p WHERE to_state IS NOT NULL
        GROUP BY from_state, to_state)
    SELECT from_state, to_state, n_transitions,
           CAST(n_transitions AS DOUBLE)
               / sum(n_transitions) OVER (PARTITION BY from_state) AS p
    FROM c
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences (counts + per-source-state probabilities) — the "
    "user-journey profile. One key-partitioned lead-window pass, then a "
    "|states|^2 aggregate whose exchange moves only map-side-combined "
    "partials; probabilities are exact integer-ratio doubles.",
)
def q82(spark: SparkSession, sf: str) -> DataFrame:
    return ts_ops.transition_matrix(
        load(spark, sf, "events"), "user_id", "ts", "event_id", "event_type"
    )


HOP_LEN_S = 3600
HOP_SLIDE_S = 900


@register(
    "q83_hopping_windows",
    f"""
    WITH w AS (
        SELECT event_type, user_id,
               make_timestamp(
                   (epoch_us(ts) // ({HOP_SLIDE_S} * 1000000))
                       * ({HOP_SLIDE_S} * 1000000)
                   - CAST(k.k AS BIGINT) * {HOP_SLIDE_S} * 1000000)
                   AS window_start
        FROM events, unnest([0, 1, 2, 3]) k(k))
    SELECT event_type, window_start,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM w GROUP BY event_type, window_start
    """,
    doc=f"Hopping (sliding) window aggregation: {HOP_LEN_S // 60}-minute "
    f"windows every {HOP_SLIDE_S // 60} minutes per event type — counts "
    "and distinct users. Spark's window() expands each event to its "
    "len/slide = 4 overlapping windows in a projection (no self-join); "
    "the aggregate shuffles map-side-combined partials. The identical "
    "epoch-aligned expansion is spelled out in the oracle with unnest.",
)
def q83(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    return (
        ev.groupBy(
            F.window("ts", f"{HOP_LEN_S} seconds", f"{HOP_SLIDE_S} seconds"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .select(
            "event_type",
            F.col("window.start").alias("window_start"),
            "n_events",
            "n_users",
        )
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "q84_set_ops",
    """
    WITH a AS (SELECT DISTINCT md5(text) AS digest FROM documents
               WHERE source IN ('src0','src1','src2','src3','src4')),
    b AS (SELECT DISTINCT md5(text) AS digest FROM documents
          WHERE source NOT IN ('src0','src1','src2','src3','src4')),
    i AS (SELECT digest FROM a INTERSECT SELECT digest FROM b),
    ea AS (SELECT digest FROM a EXCEPT SELECT digest FROM b),
    eb AS (SELECT digest FROM b EXCEPT SELECT digest FROM a)
    SELECT 'intersect' AS op, CAST(count(*) AS BIGINT) AS n FROM i
    UNION ALL
    SELECT 'only_a' AS op, CAST(count(*) AS BIGINT) AS n FROM ea
    UNION ALL
    SELECT 'only_b' AS op, CAST(count(*) AS BIGINT) AS n FROM eb
    """,
    doc="Set operations (O4 beyond union): content-digest INTERSECT / "
    "EXCEPT between two source groups — 'which texts appear in both "
    "halves of the corpus, which are exclusive'. Spark plans INTERSECT/"
    "EXCEPT as left-semi/left-anti hash joins over the distinct sets — "
    "same shuffle discipline as every other digest operator.",
)
def q84(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    grp_a = F.col("source").isin("src0", "src1", "src2", "src3", "src4")
    a = docs.filter(grp_a).select(F.md5("text").alias("digest")).distinct()
    b = docs.filter(~grp_a).select(F.md5("text").alias("digest")).distinct()
    def tagged(df: DataFrame, op: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(op).alias("op"), F.col("n")
        )
    return (
        tagged(a.intersect(b), "intersect")
        .unionByName(tagged(a.subtract(b), "only_a"))
        .unionByName(tagged(b.subtract(a), "only_b"))
    )


@register(
    "q85_pivot",
    """
    SELECT user_id,
           CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
           CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
               AS purchase,
           CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
           CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
    FROM events GROUP BY user_id
    """,
    doc="Pivot long->wide: per-user event counts spread into one column "
    "per event type. The value list is EXPLICIT (pivot('event_type', "
    "[...])) so Spark skips the extra distinct-values job and the output "
    "schema is deterministic — the rule for pivots at scale; the "
    "aggregate itself is one map-side-combined exchange, identical to a "
    "plain groupBy.",
)
def q85(spark: SparkSession, sf: str) -> DataFrame:
    out = (
        load(spark, sf, "events")
        .groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES]
    )


@register(
    "q86_unpivot",
    """
    SELECT l_orderkey, l_linenumber, measure, value
    FROM (
        SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
               CAST(l_quantity AS DOUBLE) AS value FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'extendedprice',
               CAST(l_extendedprice AS DOUBLE) FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount',
               CAST(l_discount AS DOUBLE) FROM lineitem)
    WHERE value IS NOT NULL
    """,
    doc="Unpivot wide->long (the melt the sink layer uses to turn gridded "
    "variables into store rows, sinks/export.py melt_values): three "
    "measure columns become (measure, value) pairs. Spark's unpivot/"
    "Expand emits all measures in ONE scan pass — the oracle spells the "
    "same result as a 3-way UNION ALL, which would scan three times "
    "without columnar sharing.",
)
def q86(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber",
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_extendedprice").cast("double").alias("extendedprice"),
        F.col("l_discount").cast("double").alias("discount"),
    )
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["quantity", "extendedprice", "discount"],
        "measure",
        "value",
    )


# ---------------------------------------------------------------------------
# q101-q104 — round-4 training-loop surface: deterministic epoch shuffle,
# length-grouped batching, class rebalancing, length-percentile profiles
# ---------------------------------------------------------------------------

_SHUF_H = corpus_ops.shuffle_hash_sql("doc_id", "epoch0")

@register(
    "q101_train_order",
    f"""
    WITH o AS (
        SELECT doc_id,
               CAST({_SHUF_H} % 8 AS INTEGER) AS shuffle_bucket,
               CAST(row_number() OVER (
                   PARTITION BY {_SHUF_H} % 8
                   ORDER BY {_SHUF_H}, doc_id) AS INTEGER) AS shuffle_pos
        FROM documents)
    SELECT shuffle_bucket, shuffle_pos, doc_id
    FROM o WHERE shuffle_pos <= 3
    """,
    doc="Deterministic global training-order shuffle (epoch permutation): "
    "seeded-hash bucket + per-bucket rank give every example a stable "
    "(bucket, pos) coordinate — a uniform permutation reproducible across "
    "engines and partitionings, unlike orderBy(rand()). One exchange on "
    "the bucket key, per-bucket sorts, NO global sort; a new epoch is a "
    "new seed with the identical plan. The query returns each bucket's "
    "first 3 examples (the permutation's head, enough to pin membership "
    "and order).",
)
def q101(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select("doc_id")
    ordered = corpus_ops.train_order(docs, "doc_id", seed="epoch0", n_buckets=8)
    return ordered.filter(F.col("shuffle_pos") <= 3).select(
        "shuffle_bucket", "shuffle_pos", "doc_id"
    )


@register(
    "q102_length_batches",
    f"""
    WITH b AS (
        SELECT doc_id, n_chars,
               CAST(floor((n_chars - 1) / 64) AS INTEGER) AS len_bucket
        FROM documents),
    r AS (
        SELECT len_bucket, n_chars,
               row_number() OVER (
                   PARTITION BY len_bucket ORDER BY n_chars, doc_id) - 1 AS rn
        FROM b),
    batches AS (
        SELECT len_bucket, CAST(floor(rn / 16) AS BIGINT) AS batch_idx,
               count(*) AS n_rows, max(n_chars) AS mx, sum(n_chars) AS sm
        FROM r GROUP BY 1, 2)
    SELECT len_bucket,
           CAST(count(*) AS BIGINT) AS n_batches,
           CAST(sum(n_rows) AS BIGINT) AS n_docs,
           CAST(sum(mx * n_rows - sm) AS BIGINT) AS padding,
           CAST(sum(mx * n_rows) AS BIGINT) AS padded_cells
    FROM batches GROUP BY 1
    """,
    doc="Length-grouped batching profile (dynamic-padding assembly): "
    "integer length bands -> per-band (length, id) order -> fixed-size "
    "batches of 16; padding waste per batch is batch_max*|batch| - sum "
    "(what padding-to-batch-max costs). Grouping by length is what keeps "
    "padding/padded_cells small — the per-band totals here are the "
    "skyline a batching policy is judged by. One exchange on the band "
    "key + one window pass + map-side-combined aggregate.",
)
def q102(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select("doc_id", "n_chars")
    rows = corpus_ops.length_batches(docs, "doc_id", "n_chars", batch_size=16)
    per_batch = rows.groupBy("len_bucket", "batch_idx").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max("n_chars").alias("mx"),
        F.sum("n_chars").alias("sm"),
    )
    return per_batch.groupBy("len_bucket").agg(
        F.count(F.lit(1)).alias("n_batches"),
        F.sum("n_rows").alias("n_docs"),
        F.sum(F.col("mx") * F.col("n_rows") - F.col("sm")).alias("padding"),
        F.sum(F.col("mx") * F.col("n_rows")).alias("padded_cells"),
    )


_BAL_H = corpus_ops.shuffle_hash_sql("vec_id", "class-balance")

@register(
    "q103_class_balance",
    f"""
    WITH m AS (
        SELECT min(n) AS min_class FROM (
            SELECT count(*) AS n FROM embeddings GROUP BY label)),
    kept AS (
        SELECT label, vec_id
        FROM (
            SELECT label, vec_id,
                   row_number() OVER (
                       PARTITION BY label
                       ORDER BY {_BAL_H}, vec_id) AS balance_rank
            FROM embeddings), m
        WHERE balance_rank <= m.min_class)
    SELECT label, CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(vec_id) AS BIGINT) AS id_sum
    FROM kept GROUP BY label
    """,
    doc="Deterministic class rebalancing: undersample every label to the "
    "minority-class size by per-class hash rank (uniform without "
    "replacement, reproducible). Per-class counts reduce map-side to "
    "|classes| rows, the global min joins back as a broadcast single row, "
    "membership is one rank window over the label-keyed exchange. id_sum "
    "pins the exact kept membership, not just the counts.",
)
def q103(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings").select("vec_id", "label")
    kept = corpus_ops.class_balance(emb, "label", "vec_id")
    return kept.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("vec_id").alias("id_sum"),
    )


@register(
    "q104_length_percentiles",
    """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(quantile_cont(n_chars, 0.25), 6) AS p25,
           round(quantile_cont(n_chars, 0.50), 6) AS p50,
           round(quantile_cont(n_chars, 0.75), 6) AS p75,
           round(quantile_cont(n_chars, 0.95), 6) AS p95
    FROM documents GROUP BY lang
    """,
    doc="Per-language document-length percentile profile with EXACT "
    "(interpolated) percentiles — the corpus-profiling numbers a mixture "
    "or truncation policy is tuned against. Spark's percentile() "
    "aggregate matches DuckDB's quantile_cont bit-for-bit at 6 dp; at "
    "100 TB swap percentile_approx (t-digest sketch, mergeable map-side) "
    "for the exact sort-based form when 1e-3 relative error suffices — "
    "same query shape, documented accuracy trade.",
)
def q104(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select("lang", "n_chars")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.percentile("n_chars", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("n_chars", F.lit(0.50)), 6).alias("p50"),
        F.round(F.percentile("n_chars", F.lit(0.75)), 6).alias("p75"),
        F.round(F.percentile("n_chars", F.lit(0.95)), 6).alias("p95"),
    )


_EP_BAL_H = corpus_ops.shuffle_hash_sql("doc_id", "class-balance")
_EP_SHUF_H = corpus_ops.shuffle_hash_sql("doc_id", "epoch0")

@register(
    "q105_epoch_pipeline",
    f"""
    WITH m AS (
        SELECT min(n) AS min_class FROM (
            SELECT count(*) AS n FROM documents GROUP BY lang)),
    bal AS (
        SELECT doc_id, n_chars FROM (
            SELECT doc_id, n_chars,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY {_EP_BAL_H}, doc_id) AS r
            FROM documents), m
        WHERE r <= m.min_class),
    ord_b AS (
        SELECT doc_id, n_chars,
               CAST({_EP_SHUF_H} % 8 AS INTEGER) AS shuffle_bucket
        FROM bal),
    rows_b AS (
        SELECT shuffle_bucket,
               CAST(floor((n_chars - 1) / 64) AS INTEGER) AS len_bucket,
               n_chars,
               row_number() OVER (
                   PARTITION BY shuffle_bucket, floor((n_chars - 1) / 64)
                   ORDER BY n_chars, doc_id) - 1 AS rn
        FROM ord_b),
    batches AS (
        SELECT shuffle_bucket, len_bucket,
               CAST(floor(rn / 16) AS BIGINT) AS batch_idx,
               count(*) AS n_rows, max(n_chars) AS mx, sum(n_chars) AS sm
        FROM rows_b GROUP BY 1, 2, 3)
    SELECT shuffle_bucket,
           CAST(count(*) AS BIGINT) AS n_batches,
           CAST(sum(n_rows) AS BIGINT) AS n_docs,
           CAST(sum(mx * n_rows - sm) AS BIGINT) AS padding
    FROM batches GROUP BY 1
    """,
    doc="The epoch-dataloader pipeline as ONE declarative plan (the "
    "training-loop counterpart of q100's corpus-prep): class-balance to "
    "the minority language -> deterministic epoch shuffle into 8 buckets "
    "-> length-grouped batches of 16 WITHIN each shuffle bucket (the "
    "bucketed-shuffle + length-batching dataloader scheme: epoch-varying "
    "order across buckets, bounded padding within). Reports per-bucket "
    "batch count, docs, and padding waste. Exactly two exchanges carry "
    "corpus-sized data (lang rank window; bucket+band batching window, "
    "whose clustering the per-batch aggregate reuses) — the class-count "
    "and final per-bucket exchanges move aggregate-sized rows, the "
    "min-class scalar is a one-row broadcast, and the epoch-shuffle rank "
    "is never computed at all (column-pruned: only its bucket projection "
    "is consumed).",
)
def q105(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select("doc_id", "lang", "n_chars")
    bal = corpus_ops.class_balance(docs, "lang", "doc_id").drop("balance_rank")
    ordd = corpus_ops.train_order(bal, "doc_id", seed="epoch0", n_buckets=8)
    rows = corpus_ops.length_batches(
        ordd, "doc_id", "n_chars", batch_size=16,
        partition_cols=["shuffle_bucket"],
    )
    per_batch = rows.groupBy("shuffle_bucket", "len_bucket", "batch_idx").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max("n_chars").alias("mx"),
        F.sum("n_chars").alias("sm"),
    )
    return per_batch.groupBy("shuffle_bucket").agg(
        F.count(F.lit(1)).alias("n_batches"),
        F.sum("n_rows").alias("n_docs"),
        F.sum(F.col("mx") * F.col("n_rows") - F.col("sm")).alias("padding"),
    )


# ---------------------------------------------------------------------------
# q117 — PageRank over the event-type transition graph (operators/graph.py)
# ---------------------------------------------------------------------------

from .operators import graph as graph_ops  # noqa: E402

PR_ITERS = 10


@register(
    "q117_transition_pagerank",
    f"""
    WITH edges AS (
        SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n_transitions
        FROM (
            SELECT event_type AS from_state,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS to_state
            FROM events)
        WHERE to_state IS NOT NULL
        GROUP BY from_state, to_state),
    {graph_ops.pagerank_sql("edges", "from_state", "to_state",
                            "n_transitions", iters=PR_ITERS)}
    SELECT node, round(pr, 6) AS pagerank FROM pr{PR_ITERS}
    """,
    doc="Weighted PageRank over the first-order event-type transition "
    "graph (q82's edge table): quality-signal propagation — rank states "
    "by stationary visit probability so downstream sampling can weight "
    f"by source rank. {PR_ITERS} damped iterations (d=0.85) with "
    "dangling-mass redistribution, keeping sum(pr)=1 exactly; the oracle "
    "unrolls the identical rounds as CTEs (operators/graph.pagerank_sql), "
    "so the rank VALUES are oracle-checked, not just the ordering. Scale "
    "shape: the heavy stage is the one window+groupBy building the edge "
    "table (|states|^2 rows, map-side combined); each iteration is two "
    "hash exchanges on the rank vector with lineage cut every round "
    "(plan-pinned in test_plan_quality.py).",
)
def q117(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    edges = ts_ops.transition_matrix(
        ev, "user_id", "ts", "event_id", "event_type"
    ).select("from_state", "to_state", "n_transitions")
    pr = graph_ops.pagerank(
        edges, "from_state", "to_state", "n_transitions", iters=PR_ITERS
    )
    return pr.select("node", F.round("pr", 6).alias("pagerank"))


# ---------------------------------------------------------------------------
# q119 — triangle counts / local clustering on the rare-shingle
# co-occurrence graph (operators/graph.triangle_counts)
# ---------------------------------------------------------------------------

RARE_DF_MIN = 2
RARE_DF_MAX = 8


def _rare_shingle_occurrences(spark: SparkSession, sf: str) -> DataFrame:
    """(id, h) shingle occurrences restricted to rare shingles
    (corpus df in [RARE_DF_MIN, RARE_DF_MAX]) — the shared front end of the
    q119/q121/q123/q124 graph family.

    r10 (second pass): the df restriction is a WINDOW count over the
    shingle-hash partition, not an aggregate⋈occurrences join — the
    shingle table then has exactly ONE consumer, so the 2.6M-row
    intermediate checkpoint that existed to dedupe the df-aggregate and
    join-probe subtrees (6.5 s of every graph build at sf1: materialize
    + write) disappears with the join. One exchange on h, one window
    pass, and only the 0.67M rare-occurrence rows are checkpointed for
    the downstream self-join sides. Window count over the h partition ==
    the old groupBy(h) count joined back — results identical."""
    docs = load(spark, sf, "documents")
    from pyspark.sql import Window

    sh = dedup_ops.hashed_shingle_table(docs, "doc_id", "text", NGRAM_N)
    dfc = F.count(F.lit(1)).over(Window.partitionBy("h"))
    return (
        sh.withColumn("__df", dfc)
        .filter(
            (F.col("__df") >= RARE_DF_MIN) & (F.col("__df") <= RARE_DF_MAX)
        )
        .select("id", "h")
        .localCheckpoint(eager=False)
    )


_Q119_EDGES_SQL = f"""
    WITH {_SHINGLES_SQL},
    sdf AS (SELECT shingle, count(*) AS df FROM shingles GROUP BY shingle),
    rare AS (SELECT shingle FROM sdf
             WHERE df BETWEEN {RARE_DF_MIN} AND {RARE_DF_MAX}),
    edges AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM shingles a
        JOIN rare USING (shingle)
        JOIN shingles b ON a.shingle = b.shingle AND a.id < b.id)"""

from .operators.graph import triangle_counts_sql  # noqa: E402


@register(
    "q119_neardup_graph_triangles",
    f"""{_Q119_EDGES_SQL},
    {triangle_counts_sql("edges", "id_a", "id_b")}
    SELECT node AS doc_id, CAST(deg AS BIGINT) AS deg, n_tri,
           round(lcc, 6) AS lcc
    FROM tri_nodes
    """,
    doc="Triangle counts + local clustering coefficient per document over "
    "the rare-shingle co-occurrence graph (docs sharing a shingle with "
    f"corpus frequency {RARE_DF_MIN}-{RARE_DF_MAX} — the LSH-candidate "
    "graph before Jaccard verification). High-LCC nodes sit in cliquish "
    "near-dup clusters (boilerplate families); low-LCC high-degree nodes "
    "are hub false-positives — the standard graph diagnostic for tuning "
    "dedup thresholds. Algorithm: degree-ordered compact-forward wedge "
    "join (oriented low→high rank), which caps out-degree at O(sqrt|E|) "
    "so hub nodes cannot explode the wedge exchange; every triangle is "
    "counted exactly once at its minimum-rank apex. The SQL oracle runs "
    "the textually-parallel orientation so both engines count identical "
    "triangles.",
)
def q119(spark: SparkSession, sf: str) -> DataFrame:
    shr = _rare_shingle_occurrences(spark, sf)
    a = shr.select(F.col("id").alias("id_a"), "h")
    b = shr.select(F.col("id").alias("id_b"), "h")
    edges = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    tri = graph_ops.triangle_counts(edges, "id_a", "id_b")
    return tri.select(
        F.col("node").alias("doc_id"),
        F.col("deg").cast("long").alias("deg"),
        "n_tri",
        F.round("lcc", 6).alias("lcc"),
    )


# ---------------------------------------------------------------------------
# q120 — block-scoped mutual-kNN graph (operators/similarity.mutual_knn)
# ---------------------------------------------------------------------------

from .functions import vector  # noqa: E402
from .operators import similarity as sim_ops  # noqa: E402

MUTUAL_K = 10


@register(
    "q120_mutual_knn_graph",
    f"""
    WITH sub AS (
        SELECT vec_id, embedding, label FROM embeddings WHERE label IN (0, 1)),
    scored AS (
        SELECT a.vec_id AS qid, b.vec_id AS nid,
               {vector.cosine_sql('a.embedding', 'b.embedding')} AS cos
        FROM sub a JOIN sub b
          ON a.label = b.label AND a.vec_id <> b.vec_id),
    ranked AS (
        SELECT qid, nid, cos, row_number() OVER (
            PARTITION BY qid ORDER BY cos DESC, nid) AS rnk
        FROM scored),
    knn AS (SELECT * FROM ranked WHERE rnk <= {MUTUAL_K})
    SELECT x.qid AS id_a, x.nid AS id_b,
           CAST(x.rnk AS INT) AS rank_ab, CAST(y.rnk AS INT) AS rank_ba,
           round(x.cos, 6) AS cos
    FROM knn x JOIN knn y
      ON x.qid = y.nid AND x.nid = y.qid AND x.qid < x.nid
    """,
    doc="Mutual-kNN graph over embedding blocks (labels 0-1 stand in for "
    "IVF cells): an undirected edge exists iff each endpoint is in the "
    "other's top-k cosine neighbors — the symmetric neighborhood graph "
    "graph-based semantic-dedup and agglomerative-clustering pipelines "
    "build before community detection (mutuality filters hub noise). "
    "Scale: pair work confined to blocks (Σ|block|², never |corpus|²), "
    "and the per-block top-k is ONE chunked numpy Gram product in "
    "applyInPandas — the relational pair join cost 188 s at the 10x "
    "fixture (625M interpreted cosine folds) where the BLAS kernel takes "
    "2.2 s; only |block|·k rows leave each task, mutualization is one "
    "self-equi-join of the k-bounded kNN table on the reversed pair key "
    "(kernel='sql' keeps the windowed relational form, "
    "differential-tested).",
)
def q120(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings").filter(F.col("label").isin(0, 1))
    out = sim_ops.mutual_knn(emb, "vec_id", "embedding", "label", k=MUTUAL_K)
    return out.select(
        "id_a",
        "id_b",
        F.col("rank_ab").cast("int").alias("rank_ab"),
        F.col("rank_ba").cast("int").alias("rank_ba"),
        F.round("cos", 6).alias("cos"),
    )


# ---------------------------------------------------------------------------
# q121 — label-propagation communities on the weighted rare-shingle graph
# (operators/graph.label_propagation)
# ---------------------------------------------------------------------------

from .operators.graph import label_propagation_sql  # noqa: E402

LPA_ITERS = 4
_Q121_WEDGES_SQL = f"""
    WITH {_SHINGLES_SQL},
    sdf AS (SELECT shingle, count(*) AS df FROM shingles GROUP BY shingle),
    rare AS (SELECT shingle FROM sdf
             WHERE df BETWEEN {RARE_DF_MIN} AND {RARE_DF_MAX}),
    wedges AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
        FROM shingles a
        JOIN rare USING (shingle)
        JOIN shingles b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY a.id, b.id)"""


@register(
    "q121_neardup_graph_communities",
    f"""{_Q121_WEDGES_SQL},
    {label_propagation_sql("wedges", "id_a", "id_b", "n_common",
                           iters=LPA_ITERS)}
    SELECT node AS doc_id, community FROM lp{LPA_ITERS}
    """,
    doc="Label-propagation communities (Raghavan 2007, synchronous, "
    f"{LPA_ITERS} fixed rounds, min-label tie-break) over the weighted "
    "rare-shingle co-occurrence graph (weight = number of shared rare "
    "shingles). Communities are the boilerplate/near-dup FAMILIES that "
    "connected components over-merge — one spurious shared shingle glues "
    "two CC groups, but LPA keeps them apart unless the bridge carries "
    "real weight. Per round: edges ⋈ labels → groupBy(node, label) "
    "partial-agg → rank-1 window argmax (WindowGroupLimit-bounded), with "
    "the |nodes|-row label vector lineage-cut every round (pagerank "
    "cadence); integer weights make the argmax engine-portable. The "
    "oracle unrolls the identical rounds as CTEs.",
)
def q121(spark: SparkSession, sf: str) -> DataFrame:
    shr = _rare_shingle_occurrences(spark, sf)
    a = shr.select(F.col("id").alias("id_a"), "h")
    b = shr.select(F.col("id").alias("id_b"), "h")
    wedges = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    lp = graph_ops.label_propagation(
        wedges, "id_a", "id_b", "n_common", iters=LPA_ITERS
    )
    return lp.select(F.col("node").alias("doc_id"), "community")


# ---------------------------------------------------------------------------
# q123 — k-core membership on the rare-shingle graph (operators/graph.k_core)
# ---------------------------------------------------------------------------

from .operators.graph import k_core_sql  # noqa: E402

KCORE_ITERS = 4


@register(
    "q123_neardup_graph_kcore",
    f"""{_Q119_EDGES_SQL},
    {k_core_sql("edges", "id_a", "id_b", k=None, iters=KCORE_ITERS)}
    SELECT node AS doc_id, deg FROM kcore
    """,
    doc=f"k-core membership ({KCORE_ITERS} simultaneous peeling rounds) "
    "over the rare-shingle co-occurrence graph, with k self-scaled to "
    "floor(lower-quartile initial degree) — a fixed k that peels one corpus is a "
    "no-op on a denser one (the sf0.01 graph's min degree is 5). Each "
    "round drops every node whose degree in the surviving subgraph is "
    "< k: dense boilerplate families survive; chains and hub artifacts — "
    "high raw degree, low induced connectivity — peel away first. The "
    "density complement of q119's triangle/LCC view and the precursor of "
    "core-based curation sampling. Scale shape: the symmetrized edge "
    "table is materialized once and NEVER rewritten — each round is two "
    "hash joins of the edges against the monotonically-shrinking "
    "node-sized alive vector (AQE-broadcast while it fits) + one "
    "map-side-combined degree count; only the alive vector is "
    "lineage-cut per round; the quartile-k calibration is a one-row "
    "control-plane collect. The oracle unrolls the identical rounds as "
    "CTEs, so membership AND induced degrees are hash-checked.",
)
def q123(spark: SparkSession, sf: str) -> DataFrame:
    shr = _rare_shingle_occurrences(spark, sf)
    a = shr.select(F.col("id").alias("id_a"), "h")
    b = shr.select(F.col("id").alias("id_b"), "h")
    edges = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    kc = graph_ops.k_core(edges, "id_a", "id_b", k=None, iters=KCORE_ITERS)
    return kc.select(F.col("node").alias("doc_id"), "deg")


# ---------------------------------------------------------------------------
# q124 — personalized PageRank seed expansion
# (operators/graph.personalized_pagerank)
# ---------------------------------------------------------------------------

from .operators.graph import personalized_pagerank_sql  # noqa: E402

PPR_ITERS = 8
PPR_SEED_MAX = 10


@register(
    "q124_seed_expansion_ppr",
    f"""{_Q121_WEDGES_SQL},
    wsym AS (SELECT id_a AS a, id_b AS b, n_common FROM wedges
             UNION ALL SELECT id_b, id_a, n_common FROM wedges),
    pseeds AS (SELECT doc_id AS node FROM documents
               WHERE doc_id < {PPR_SEED_MAX}),
    {personalized_pagerank_sql("wsym", "a", "b", "n_common", "pseeds",
                               iters=PPR_ITERS)}
    SELECT node AS doc_id, round(pr, 6) AS ppr FROM ppr{PPR_ITERS}
    """,
    doc="Personalized PageRank (random walk with restart) over the "
    "weighted rare-shingle graph, teleporting to a curated seed set "
    f"(doc_id < {PPR_SEED_MAX}): the canonical seed-EXPANSION curation "
    "move — score every document by damped-walk proximity to known-good "
    "seeds, then sample by that weight (what q75's weighted sampler "
    f"consumes). {PPR_ITERS} rounds at d=0.85 with dangling mass "
    "restarting AT THE SEEDS, keeping sum(ppr)=1 exactly; the oracle "
    "unrolls the identical rounds as CTEs so proximity VALUES are "
    "hash-checked at 6 dp. Scale shape mirrors q117: the heavy stage is "
    "the one wedge exchange building the weighted edges; each round is "
    "two hash exchanges on the node-sized rank vector (lineage-cut per "
    "round), and the seed flag rides the checkpointed node vector.",
)
def q124(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    shr = _rare_shingle_occurrences(spark, sf)
    a = shr.select(F.col("id").alias("id_a"), "h")
    b = shr.select(F.col("id").alias("id_b"), "h")
    wedges = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    # symmetrize via explode — one pass over the wedge aggregate; the
    # pre-r10 self-union planned (and executed) it twice (same rows)
    wsym = wedges.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("a"),
                    F.col("id_b").alias("b"),
                    F.col("n_common"),
                ),
                F.struct(
                    F.col("id_b").alias("a"),
                    F.col("id_a").alias("b"),
                    F.col("n_common"),
                ),
            )
        ).alias("__e")
    ).select("__e.a", "__e.b", "__e.n_common")
    seeds = docs.filter(F.col("doc_id") < PPR_SEED_MAX).select(
        F.col("doc_id").alias("node")
    )
    ppr = graph_ops.personalized_pagerank(
        wsym, "a", "b", "n_common", seeds, iters=PPR_ITERS
    )
    return ppr.select(
        F.col("node").alias("doc_id"), F.round("ppr", 6).alias("ppr")
    )


# ---------------------------------------------------------------------------
# q125 — semantic cluster profile: mutual-kNN graph -> connected components
# -> per-cluster profile (the graph family composed end-to-end)
# ---------------------------------------------------------------------------


@register(
    "q125_semantic_cluster_profile",
    f"""
    WITH scored AS (
        SELECT a.vec_id AS qid, b.vec_id AS nid,
               {vector.cosine_sql('a.embedding', 'b.embedding')} AS cos
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id <> b.vec_id),
    ranked AS (
        SELECT qid, nid, cos, row_number() OVER (
            PARTITION BY qid ORDER BY cos DESC, nid) AS rnk
        FROM scored),
    knn AS (SELECT * FROM ranked WHERE rnk <= {MUTUAL_K}),
    mutual AS (
        SELECT x.qid AS id_a, x.nid AS id_b, x.cos
        FROM knn x JOIN knn y
          ON x.qid = y.nid AND x.nid = y.qid AND x.qid < x.nid),
    medges AS (SELECT id_a AS src, id_b AS dst FROM mutual
               UNION SELECT id_b, id_a FROM mutual),
    cc AS (
        WITH RECURSIVE walk(node, lbl) AS (
            SELECT vec_id, vec_id FROM embeddings
            UNION
            SELECT e.src, w.lbl FROM walk w JOIN medges e ON w.node = e.dst)
        SELECT node AS id, min(lbl) AS canonical_id FROM walk GROUP BY node),
    sizes AS (SELECT canonical_id, CAST(count(*) AS BIGINT) AS n_vectors
              FROM cc GROUP BY canonical_id),
    eprof AS (
        SELECT c.canonical_id, CAST(count(*) AS BIGINT) AS n_edges,
               min(m.cos) AS min_cos, max(m.cos) AS max_cos
        FROM mutual m JOIN cc c ON m.id_a = c.id
        GROUP BY c.canonical_id)
    SELECT s.canonical_id, s.n_vectors,
           coalesce(e.n_edges, 0) AS n_edges,
           round(e.min_cos, 6) AS min_cos, round(e.max_cos, 6) AS max_cos
    FROM sizes s LEFT JOIN eprof e USING (canonical_id)
    """,
    doc="The graph family composed end-to-end as ONE declarative plan: "
    f"mutual-kNN graph (k={MUTUAL_K}, every label block) -> connected "
    "components -> per-cluster profile (size, mutual-edge count, min/max "
    "edge cosine) — the semantic-clustering pass that sits between "
    "embedding generation and cluster-level curation decisions "
    "(SemDeDup-style pruning, cluster-balanced sampling). min/max are "
    "order-insensitive aggregates, so the profile is engine-portable "
    "with no float-summation caveat; singleton clusters surface with "
    "n_edges=0 and NULL cosines. Scale shape: the kNN stage is the q120 "
    "block-matmul kernel (only |block|·k rows leave each task), "
    "mutualization and the profile are k-bounded equi-joins, and the "
    "component step is alternating large-star/small-star (O(log n) "
    "rounds, no hub neighbor lists). Oracle: the identical kNN/CC "
    "pipeline with a recursive min-label CTE.",
)
def q125(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    # one checkpoint pins the kNN kernel to a single evaluation: the CC
    # step materializes it eagerly anyway (its own round checkpoints),
    # and the edge-profile branch below re-planned the whole block-matmul
    # otherwise (r10 — measured 3.8 s/rep of pure recompute at sf1)
    edges = sim_ops.mutual_knn(
        emb, "vec_id", "embedding", "label", k=MUTUAL_K
    ).localCheckpoint(eager=False)
    comp = dedup_ops.canonicalize_pairs_star(
        emb.select(F.col("vec_id").alias("id")),
        edges.select("id_a", "id_b"),
    )
    sizes = comp.groupBy("canonical_id").agg(
        F.count(F.lit(1)).alias("n_vectors")
    )
    eprof = (
        edges.join(
            comp.select(F.col("id").alias("id_a"), "canonical_id"), "id_a"
        )
        .groupBy("canonical_id")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.min("cos").alias("min_cos"),
            F.max("cos").alias("max_cos"),
        )
    )
    return sizes.join(eprof, "canonical_id", "left").select(
        "canonical_id",
        "n_vectors",
        F.coalesce("n_edges", F.lit(0)).alias("n_edges"),
        F.round("min_cos", 6).alias("min_cos"),
        F.round("max_cos", 6).alias("max_cos"),
    )
