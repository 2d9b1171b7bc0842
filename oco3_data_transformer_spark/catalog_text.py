"""Catalog part 2: training-data-pipeline operators over ``documents`` and
``embeddings`` — dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash),
similarity search (brute-force and IVF), and text analysis. Registered into
the same REGISTRY as the relational catalog.

Every probabilistic operator here is *fully deterministic and
oracle-checked*: MinHash uses the portable md5-prefix hash + universal-hash
family (functions/hashing.py) so even signatures and LSH buckets match the
DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register
from .functions import hashing, text, vector
from .operators import dedup as dedup_ops
from .operators import similarity as sim_ops
from .sources.registry import load

NGRAM_N = 3
JACCARD_T = 0.5
COSINE_NEARDUP_T = 0.40

_SHINGLES_SQL = f"""
    shingles AS (
        SELECT DISTINCT doc_id AS id, u.shingle
        FROM documents, unnest({text.word_ngrams_sql('text', NGRAM_N)}) u(shingle)),
    sizes AS (SELECT id, count(*) AS n_sh FROM shingles GROUP BY id)
"""


@register(
    "q30_exact_dedup",
    """
    SELECT md5(text) AS digest, min(doc_id) AS canonical_id,
           CAST(count(*) AS BIGINT) AS n_dupes
    FROM documents GROUP BY md5(text)
    """,
    doc="Exact dedup: content-digest hash-groupBy, canonical = min id.",
)
def q30(spark: SparkSession, sf: str) -> DataFrame:
    return dedup_ops.exact_dedup(load(spark, sf, "documents"), "doc_id", "text")


@register(
    "q31_ngram_jaccard_neardup",
    f"""
    WITH {_SHINGLES_SQL},
    inter AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
        FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY a.id, b.id)
    SELECT id_a, id_b,
           round(CAST(n_common AS DOUBLE) / (x.n_sh + y.n_sh - n_common), 4) AS jacc
    FROM inter JOIN sizes x ON id_a = x.id JOIN sizes y ON id_b = y.id
    WHERE CAST(n_common AS DOUBLE) / (x.n_sh + y.n_sh - n_common) >= {JACCARD_T}
    """,
    doc="N-gram Jaccard near-dup: shingle-co-occurrence join (only docs "
    "sharing a shingle ever pair).",
)
def q31(spark: SparkSession, sf: str) -> DataFrame:
    pairs = dedup_ops.ngram_jaccard_pairs(
        load(spark, sf, "documents"), "doc_id", "text", NGRAM_N, JACCARD_T
    )
    return pairs.select("id_a", "id_b", F.round("jacc", 4).alias("jacc"))


def _minhash_cands_sql() -> str:
    """WITH-clause prefix shared by the MinHash queries: shingles → seeds →
    signatures → LSH bands → distinct candidate pairs."""
    seeds_values = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(hashing.MINHASH_SEEDS)
    )
    rows_per_band = len(hashing.MINHASH_SEEDS) // 4
    return f"""
    WITH {_SHINGLES_SQL},
    seeds(i, a, b) AS (VALUES {seeds_values}),
    sigs AS (
        SELECT id, seeds.i AS seed_idx,
               min(({hashing.portable_hash28_sql('shingle')} * seeds.a + seeds.b)
                   % {hashing.MINHASH_PRIME}) AS minhash
        FROM shingles CROSS JOIN seeds GROUP BY id, seeds.i),
    banded AS (
        SELECT id, seed_idx // {rows_per_band} AS band,
               md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed_idx)) AS bucket
        FROM sigs GROUP BY id, seed_idx // {rows_per_band}),
    cands AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id)"""


def _minhash_sql() -> str:
    return f"""{_minhash_cands_sql()},
    inter AS (
        SELECT c.id_a, c.id_b, count(*) AS n_common
        FROM cands c
        JOIN shingles sa ON sa.id = c.id_a
        JOIN shingles sb ON sb.id = c.id_b AND sb.shingle = sa.shingle
        GROUP BY c.id_a, c.id_b)
    SELECT id_a, id_b,
           round(CAST(n_common AS DOUBLE) / (x.n_sh + y.n_sh - n_common), 4) AS jacc
    FROM inter JOIN sizes x ON id_a = x.id JOIN sizes y ON id_b = y.id
    WHERE CAST(n_common AS DOUBLE) / (x.n_sh + y.n_sh - n_common) >= {JACCARD_T}
    """


@register(
    "q32_minhash_lsh_neardup",
    _minhash_sql(),
    doc="MinHash-LSH near-dup: deterministic universal-hash signatures → "
    "band buckets → candidate pairs → exact Jaccard verify. Sub-quadratic "
    "at corpus scale; bit-identical to the SQL oracle.",
)
def q32(spark: SparkSession, sf: str) -> DataFrame:
    pairs = dedup_ops.minhash_dedup(
        load(spark, sf, "documents"), "doc_id", "text", NGRAM_N, bands=4, threshold=JACCARD_T
    )
    return pairs.select("id_a", "id_b", F.round("jacc", 4).alias("jacc"))


_SIMHASH_SQL = f"""
    WITH toks AS (
        SELECT doc_id AS id, t.tok
        FROM documents, unnest({text.tokens_sql('text')}) t(tok)),
    th AS (SELECT id, {hashing.portable_hash64_sql('tok')} AS h FROM toks),
    votes AS (
        SELECT id, bits.j AS bit,
               sum(2 * ((h >> bits.j) & 1) - 1) AS s
        FROM th CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS j) bits
        GROUP BY id, bits.j),
    fp AS (
        SELECT id,
               CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT)
                   AS simhash
        FROM votes GROUP BY id)
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM fp a JOIN fp b ON a.id < b.id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 1
"""


@register(
    "q33_simhash_neardup",
    _SIMHASH_SQL,
    doc="SimHash near-dup: 32-bit frequency-weighted token-vote fingerprint, "
    "pairs within Hamming radius 1 via 2-band pigeonhole (a pair within "
    "radius 1 must agree on >=1 of 2 16-bit bands).",
)
def q33(spark: SparkSession, sf: str) -> DataFrame:
    fp = dedup_ops.simhash_fingerprints(load(spark, sf, "documents"), "doc_id", "text", bits=32)
    pairs = dedup_ops.simhash_pairs(fp, max_hamming=1, bits=32)
    return pairs.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


_Q45_SQL = f"""
    WITH {_SHINGLES_SQL},
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
    SELECT canonical_id, CAST(count(*) AS BIGINT) AS group_size
    FROM cc GROUP BY canonical_id
"""


@register(
    "q45_dedup_groups",
    _Q45_SQL,
    doc="Duplicate-group canonicalization: near-dup pairs (n-gram Jaccard) "
    "-> connected components by iterative min-label propagation (Spark "
    "driver loop with convergence probe; DuckDB oracle uses a recursive "
    "CTE). canonical_id = min doc id per component.",
)
def q45(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    pairs = dedup_ops.ngram_jaccard_pairs(docs, "doc_id", "text", NGRAM_N, JACCARD_T)
    comp = dedup_ops.canonicalize_pairs(
        docs.select(F.col("doc_id").alias("id")), pairs.select("id_a", "id_b")
    )
    return comp.groupBy("canonical_id").agg(F.count(F.lit(1)).alias("group_size"))


@register(
    "q52_dedup_groups_star",
    _Q45_SQL,
    doc="Same duplicate-group result as q45 but via alternating large-star/"
    "small-star components (SoCC'14): pure groupBy+join rounds, no neighbor "
    "lists (no hub skew), O(log n) convergence vs label propagation's "
    "O(diameter) — the adversarial-graph-safe variant.",
)
def q52(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    pairs = dedup_ops.ngram_jaccard_pairs(docs, "doc_id", "text", NGRAM_N, JACCARD_T)
    comp = dedup_ops.canonicalize_pairs_star(
        docs.select(F.col("doc_id").alias("id")), pairs.select("id_a", "id_b")
    )
    return comp.groupBy("canonical_id").agg(F.count(F.lit(1)).alias("group_size"))


_Q51_SQL = f"""
    WITH {_SHINGLES_SQL},
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
    SELECT d.doc_id, d.lang, {text.token_count_sql('d.text')} AS n_words
    FROM documents d JOIN cc ON d.doc_id = cc.id
    WHERE cc.canonical_id = d.doc_id
"""


@register(
    "q51_dedup_filtered_corpus",
    _Q51_SQL,
    doc="End-to-end training-corpus dedup: near-dup pairs -> connected "
    "components -> keep ONLY each group's canonical (min-id) document — "
    "the filtered corpus a pretraining pipeline feeds downstream, with "
    "per-survivor token counts.",
)
def q51(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    pairs = dedup_ops.ngram_jaccard_pairs(docs, "doc_id", "text", NGRAM_N, JACCARD_T)
    comp = dedup_ops.canonicalize_pairs(
        docs.select(F.col("doc_id").alias("id")), pairs.select("id_a", "id_b")
    )
    keep = comp.filter(F.col("id") == F.col("canonical_id")).select("id")
    return (
        docs.join(keep, docs.doc_id == keep.id, "left_semi")
        .select("doc_id", "lang", text.token_count(F.col("text")).alias("n_words"))
    )


@register(
    "q34_knn_bruteforce",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               {vector.cosine_sql('q.q_vec', 'e.embedding')} AS cos
        FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored)
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, round(cos, 6) AS cos
    FROM ranked WHERE rank <= 5
    """,
    doc="Brute-force exact top-k cosine ANN baseline: broadcast queries, "
    "JVM-side zip_with/aggregate dot products, rank-1 window.",
)
def q34(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    out = sim_ops.brute_force_knn(emb, emb.filter(F.col("vec_id") < 10), k=5)
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"),
        F.round("cos", 6).alias("cos"),
    )


@register(
    "q35_embedding_neardup",
    f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({vector.cosine_sql('a.embedding', 'b.embedding')}, 6) AS cos
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {vector.cosine_sql('a.embedding', 'b.embedding')} >= {COSINE_NEARDUP_T}
    """,
    doc="Embedding-cosine near-dup with block key (label ≈ IVF cell) so "
    "pair work never goes quadratic over the whole corpus; each block's "
    "above-threshold pairs come from one query-chunked numpy Gram product "
    "in applyInPandas (the q120 kernel lesson — a fixed block count makes "
    "the relational pair join corpus-quadratic in fold work), zero-norm "
    "vectors dropped as undefined on both engines (try_divide / mask). "
    "kernel='sql' keeps the fold-order relational form, "
    "differential-tested.",
)
def q35(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    pairs = sim_ops.cosine_neardup_pairs(
        emb, COSINE_NEARDUP_T, block_col="label"
    )
    return pairs.select("id_a", "id_b", F.round("cos", 6).alias("cos"))


def _q46_sql() -> str:
    hp = sim_ops.srp_hyperplanes(16, 64)
    per = 16 // 4
    emb = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    bits = [
        f"CASE WHEN list_dot_product({emb}, {h!r}) >= 0 THEN '1' ELSE '0' END"
        for h in hp
    ]
    bucket = lambda b: " || ".join(bits[b * per : (b + 1) * per])  # noqa: E731
    bands_sql = " UNION ALL ".join(
        f"SELECT vec_id AS id, {b} AS band, {bucket(b)} AS bucket FROM embeddings"
        for b in range(4)
    )
    return f"""
    WITH banded AS ({bands_sql}),
    cands AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
    scored AS (
        SELECT c.id_a, c.id_b,
               {vector.cosine_sql('x.embedding', 'y.embedding')} AS cos
        FROM cands c
        JOIN embeddings x ON c.id_a = x.vec_id
        JOIN embeddings y ON c.id_b = y.vec_id)
    SELECT id_a, id_b, round(cos, 6) AS cos
    FROM scored WHERE cos >= 0.30
    """


@register(
    "q46_srp_lsh_neardup",
    _q46_sql(),
    doc="Signed-random-projection LSH near-dup over embeddings: sign-bit "
    "band buckets (fixed hyperplane bank, 16 bits / 4 bands) -> blocked "
    "candidate self-join -> exact cosine verify. The embedding-space "
    "analog of MinHash banding; deterministic, oracle-reproducible.",
)
def q46(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    pairs = sim_ops.srp_lsh_pairs(emb, threshold=0.30, n_bits=16, bands=4)
    return pairs.select("id_a", "id_b", F.round("cos", 6).alias("cos"))


def _q50_sql() -> str:
    cos_init = vector.cosine_sql("e.embedding", "c.centroid")
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
        -- a cell that empties after the Lloyd step keeps its previous
        -- centroid (mirrors kmeans_centroids' cents[nonempty]-only update)
        SELECT i.cell, coalesce(u.centroid, i.centroid) AS centroid
        FROM init i LEFT JOIN upd u ON i.cell = u.cell),
    a2 AS (
        SELECT vec_id, cell FROM (
            SELECT e.vec_id, c.cell,
                   row_number() OVER (
                       PARTITION BY e.vec_id ORDER BY {cos_init} DESC, c.cell) AS rk
            FROM embeddings e CROSS JOIN c1 c) WHERE rk = 1)
    SELECT cell, CAST(count(*) AS BIGINT) AS n_vectors FROM a2 GROUP BY cell
    """


@register(
    "q50_ivf_kmeans_build",
    _q50_sql(),
    doc="IVF k-means build path: deterministic min-id init, one Lloyd "
    "iteration (mapInPandas partial sums + driver reduce), nearest-centroid "
    "re-assignment, per-cell sizes. The DuckDB oracle replicates the "
    "iteration relationally (elementwise centroid means via "
    "generate_subscripts/unnest).",
)
def q50(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    cents = sim_ops.kmeans_centroids(emb, k=8, iters=1)
    assigned = sim_ops.ivf_assign(emb.select("vec_id", "embedding"), cents)
    return assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vectors"))


_Q57_SQL = f"""
    WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id >= 20),
    bench AS (SELECT doc_id, text FROM documents WHERE doc_id < 20),
    csh AS (
        SELECT DISTINCT doc_id AS cid, u.shingle
        FROM corpus, unnest({text.word_ngrams_sql('text', NGRAM_N)}) u(shingle)),
    bsh AS (
        SELECT DISTINCT doc_id AS bid, u.shingle
        FROM bench, unnest({text.word_ngrams_sql('text', NGRAM_N)}) u(shingle)),
    sizes AS (SELECT cid, count(*) AS n_sh FROM csh GROUP BY cid),
    hits AS (
        SELECT c.cid, b.bid, count(*) AS n_common
        FROM csh c JOIN bsh b ON c.shingle = b.shingle
        GROUP BY c.cid, b.bid),
    per_doc AS (
        SELECT h.cid, h.bid, CAST(h.n_common AS DOUBLE) / s.n_sh AS overlap, s.n_sh
        FROM hits h JOIN sizes s ON h.cid = s.cid)
    SELECT cid AS id, n_sh,
           CAST(count(*) AS BIGINT) AS n_contaminated,
           round(max(overlap), 4) AS max_overlap
    FROM per_doc WHERE overlap >= 0.2
    GROUP BY cid, n_sh
"""


@register(
    "q57_decontamination",
    _Q57_SQL,
    doc="Benchmark decontamination: corpus docs whose n-gram shingle set "
    "overlaps any eval-set doc by >= 20% are flagged (docs 0-19 act as the "
    "benchmark). Broadcast benchmark shingles + one corpus shuffle — no "
    "corpus self-join.",
)
def q57(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    out = dedup_ops.decontaminate(
        docs.filter(F.col("doc_id") >= 20),
        docs.filter(F.col("doc_id") < 20),
        "doc_id", "text", NGRAM_N, min_overlap=0.2,
    )
    return out.select(
        "id", "n_sh", "n_contaminated", F.round("max_overlap", 4).alias("max_overlap")
    )


_Q55_CONTACT = (
    "'Contact ' || c_name || ' <' || lower(replace(c_name, '#', '')) "
    "|| '@example.com> or call ' || printf('%02d-%03d-%03d-%04d', "
    "c_custkey % 100, c_custkey % 1000, (c_custkey * 7) % 1000, "
    "(c_custkey * 13) % 10000)"
)


@register(
    "q55_pii_redaction",
    f"""
    WITH base AS (SELECT c_custkey, {_Q55_CONTACT} AS contact FROM customer)
    SELECT c_custkey,
           CAST(len(regexp_extract_all(contact, '{text.EMAIL_RE}')) AS INT)
               AS n_emails,
           CAST(len(regexp_extract_all(contact, '{text.PHONE_RE}')) AS INT)
               AS n_phones,
           {text.redact_pii_sql('contact')} AS redacted
    FROM base
    """,
    doc="PII scrub for a training corpus: email/phone detection counts + "
    "global placeholder redaction; lookaround-free patterns are "
    "byte-identical between Java regex and RE2. Contact strings are "
    "synthesized deterministically from the customer dimension.",
)
def q55(spark: SparkSession, sf: str) -> DataFrame:
    cu = load(spark, sf, "customer")
    phone = F.format_string(
        "%02d-%03d-%03d-%04d",
        (F.col("c_custkey") % 100).cast("int"),
        (F.col("c_custkey") % 1000).cast("int"),
        (F.col("c_custkey") * 7 % 1000).cast("int"),
        (F.col("c_custkey") * 13 % 10000).cast("int"),
    )
    contact = F.concat(
        F.lit("Contact "), F.col("c_name"), F.lit(" <"),
        F.lower(F.regexp_replace("c_name", "#", "")), F.lit("@example.com> or call "),
        phone,
    )
    base = cu.select("c_custkey", contact.alias("contact"))
    n_emails, n_phones = text.pii_counts(F.col("contact"))
    return base.select(
        "c_custkey",
        n_emails.cast("int").alias("n_emails"),
        n_phones.cast("int").alias("n_phones"),
        text.redact_pii(F.col("contact")).alias("redacted"),
    )


@register(
    "q56_url_extraction",
    f"""
    WITH base AS (
        SELECT p_partkey,
               'see https://parts.example.com/p/' || p_partkey ||
               ' and https://' || lower(replace(p_brand, '#', '')) ||
               '.example.org/catalog' AS text
        FROM part),
    urls AS (
        SELECT p_partkey, unnest(regexp_extract_all(text, '{text.URL_RE}')) AS url
        FROM base)
    SELECT regexp_extract(url, '{text.URL_DOMAIN_RE}', 1) AS domain,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT url) AS BIGINT) AS n_distinct_urls
    FROM urls GROUP BY 1
    """,
    doc="URL extraction + per-domain rollup (crawl-corpus provenance "
    "analysis): regexp_extract_all -> explode -> domain aggregate; URLs "
    "synthesized deterministically from the part dimension.",
)
def q56(spark: SparkSession, sf: str) -> DataFrame:
    pt = load(spark, sf, "part")
    txt = F.concat(
        F.lit("see https://parts.example.com/p/"), F.col("p_partkey"),
        F.lit(" and https://"), F.lower(F.regexp_replace("p_brand", "#", "")),
        F.lit(".example.org/catalog"),
    )
    urls = pt.select(
        F.explode(text.extract_urls(txt)).alias("url")
    )
    return urls.groupBy(text.url_domain(F.col("url")).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("url").alias("n_distinct_urls"),
    )


@register(
    "q36_language_id",
    f"""
    SELECT doc_id, {text.lang_id_sql('text')} AS pred_lang
    FROM documents
    """,
    doc="Heuristic language ID: marker-word vote argmax (deterministic "
    "tie-break by language code).",
)
def q36(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    return docs.select("doc_id", text.lang_id(F.col("text")).alias("pred_lang"))


def _q37_sql() -> str:
    feats = text.quality_features_sql("text")
    return f"""
    SELECT doc_id,
           CAST({feats['n_char']} AS BIGINT) AS n_char,
           CAST({feats['n_tok']} AS BIGINT) AS n_tok,
           round({feats['mean_tok_len']}, 4) AS mean_tok_len,
           round({feats['stopword_ratio']}, 4) AS stopword_ratio,
           round({feats['punct_ratio']}, 4) AS punct_ratio
    FROM documents
    """


@register(
    "q37_quality_score",
    _q37_sql(),
    doc="Document quality features: length, token stats, stopword and "
    "punctuation ratios — all JVM-side regex/array expressions.",
)
def q37(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    # explode(array(struct)) = Generate barrier: features computed once per
    # row, field extraction cannot re-expand the expression per column
    qs = docs.select(
        "doc_id", F.explode(F.array(text.quality_struct(F.col("text")))).alias("q")
    )
    return qs.select(
        "doc_id",
        F.col("q.n_char").cast("long").alias("n_char"),
        F.col("q.n_tok").cast("long").alias("n_tok"),
        F.round("q.mean_tok_len", 4).alias("mean_tok_len"),
        F.round("q.stopword_ratio", 4).alias("stopword_ratio"),
        F.round("q.punct_ratio", 4).alias("punct_ratio"),
    )


@register(
    "q38_token_stats",
    f"""
    SELECT doc_id,
           CAST({text.token_count_sql('text')} AS BIGINT) AS n_words,
           CAST({text.bpe_ish_token_count_sql('text')} AS BIGINT) AS n_bpe_pieces
    FROM documents
    """,
    doc="Token counting: whitespace words + BPE-ish regex pieces.",
)
def q38(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    return docs.select(
        "doc_id",
        text.token_count(F.col("text")).cast("long").alias("n_words"),
        text.bpe_ish_token_count(F.col("text")).cast("long").alias("n_bpe_pieces"),
    )


@register(
    "q39_fingerprint",
    f"""
    SELECT doc_id, {text.normalized_fingerprint_sql('text')} AS fingerprint
    FROM documents
    """,
    doc="Document fingerprint: md5 of normalized text (C8/C11 analog).",
)
def q39(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    return docs.select("doc_id", text.normalized_fingerprint(F.col("text")).alias("fingerprint"))


@register(
    "q40_ivf_knn",
    f"""
    WITH cents AS (
        SELECT label AS cell, arg_min(embedding, vec_id) AS centroid
        FROM embeddings GROUP BY label),
    assigned AS (
        SELECT vec_id, embedding, cell FROM (
            SELECT e.vec_id, e.embedding, c.cell,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {vector.cosine_sql('e.embedding', 'c.centroid')} DESC, c.cell)
                       AS rk
            FROM embeddings e CROSS JOIN cents c) WHERE rk = 1),
    probes AS (
        SELECT query_id, q_vec, cell FROM (
            SELECT q.vec_id AS query_id, q.embedding AS q_vec, c.cell,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {vector.cosine_sql('q.embedding', 'c.centroid')} DESC, c.cell)
                       AS rk
            FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 10) WHERE rk <= 2),
    scored AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               {vector.cosine_sql('p.q_vec', 'a.embedding')} AS cos
        FROM probes p JOIN assigned a ON p.cell = a.cell
        WHERE a.vec_id <> p.query_id)
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, round(cos, 6) AS cos
    FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored)
    WHERE rank <= 3
    """,
    doc="IVF-bucketed ANN: nearest-centroid cell assignment (build), "
    "nprobe=2 probing (search) — the 100 TB path touching nprobe/nlist of "
    "the corpus via a partitioned equi-join on cell.",
)
def q40(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    cents = emb.groupBy(F.col("label").alias("cell")).agg(
        F.min_by("embedding", "vec_id").alias("centroid")
    )
    assigned = sim_ops.ivf_assign(emb.select("vec_id", "embedding"), cents)
    out = sim_ops.ivf_knn(assigned, cents, emb.filter(F.col("vec_id") < 10), k=3, nprobe=2)
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"),
        F.round("cos", 6).alias("cos"),
    )


@register(
    "q61_repetition_profile",
    f"""
    WITH toks AS (
        SELECT doc_id AS id, u.tok
        FROM documents, unnest({text.tokens_sql('text')}) u(tok)),
    tokc AS (SELECT id, tok, count(*) AS c FROM toks GROUP BY id, tok),
    tprof AS (
        SELECT id, CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(count(*) AS DOUBLE) / sum(c) AS uniq_token_frac
        FROM tokc GROUP BY id),
    bg AS (
        SELECT doc_id AS id, u.g
        FROM documents, unnest({text.word_ngrams_sql('text', 2)}) u(g)),
    bgc AS (SELECT id, g, count(*) AS c FROM bg GROUP BY id, g),
    bprof AS (
        SELECT id, CAST(max(c) AS DOUBLE) / sum(c) AS top_bigram_frac,
               CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / sum(c)
                   AS rep_bigram_frac
        FROM bgc GROUP BY id)
    SELECT t.id AS doc_id, n_tokens, uniq_token_frac,
           coalesce(top_bigram_frac, 0.0) AS top_bigram_frac,
           coalesce(rep_bigram_frac, 0.0) AS rep_bigram_frac
    FROM tprof t LEFT JOIN bprof b ON t.id = b.id
    """,
    doc="Gopher-style repetition/quality profile per document: distinct-"
    "token ratio, most-frequent-bigram mass, and duplicated-bigram mass — "
    "the standard corpus-filtering signals for boilerplate and degenerate "
    "repetition (Rae et al. 2021, table A1). All fractions are exact "
    "integer-ratio doubles (no rounding needed for oracle equality). "
    "Same scale shape as the shingle pipelines: the doc table is "
    "pre-exchanged on id once, every groupBy and the final profile join "
    "then run exchange-free on doc-count rows.",
)
def q61(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    toks = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(text.tokens(F.col("text"))).alias("tok"),
    )
    tokc = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("c"))
    tprof = tokc.groupBy("id").agg(
        F.sum("c").alias("n_tokens"),
        (F.count(F.lit(1)).cast("double") / F.sum("c")).alias("uniq_token_frac"),
    )
    bg = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(text.word_ngrams(F.col("text"), 2)).alias("g"),
    )
    bgc = bg.groupBy("id", "g").agg(F.count(F.lit(1)).alias("c"))
    bprof = bgc.groupBy("id").agg(
        (F.max("c").cast("double") / F.sum("c")).alias("top_bigram_frac"),
        (
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).cast("double")
            / F.sum("c")
        ).alias("rep_bigram_frac"),
    )
    return (
        tprof.join(bprof, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            "n_tokens",
            "uniq_token_frac",
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
            F.coalesce("rep_bigram_frac", F.lit(0.0)).alias("rep_bigram_frac"),
        )
    )


@register(
    "q62_minhash_estimate",
    f"""{_minhash_cands_sql()},
    est AS (
        SELECT c.id_a, c.id_b,
               CAST(sum(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END)
                    AS DOUBLE) / {len(hashing.MINHASH_SEEDS)} AS jacc_est
        FROM cands c
        JOIN sigs sa ON sa.id = c.id_a
        JOIN sigs sb ON sb.id = c.id_b AND sb.seed_idx = sa.seed_idx
        GROUP BY c.id_a, c.id_b)
    SELECT id_a, id_b, jacc_est FROM est WHERE jacc_est >= {JACCARD_T}
    """,
    doc="MinHash ESTIMATE near-dup: LSH candidates scored by signature "
    "agreement alone (unbiased Jaccard estimator) — the screening pass "
    "whose candidate join ships k*8 bytes per doc regardless of document "
    "length. q32 is the verified variant.",
)
def q62(spark: SparkSession, sf: str) -> DataFrame:
    pairs = dedup_ops.minhash_estimate_pairs(
        load(spark, sf, "documents"), "doc_id", "text", NGRAM_N,
        bands=4, threshold=JACCARD_T,
    )
    return pairs.select("id_a", "id_b", "jacc_est")


SEG_LEN = 8
SEG_MIN_DOCS = 3
EDIT_MAX_REL = 0.2


@register(
    "q76_segment_dedup",
    f"""
    WITH toked AS (SELECT doc_id, {text.tokens_sql('text')} AS t FROM documents),
    segs AS (
        SELECT doc_id, CAST((u.s - 1) // {SEG_LEN} AS BIGINT) AS seg_idx,
               array_to_string(t[u.s : u.s + {SEG_LEN} - 1], ' ') AS seg_text
        FROM toked, unnest(generate_series(1, len(t), {SEG_LEN})) u(s)),
    cnts AS (
        SELECT seg_text, count(DISTINCT doc_id) AS n_docs_seg
        FROM segs GROUP BY seg_text)
    SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_seg,
           CAST(count(*) FILTER (WHERE c.n_docs_seg >= {SEG_MIN_DOCS}) AS BIGINT)
               AS n_seg_dropped,
           md5(coalesce(string_agg(g.seg_text, ' ' ORDER BY g.seg_idx)
                        FILTER (WHERE c.n_docs_seg < {SEG_MIN_DOCS}), ''))
               AS clean_md5
    FROM segs g JOIN cnts c USING (seg_text)
    GROUP BY g.doc_id
    """,
    doc=f"Cross-document segment dedup (C4-style line dedup over "
    f"{SEG_LEN}-token segments): segments occurring in >= {SEG_MIN_DOCS} "
    "distinct documents are boilerplate, removed from every document; "
    "surviving segments reassemble in order (md5-fingerprinted). Segment "
    "text never crosses a shuffle: the doc-count aggregate ships (8-byte "
    "hash, id) pairs, only the small hot set joins back (AQE-broadcast), "
    "and the reassembly groupBy rides the id pre-exchange (plan-asserted).",
)
def q76(spark: SparkSession, sf: str) -> DataFrame:
    out = dedup_ops.segment_dedup(
        load(spark, sf, "documents"), "doc_id", "text",
        seg_len=SEG_LEN, min_docs=SEG_MIN_DOCS,
    )
    return out.select(
        F.col("id").alias("doc_id"), "n_seg", "n_seg_dropped", "clean_md5"
    )


@register(
    "q77_edit_distance_neardup",
    f"""
    WITH {_SHINGLES_SQL},
    inter AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
        FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY a.id, b.id),
    cand AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes x ON id_a = x.id JOIN sizes y ON id_b = y.id
        WHERE CAST(n_common AS DOUBLE) / (x.n_sh + y.n_sh - n_common)
              >= {JACCARD_T}),
    scored AS (
        SELECT c.id_a, c.id_b,
               CAST(levenshtein(da.text, db.text) AS BIGINT) AS dist,
               round(CAST(levenshtein(da.text, db.text) AS DOUBLE)
                     / greatest(length(da.text), length(db.text)), 4) AS rel_dist
        FROM cand c
        JOIN documents da ON da.doc_id = c.id_a
        JOIN documents db ON db.doc_id = c.id_b)
    SELECT id_a, id_b, dist, rel_dist
    FROM scored WHERE rel_dist <= {EDIT_MAX_REL}
    """,
    doc="Blocked edit-distance near-dup: shingle-co-occurrence Jaccard "
    "prefilter (sound for the near-dup regime — d edits destroy at most "
    "d*n shingles), then exact character Levenshtein on surviving pairs "
    "only, relative-distance thresholded. Levenshtein is a built-in JVM "
    "expression on both engines; it never runs all-pairs.",
)
def q77(spark: SparkSession, sf: str) -> DataFrame:
    return dedup_ops.edit_distance_pairs(
        load(spark, sf, "documents"), "doc_id", "text", NGRAM_N,
        prefilter_jaccard=JACCARD_T, max_rel=EDIT_MAX_REL,
    )


@register(
    "q80_shingle_novelty",
    f"""
    WITH {_SHINGLES_SQL},
    first AS (SELECT shingle, min(id) AS first_id FROM shingles GROUP BY shingle)
    SELECT s.id AS doc_id, CAST(count(*) AS BIGINT) AS n_sh,
           CAST(sum(CASE WHEN s.id = f.first_id THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel,
           CAST(sum(CASE WHEN s.id = f.first_id THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*) AS novelty
    FROM shingles s JOIN first f USING (shingle)
    GROUP BY s.id
    """,
    doc="Per-document novelty: fraction of the doc's distinct shingles "
    "first seen (min doc id = arrival order) in this doc — the cheap "
    "content-growth curation signal before pairwise dedup. Near-dups of "
    "earlier material score ~0. Reuses the id-partitioned shingle "
    "exchange; first-owner is one min-aggregate per 8-byte shingle hash.",
)
def q80(spark: SparkSession, sf: str) -> DataFrame:
    out = dedup_ops.shingle_novelty(load(spark, sf, "documents"), "doc_id", "text", NGRAM_N)
    return out.select(F.col("id").alias("doc_id"), "n_sh", "n_novel", "novelty")


PREFIX_JACC_T = 0.7


@register(
    "q122_prefix_filter_simjoin",
    f"""
    WITH {_SHINGLES_SQL},
    inter AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
        FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY a.id, b.id)
    SELECT id_a, id_b,
           round(CAST(n_common AS DOUBLE) / (x.n_sh + y.n_sh - n_common), 4) AS jacc
    FROM inter JOIN sizes x ON id_a = x.id JOIN sizes y ON id_b = y.id
    WHERE CAST(n_common AS DOUBLE) / (x.n_sh + y.n_sh - n_common)
          >= {PREFIX_JACC_T}
    """,
    doc="EXACT Jaccard similarity self-join via prefix filtering (AllPairs, "
    "Bayardo 2007): documents ordered by one global shingle order "
    "(rarest-first), only the first |x|-ceil(t|x|)+1 shingles of each doc "
    "enter the candidate join (plus the t·max<=min length filter), then "
    "candidates are verified with an exact intersection count. The oracle "
    "is deliberately NOT the same algorithm — it is the brute-force "
    "all-pairs join — so the hash-match PROVES the prefix bound loses no "
    "pair. 100 TB shape: the pair join indexes ~(1-t) of each doc and by "
    "construction its RAREST shingles; the hot stop-shingles that make "
    "full co-occurrence quadratic never enter the index.",
)
def q122(spark: SparkSession, sf: str) -> DataFrame:
    pairs = dedup_ops.prefix_filter_jaccard_pairs(
        load(spark, sf, "documents"), "doc_id", "text", NGRAM_N, PREFIX_JACC_T
    )
    return pairs.select("id_a", "id_b", F.round("jacc", 4).alias("jacc"))


# ---------------------------------------------------------------------------
# q129 — exact repeated-substring span profile (sliding-window dedup,
# Lee et al. 2021 style; operators/dedup.repeated_window_spans)
# ---------------------------------------------------------------------------

RWS_W = 8
RWS_MIN = 2


@register(
    "q129_repeated_window_spans",
    f"""
    WITH toked AS (SELECT doc_id, {text.tokens_sql('text')} AS t FROM documents),
    wins AS (
        SELECT doc_id, u.s - 1 AS pos,
               array_to_string(t[u.s : u.s + {RWS_W} - 1], ' ') AS w
        FROM toked, unnest(generate_series(1, len(t) - {RWS_W} + 1)) u(s)
        WHERE len(t) >= {RWS_W}),
    cnts AS (SELECT w, count(*) AS c FROM wins GROUP BY w),
    hits AS (SELECT doc_id, pos FROM wins JOIN cnts USING (w)
             WHERE c >= {RWS_MIN}),
    brks AS (
        SELECT doc_id, pos,
               CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                         <= {RWS_W} THEN 0 ELSE 1 END AS brk
        FROM hits),
    sp AS (
        SELECT doc_id, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
        FROM brks),
    spl AS (
        SELECT doc_id, span_id, min(pos) AS p0, max(pos) AS p1,
               count(*) AS nw
        FROM sp GROUP BY 1, 2),
    per_doc AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(p1 - p0 + {RWS_W}) AS BIGINT) AS covered_tokens,
               CAST(sum(nw) AS BIGINT) AS n_dup_windows
        FROM spl GROUP BY 1),
    tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows
            FROM wins GROUP BY 1)
    SELECT d.doc_id,
           coalesce(t.n_windows, 0) AS n_windows,
           coalesce(p.n_dup_windows, 0) AS n_dup_windows,
           coalesce(p.n_spans, 0) AS n_spans,
           coalesce(p.covered_tokens, 0) AS covered_tokens
    FROM documents d
    LEFT JOIN tot t USING (doc_id)
    LEFT JOIN per_doc p USING (doc_id)
    """,
    doc=f"Exact repeated-substring span profile (Lee et al. 2021 sliding-"
    f"window form): every {RWS_W}-token window occurring >= {RWS_MIN} times "
    "anywhere in the corpus is marked, overlapping/adjacent marks merge "
    "into maximal duplicated spans per document (the islands pattern over "
    "hit positions), and the per-doc output counts windows/spans/covered "
    "tokens — the mass a span-excision pass would remove. Unlike q76's "
    "non-overlapping C4 segments, windows slide by 1 token, catching "
    "duplicates at ANY alignment (the suffix-array use case). Window "
    "table is linear in corpus tokens, keyed by xxhash64 over the "
    "window's slice of per-token xxhash64 values (the oracle groups the "
    "window strings — identical aggregates absent 64-bit collisions, the "
    "same exactness class as the previous string keying); only repeated "
    "hashes join back; zero Python UDFs.",
)
def q129(spark: SparkSession, sf: str) -> DataFrame:
    out = dedup_ops.repeated_window_spans(
        load(spark, sf, "documents"), "doc_id", "text",
        window=RWS_W, min_count=RWS_MIN,
    )
    return out.select(
        F.col("id").alias("doc_id"), "n_windows", "n_dup_windows",
        "n_spans", "covered_tokens",
    )
