"""Deduplication operators for training-data pipelines.

Exact, n-gram-Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup —
each designed shuffle-lean for 100 TB corpora:

  - exact: hash-groupBy on a content digest — one shuffle on a 128-bit key,
    no text comparison.
  - n-gram Jaccard: shingle-explode → pair-join on shingle → count — the
    join key is the shingle so identical shingles co-locate; candidate pairs
    never materialize beyond co-occurring docs.
  - MinHash LSH: signatures via deterministic universal hashing (portable,
    oracle-checkable, see functions/hashing.py) → band buckets → pair join on
    (band, bucket-hash) — the classic sub-quadratic path; the final Jaccard
    verify runs only on candidates.
  - SimHash: weighted bit-vote fingerprint; pairs within Hamming radius via
    band partitioning of the fingerprint.

All stages are built-in expressions (explode/groupBy/join) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing, text


def exact_dedup(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Exact duplicate groups by md5(text); canonical doc = min id.
    Returns (digest, canonical_id, n_dupes)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col).alias("id"))
        .groupBy("digest")
        .agg(F.min("id").alias("canonical_id"), F.count(F.lit(1)).alias("n_dupes"))
    )


def shingle_table(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) pairs — distinct word n-grams per document."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(text.word_ngrams(F.col(text_col), n)).alias("shingle"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Near-duplicate pairs with word-n-gram Jaccard >= threshold.

    Pair generation joins on the shingle itself (co-occurrence), so only
    documents sharing at least one shingle ever pair up; Jaccard =
    |∩| / (|A| + |B| − |∩|) from per-doc distinct-shingle counts.
    Returns (id_a, id_b, jacc) with id_a < id_b.
    """
    sh = shingle_table(df, id_col, text_col, n)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jacc",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jacc") >= threshold)
    )
    return out.select("id_a", "id_b", "jacc")


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, k: int | None = None
) -> DataFrame:
    """MinHash signature rows (id, seed_idx, minhash) — k universal-hash
    permutations over the 28-bit shingle hash. Fully deterministic and
    reproducible in ANSI SQL (functions/hashing.py)."""
    k = k or len(hashing.MINHASH_SEEDS)
    sh = shingle_table(df, id_col, text_col, n).withColumn(
        "h", hashing.portable_hash28(F.col("shingle"))
    )
    per_seed = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("seed_idx"),
                    hashing.minhash_value(F.col("h"), i).alias("hv"),
                )
                for i in range(k)
            ]
        )
    ).alias("s")
    return (
        sh.select("id", per_seed)
        .select("id", F.col("s.seed_idx").alias("seed_idx"), F.col("s.hv").alias("hv"))
        .groupBy("id", "seed_idx")
        .agg(F.min("hv").alias("minhash"))
    )


def minhash_lsh_candidates(
    signatures: DataFrame, bands: int = 4
) -> DataFrame:
    """LSH banding: rows agree on a band iff all rows/band minhashes match.
    Band key = md5 of the joined minhash values; candidates = distinct id
    pairs sharing any (band, key) bucket."""
    k = len(hashing.MINHASH_SEEDS)
    rows_per_band = k // bands
    banded = (
        signatures.withColumn("band", (F.col("seed_idx") / rows_per_band).cast("int"))
        .groupBy("id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("seed_idx", "minhash"))
                        ),
                        lambda s: s["minhash"].cast("string"),
                    ),
                    ",",
                )
            ).alias("bucket")
        )
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash-LSH near-dup: LSH candidates verified with exact
    n-gram Jaccard. Returns (id_a, id_b, jacc)."""
    cands = minhash_lsh_candidates(minhash_signatures(df, id_col, text_col, n), bands)
    sh = shingle_table(df, id_col, text_col, n)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    sh_a = sh.select(F.col("id").alias("id_a"), "shingle")
    sh_b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        cands.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    out = (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b")), "id_b")
        .withColumn(
            "jacc",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jacc") >= threshold)
    )
    return out.select("id_a", "id_b", "jacc")


def simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32
) -> DataFrame:
    """SimHash: per-document ``bits``-wide fingerprint from token-hash bit
    votes weighted by occurrence count (non-distinct tokens — frequency
    weighting discriminates far better than set membership on small shared
    vocabularies). Pure bit arithmetic on the portable hash → reproducible
    in SQL. Returns (id, simhash)."""
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(text.tokens(F.col(text_col))).alias("tok")
    ).withColumn("h", hashing.portable_hash64(F.col("tok")))
    votes = toks.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("bit"),
                        (F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1).alias(
                            "vote"
                        ),
                    )
                    for j in range(bits)
                ]
            )
        ).alias("v"),
    ).select("id", F.col("v.bit").alias("bit"), F.col("v.vote").alias("vote"))
    bitvals = (
        votes.groupBy("id", "bit")
        .agg(F.sum("vote").alias("s"))
        .withColumn(
            "bitval",
            # SQL shiftleft accepts a column shift amount (the Python API
            # wrapper only takes an int)
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(
                F.lit(0).cast("long")
            ),
        )
    )
    return bitvals.groupBy("id").agg(F.sum("bitval").alias("simhash"))


def simhash_pairs(
    fingerprints: DataFrame, max_hamming: int = 1, bits: int = 32
) -> DataFrame:
    """Pairs of ids whose simhash Hamming distance <= max_hamming.
    The pair join is banded (pigeonhole: distance <= h ⇒ at least one of
    h+1 bands equal), so candidates come from per-band equi-joins — the
    sub-quadratic scale path — and only candidates get the exact verify."""
    n_bands = max_hamming + 1
    width = bits // n_bands
    mask = (1 << width) - 1
    fp = fingerprints.select(F.col("id"), F.col("simhash"))
    band_exprs = [
        F.shiftright(F.col("simhash"), width * i).bitwiseAND(F.lit(mask)).alias(f"b{i}")
        for i in range(n_bands)
    ]
    banded = fp.select("id", "simhash", *band_exprs)
    pairs = None
    for i in range(n_bands):
        a = banded.alias("a")
        b = banded.alias("b")
        p = a.join(
            b,
            (F.col(f"a.b{i}") == F.col(f"b.b{i}")) & (F.col("a.id") < F.col("b.id")),
        ).select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    pairs = pairs.distinct()
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.withColumn("hamming", ham).filter(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )
