"""End-to-end training-corpus preparation plan: the pipeline a pretraining
data team runs over a raw document table, assembled from the engine's
corpus operators in the standard order —

    exact dedup  →  near-dup dedup (connected components, keep canonical)
    →  quality filter  →  deterministic split  →  sequence packing

Each stage is the shuffle-lean operator documented in its own module
(operators/dedup.py, operators/corpus.py); this plan only sequences them
and reports per-stage survivor counts. Exact-first ordering is the scale
invariant (dedup.py:22-31): byte-identical mass is collapsed by one
hash-groupBy before the shingle/LSH stages ever see it, which is what keeps
LSH bucket expansion bounded on a 100 TB corpus.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text
from ..operators import corpus as corpus_ops
from ..operators import dedup as dedup_ops


@dataclass
class CorpusPrepStats:
    n_input: int
    n_after_exact: int
    n_after_neardup: int
    n_after_quality: int
    split_counts: dict[str, int]
    n_bins: int

    def as_dict(self) -> dict:
        return {
            "n_input": self.n_input,
            "n_after_exact": self.n_after_exact,
            "n_after_neardup": self.n_after_neardup,
            "n_after_quality": self.n_after_quality,
            "split_counts": self.split_counts,
            "n_bins": self.n_bins,
        }


def corpus_prep(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    near_dup: bool = True,
    ngram_n: int = 3,
    jaccard_t: float = 0.5,
    capacity: int = 2048,
    n_shards: int = 64,
) -> tuple[DataFrame, CorpusPrepStats]:
    """Run the full preparation pipeline; returns the packed corpus
    ``(id, n_tok, split, shard, bin, fill_after)`` and per-stage counts.

    The stage counts are driver-side actions (one count per stage) — they
    are the pipeline's progress report, not part of the data path.
    """
    n_input = docs.count()

    # 1. exact dedup: canonical = min id per content digest
    canon = dedup_ops.exact_dedup(docs, id_col, text_col).select(
        F.col("canonical_id").alias(id_col)
    )
    docs1 = docs.join(canon, id_col, "left_semi")
    n_exact = docs1.count()

    # 2. near-dup components over the exact-survivors; keep min-id canonical
    if near_dup:
        pairs = dedup_ops.ngram_jaccard_pairs(docs1, id_col, text_col, ngram_n, jaccard_t)
        comp = dedup_ops.canonicalize_pairs(
            docs1.select(F.col(id_col).alias("id")), pairs.select("id_a", "id_b")
        )
        keep = comp.filter(F.col("id") == F.col("canonical_id")).select("id")
        docs2 = docs1.join(keep, docs1[id_col] == keep.id, "left_semi")
    else:
        docs2 = docs1
    n_near = docs2.count()

    # 3. quality floor: token count
    sized = docs2.select(
        F.col(id_col), text.token_count(F.col(text_col)).alias("n_tok")
    ).filter(F.col("n_tok") >= min_tokens)
    n_quality = sized.count()

    # 4. deterministic split (zero-shuffle projection)
    split_df = corpus_ops.hash_split(sized, id_col)
    split_counts = {
        r["split"]: r["n"]
        for r in split_df.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    # 5. pack each split separately (bins never span splits)
    packed = None
    for split_name in sorted(split_counts):
        part = split_df.filter(F.col("split") == split_name)
        p = corpus_ops.pack_next_fit(
            part, id_col, "n_tok", capacity=capacity, n_shards=n_shards
        ).withColumn("split", F.lit(split_name))
        packed = p if packed is None else packed.unionByName(p)
    if packed is None:  # empty corpus
        packed = split_df.withColumn("shard", F.lit(0)).withColumn(
            "bin", F.lit(0).cast("long")
        ).withColumn("fill_after", F.lit(0).cast("long"))
    n_bins = packed.select("split", "shard", "bin").distinct().count()

    return packed, CorpusPrepStats(
        n_input, n_exact, n_near, n_quality, split_counts, n_bins
    )
