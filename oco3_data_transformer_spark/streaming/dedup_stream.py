"""Streaming deduplication (§2.10 + the corpus-prep layer, online form):
exact dedup over an unbounded document stream.

Batch exact dedup (operators/dedup.py:exact_dedup) is one hash-groupBy; the
streaming form keeps per-digest state instead. Two variants, both built on
Spark's stateful dedup operators:

  - :func:`streaming_exact_dedup` — ``dropDuplicates`` on the content
    digest: state grows with the distinct-digest count and never expires.
    Correct-forever dedup; right when the digest universe is bounded or the
    job is periodically rebootstrapped from the batch store.
  - :func:`streaming_exact_dedup_within_watermark` —
    ``dropDuplicatesWithinWatermark``: duplicates are only suppressed while
    their first sighting is inside the event-time watermark, so state is
    evicted continuously. Right for the 100 TB firehose where near-in-time
    duplicates (retries, crawler refetches) dominate and historical dupes
    are handled by the periodic batch pass — the standard lambda split.

Emitted rows carry the digest so a downstream batch reconciliation can
anti-join against the store's digest set (exactly the incremental-sync
shape of operators/joins.py:sync_diff).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_digest(stream: DataFrame, text_col: str) -> DataFrame:
    """Content digest projection (md5, matching exact_dedup's batch key) —
    row-local, safe on unbounded streams."""
    return stream.withColumn("digest", F.md5(F.col(text_col)))


def streaming_exact_dedup(stream: DataFrame, text_col: str) -> DataFrame:
    """Keep the first-seen document per content digest (unbounded state)."""
    return with_digest(stream, text_col).dropDuplicates(["digest"])


def streaming_exact_dedup_within_watermark(
    stream: DataFrame, text_col: str, ts_col: str, delay: str
) -> DataFrame:
    """Keep the first-seen document per digest while inside the event-time
    watermark; per-digest state is evicted once the watermark passes it."""
    return (
        with_digest(stream, text_col)
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["digest"])
    )


def admission_sink(
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    verdict_path: str | None = None,
):
    """foreachBatch handler: ONLINE corpus admission. Each micro-batch is
    classified against the persisted corpus index with
    operators/dedup.py:incremental_dedup (exact_dup / near_dup / new);
    only 'new' documents are appended to the index, and per-document
    verdicts are optionally appended to ``verdict_path`` tagged with the
    batch id.

    Within-batch duplicates are collapsed first (keep smallest id per
    digest) so two identical documents arriving together don't both pass
    the index check. Replaying a batch is CONVERGENT for the INDEX: its
    documents are already in the index, so every one classifies exact_dup
    and the index is not modified (the at-least-once -> effectively-
    idempotent argument the granule writer makes with its manifest,
    achieved here by the admission check itself).

    ``verdict_path`` is AT-LEAST-ONCE, not idempotent: verdicts are
    written BEFORE the index is mutated, so a replay that happens after
    the index append re-records the batch's docs as exact_dup — the path
    can hold two rows per (batch_id, id) where the EARLIER-written 'new'
    row is the truth. Read it through :func:`read_verdicts`, which
    collapses duplicates with new > near_dup > exact_dup priority (a
    replay can only *demote* a verdict, never promote one, so keeping the
    most-admissive row per key reconstructs the first processing).

    Index existence is probed explicitly via the Hadoop FileSystem API —
    a transient FS/permission error on an EXISTING index raises and fails
    the batch (so the stream retries) instead of silently classifying the
    whole micro-batch as 'new' and violating the dedup invariant.

    Scale shape: the micro-batch is the delta side — small by definition —
    so every join AQE-broadcasts it; the index contributes digest and
    shingle postings only (never self-joined, never re-deduped).

    Usage::

        (stream.writeStream.foreachBatch(admission_sink("/store/corpus"))
               .option("checkpointLocation", ...).start())
    """
    from ..operators.dedup import incremental_dedup

    def handle(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        first = Window.partitionBy("digest").orderBy(id_col)
        batch = (
            with_digest(batch, text_col)
            .withColumn("__rn", F.row_number().over(first))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "digest")
        )
        # Explicit existence probe: only a genuinely-absent path means
        # "first batch"; any other read failure (permissions, corruption,
        # transient FS) propagates so the micro-batch retries.
        jpath = spark._jvm.org.apache.hadoop.fs.Path(index_path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        index = spark.read.parquet(index_path) if fs.exists(jpath) else None
        if index is None:
            verdicts = batch.select(
                F.col(id_col).alias("id"),
                F.lit("new").alias("verdict"),
                F.lit(0.0).alias("max_jacc"),
            )
        else:
            verdicts = incremental_dedup(
                batch, index, id_col, text_col, n, threshold
            )
        verdicts = verdicts.localCheckpoint()  # decide BEFORE mutating the index
        # Verdicts FIRST: a crash between the two writes then replays with
        # the index unchanged, reproducing identical verdicts (duplicate
        # rows, same content). The reverse order would let a replay record
        # contradictory exact_dup rows with no 'new' row to prefer.
        if verdict_path:
            verdicts.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(verdict_path)
        admitted = batch.join(
            verdicts.filter(F.col("verdict") == "new").select(
                F.col("id").alias(id_col)
            ),
            id_col,
            "left_semi",
        )
        admitted.write.mode("append").parquet(index_path)

    return handle


def read_verdicts(spark, verdict_path: str) -> DataFrame:
    """Collapse :func:`admission_sink`'s at-least-once verdict log to one
    row per (batch_id, id). A replay after the index append re-classifies
    the batch's docs as exact_dup, so duplicates can only DEMOTE — keeping
    the most-admissive verdict per key (new > near_dup > exact_dup, then
    highest max_jacc as the deterministic tiebreak) reconstructs the first
    processing's truth."""
    rank = (
        F.when(F.col("verdict") == "new", 0)
        .when(F.col("verdict") == "near_dup", 1)
        .otherwise(2)
    )
    w = Window.partitionBy("batch_id", "id").orderBy(
        rank.asc(), F.col("max_jacc").desc()
    )
    return (
        spark.read.parquet(verdict_path)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
