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

from pyspark.sql import DataFrame
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
