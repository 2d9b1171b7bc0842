"""Streaming sketch maintenance (§2.10 + operators/sketch.py, online form):
a per-group k-mins cardinality sketch kept current over an unbounded stream.

This is the payoff of the sketch's merge contract: the persisted state is
the k-vector of mins per group (a few hundred bytes), each micro-batch
reduces to its own k-vector, and the merge is an elementwise min — so the
maintained sketch is EXACTLY the sketch a batch pass over the union of all
batches would build (bit-identical, tested), and replays are absorbed for
free (min is idempotent). Contrast exact streaming count(distinct), whose
state grows with the key universe (the dropDuplicates path in
dedup_stream.py) — at firehose scale the sketch is the only bounded-state
option for per-group cardinality dashboards.

Crash contract, same staged shape as the store sinks: the sketch table is
rewritten via a staging directory + atomic rename per batch, and because
merge is idempotent, an at-least-once replay of the last micro-batch
converges to the same table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketch import KMINS_K, _P, kmins_estimate_col, kmins_sketch


def _merge(state: DataFrame, part: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Elementwise min-merge of two sketch tables (full outer on the group)."""
    merged = state.alias("a").join(
        part.alias("b"), on=group_cols, how="full_outer"
    )
    cols = [F.col(c) for c in group_cols] + [
        F.least(
            F.coalesce(F.col(f"a.__m{i}"), F.lit(_P)),
            F.coalesce(F.col(f"b.__m{i}"), F.lit(_P)),
        ).alias(f"__m{i}")
        for i in range(k)
    ]
    return merged.select(*cols)


def estimate(sketch: DataFrame, group_cols: list[str], k: int = KMINS_K) -> DataFrame:
    """Read a maintained sketch table into per-group distinct estimates
    (the same single-division estimator as the batch operator)."""
    return sketch.select(*group_cols, kmins_estimate_col(k))


def kmins_sink(
    sketch_path: str,
    group_cols: list[str],
    value_col: str,
    k: int = KMINS_K,
):
    """``foreachBatch`` handler maintaining a k-mins sketch table at
    ``sketch_path``.

    Each batch: reduce the batch to its per-group k-vector, min-merge with
    the stored table, stage-write, atomic-rename into place. Idempotent
    under at-least-once replay (re-merging a batch is a no-op), the same
    convergence argument as dedup_stream.admission_sink — but here it needs
    no existence-probe subtlety because merge-with-empty is the identity.
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark: SparkSession = batch_df.sparkSession
        part = kmins_sketch(batch_df, group_cols, F.col(value_col), k)
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(sketch_path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(jpath):
            state = spark.read.parquet(sketch_path)
            merged = _merge(state, part, group_cols, k)
        else:
            merged = part
        staging = sketch_path.rstrip("/") + f".staging-{batch_id}"
        # sketch tables are group-cardinality-sized; one file keeps the
        # rename atomic and the read cheap
        merged.coalesce(1).write.mode("overwrite").parquet(staging)
        tmp_old = sketch_path.rstrip("/") + f".old-{batch_id}"
        if fs.exists(jpath):
            fs.rename(jpath, jvm.org.apache.hadoop.fs.Path(tmp_old))
        fs.rename(jvm.org.apache.hadoop.fs.Path(staging), jpath)
        fs.delete(jvm.org.apache.hadoop.fs.Path(tmp_old), True)

    return handle


def read_estimates(
    spark: SparkSession, sketch_path: str, group_cols: list[str], k: int = KMINS_K
) -> DataFrame:
    """Current per-group distinct estimates from a maintained sketch table."""
    return estimate(spark.read.parquet(sketch_path), group_cols, k)


# ---------------------------------------------------------------------------
# Streaming count-min: per-key frequency maintenance in d*w bounded state.
# Unlike the k-mins sink, the merge here is cell-wise ADDITION — which is
# NOT idempotent — so at-least-once replay must be fenced explicitly: the
# sketch table carries the last applied batch_id and the handler skips any
# batch it has already absorbed (the standard foreachBatch transactional
# guard; Spark replays whole batches with stable ids, never partial ones).
# ---------------------------------------------------------------------------

def _fenced_additive_sink(sketch_path: str, build, cell_cols: list[str]):
    """Shared handler core for ADDITIVE sketches (count-min grid, fixed-bin
    histogram): per-batch partial via ``build(batch_df)`` -> fence on
    ``max(last_batch)`` (addition is not idempotent, so a replayed batch
    must be skipped — the standard foreachBatch transactional guard; Spark
    replays whole batches with stable ids, never partial ones) -> cell-wise
    ADD on ``cell_cols`` -> stage-write + atomic rename."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark: SparkSession = batch_df.sparkSession
        part = build(batch_df)
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(sketch_path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(jpath):
            state = spark.read.parquet(sketch_path)
            applied = state.agg(F.max("last_batch")).collect()[0][0]
            if applied is not None and applied >= batch_id:
                return  # replayed batch: addition would double-count
            merged = (
                state.select(*cell_cols, F.col("cnt").alias("a"))
                .join(
                    part.select(*cell_cols, F.col("cnt").alias("b")),
                    cell_cols,
                    "full_outer",
                )
                .select(
                    *cell_cols,
                    (F.coalesce("a", F.lit(0)) + F.coalesce("b", F.lit(0))).alias(
                        "cnt"
                    ),
                )
            )
        else:
            merged = part
        merged = merged.withColumn("last_batch", F.lit(batch_id))
        staging = sketch_path.rstrip("/") + f".staging-{batch_id}"
        merged.coalesce(1).write.mode("overwrite").parquet(staging)
        tmp_old = sketch_path.rstrip("/") + f".old-{batch_id}"
        if fs.exists(jpath):
            fs.rename(jpath, jvm.org.apache.hadoop.fs.Path(tmp_old))
        fs.rename(jvm.org.apache.hadoop.fs.Path(staging), jpath)
        fs.delete(jvm.org.apache.hadoop.fs.Path(tmp_old), True)

    return handle


def countmin_sink(
    sketch_path: str,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
):
    """``foreachBatch`` handler maintaining a count-min grid at
    ``sketch_path`` (columns ``d, bucket, cnt, last_batch``). State never
    exceeds d*w rows regardless of stream volume or key cardinality."""
    from ..operators.sketch import countmin_build

    return _fenced_additive_sink(
        sketch_path,
        lambda df: countmin_build(df, F.col(key_col), depth=depth, width=width),
        ["d", "bucket"],
    )


def histogram_sink(
    sketch_path: str,
    group_cols: list[str],
    value_col: str,
    bin_width: int,
    n_bins: int,
):
    """``foreachBatch`` handler maintaining a fixed-bin histogram sketch
    (columns ``group..., bin, cnt, last_batch``) — streaming quantile
    state: ``operators.sketch.histogram_quantile`` reads estimates off the
    maintained table at any moment without touching the stream's history."""
    from ..operators.sketch import histogram_sketch

    return _fenced_additive_sink(
        sketch_path,
        lambda df: histogram_sketch(
            df, group_cols, F.col(value_col), bin_width, n_bins
        ),
        [*group_cols, "bin"],
    )


def read_frequencies(
    spark: SparkSession,
    sketch_path: str,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Point-estimate frequencies for ``keys`` from a maintained grid."""
    from ..operators.sketch import countmin_estimate

    grid = spark.read.parquet(sketch_path).select("d", "bucket", "cnt")
    return countmin_estimate(grid, keys, key_col, depth=depth, width=width)
