"""Sessionization / island detection — the reference's signature operator.

The reference scans the sounding sequence with a Python loop, splitting it
into contiguous *regions* (runs) of constant target id within a mode pass
(ref processors/OCO3SamProcessor.py:356-432; global variant
processors/OCO3SamGlobalProcessor.py:460-502; OCO-2 target-only
processors/OCO2Processor.py:353-370; SIF with 'none'-id tolerance
processors/OCO3SifProcessor.py:368-477). Adjacent runs of the same target
separated by a short interruption are merged — CO2 strict
``|last.stop - item.start| < margin`` (ref processors/OCO3SamProcessor.py:365-375),
SIF inclusive ``<= margin`` with 'none' adoption
(ref processors/OCO3SifProcessor.py:377-405) — and the merged slice *spans*
the interrupting rows (``slice(last.start, item.stop)``), so swallowed
off-mode soundings become region members.

Spark-first formulation (no loops, no collect):
  1. filter to the mode pass; a *span* breaks where the dense sounding index
     jumps (an off-mode interruption);
  2. (SIF) resolve 'none' ids inside a span by forward- then backward-fill;
  3. runs = islands of constant effective id within a span
     (``lag`` + running ``sum`` over ``Window.partitionBy(granule)``);
  4. merge pass = second island detection over the *run table* with the
     gap predicate (runs per granule-day are few, so this window is tiny);
  5. membership = index-range join back to all rows (swallowed rows incl.).

Semantics notes, verified against the reference loop:
  - run ``stop_excl`` is always ``max(member idx) + 1`` — for target-change
    boundaries (``slice(start, i)``), interruption flushes, and the
    end-of-file flush (``slice(start, i + 1)``,
    ref processors/OCO3SamProcessor.py:397-399) alike.
  - merges only ever chain through the immediately-previous kept slice, so
    A,B,A never merges; same-id chains A,A,A collapse transitively — both
    reproduced by the cumulative-sum grouping.
  - SIF 'none' runs attach to the previous run when the gap qualifies, else
    to the following run (the reference's left-fold replace-id behavior).

Scale: one shuffle by (granule) for the row window, one tiny shuffle for the
run table, one broadcast-range join back. Granule-days are bounded (~1e5
rows) so per-key ordering stays in-task; granules themselves distribute.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def assign_dense_index(
    df: DataFrame, partition_cols: list[str], order_cols: list[str], idx_col: str = "idx"
) -> DataFrame:
    """Dense 0-based position per partition (the 'sounding index' when the
    source does not carry one)."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.withColumn(idx_col, F.row_number().over(w) - 1)


def detect_regions(
    df: DataFrame,
    partition_cols: list[str],
    idx_col: str,
    mode_col: str,
    mode_value,
    target_col: str,
    margin: int = 2,
    merge_inclusive: bool = False,
    none_id: str | None = None,
    region_col: str = "region_id",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """One mode pass of the reference's segmentation. Returns the region
    table: ``partition_cols + [region_col, target_col, start_idx,
    stop_excl, n_runs, n_mode_rows]`` with ``region_col`` dense from 1 per
    partition.

    ``idx_col`` must be the dense per-partition sounding position.
    CO2: ``margin=2, merge_inclusive=False`` (gap of 0-1 rows merges).
    SIF: ``merge_inclusive=True, none_id='none'``.

    ``order_cols``: columns whose sort order EQUALS the idx order (e.g. the
    keys ``assign_dense_index`` ranked by). When the index was just computed
    by a window over those keys, ordering this pass's windows by them lets
    Spark reuse the existing partitioning+sort instead of re-sorting on the
    derived index column (one Sort node saved on the fact table).
    """
    order_cols = order_cols or [idx_col]
    rows = df.filter(F.col(mode_col) == mode_value).select(
        *partition_cols,
        F.col(idx_col).alias("__idx"),
        F.col(target_col).alias("__tid"),
        *[c for c in order_cols if c != idx_col],
    )

    w = Window.partitionBy(*partition_cols).orderBy(
        *[c if c != idx_col else "__idx" for c in order_cols]
    )
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_idx = F.lag("__idx").over(w)

    if none_id is not None:
        # SIF path: spans are needed for 'none' resolution, and the merge
        # is a LEFT FOLD over the run table (a merged run's possibly
        # upgraded id participates in the next comparison, and 'none'
        # matches either side — ref processors/OCO3SifProcessor.py:377-405
        # — e.g. runs a, none, none chain-merge into one 'a' region, which
        # no fixed-width window can express). Runs per granule are orders
        # of magnitude fewer than soundings, so the fold is an exact
        # grouped-map over the tiny run table (the fact table never
        # touches that pass).
        new_span = (prev_idx.isNull() | (F.col("__idx") - prev_idx > 1)).cast("int")
        rows = rows.withColumn("__span", F.sum(new_span).over(cum))
        ws = Window.partitionBy(*partition_cols, "__span").orderBy("__idx")
        non_none = F.when(F.col("__tid") != none_id, F.col("__tid"))
        ffill = F.last(non_none, ignorenulls=True).over(
            ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        bfill = F.first(non_none, ignorenulls=True).over(
            ws.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        rows = rows.withColumn("__eff", F.coalesce(ffill, bfill, F.lit(none_id)))

        prev_span = F.lag("__span").over(w)
        prev_eff = F.lag("__eff").over(w)
        new_run = (
            prev_span.isNull()
            | (F.col("__span") != prev_span)
            | ~F.col("__eff").eqNullSafe(prev_eff)
        ).cast("int")
        rows = rows.withColumn("__run", F.sum(new_run).over(cum))

        runs = rows.groupBy(*partition_cols, "__run").agg(
            F.first("__eff").alias("__tid"),
            F.min("__idx").alias("__start"),
            (F.max("__idx") + 1).alias("__stop"),
            F.count(F.lit(1)).alias("__n"),
        )
        return _merge_runs_fold(
            runs, partition_cols, target_col, region_col, margin,
            merge_inclusive, none_id,
        )

    # CO2 path: run detection AND gap-merge in the SAME window pass — no
    # intermediate run table. At the first row of a run, the previous row
    # in this ordered window IS the last row of the previous run, so the
    # run-table merge predicate  start − lag(stop)  is exactly
    # idx − prev_idx − 1 here, and the previous run's id is prev __eff
    # (constant within a run). Regions then aggregate straight off the row
    # table; its grouping keys are a superset of the window's partitioning,
    # so no second exchange is needed (q17/q18: ONE shuffle end-to-end,
    # plan-asserted in tests/test_plan_quality.py).
    prev_eff = F.lag("__tid").over(w)
    same_id = F.col("__tid").eqNullSafe(prev_eff)
    new_run = prev_idx.isNull() | (F.col("__idx") - prev_idx > 1) | ~same_id
    gap_prev = F.col("__idx") - prev_idx - 1
    gap_ok = (gap_prev <= margin) if merge_inclusive else (gap_prev < margin)
    merge_prev = F.coalesce(gap_ok & same_id, F.lit(False))
    rows = (
        rows.withColumn("__new_run", new_run.cast("int"))
        .withColumn("__new_region", (new_run & ~merge_prev).cast("int"))
        .withColumn(region_col, F.sum("__new_region").over(cum))
    )
    return rows.groupBy(*partition_cols, region_col).agg(
        F.first("__tid").alias(target_col),
        F.min("__idx").alias("start_idx"),
        (F.max("__idx") + 1).alias("stop_excl"),
        F.sum("__new_run").alias("n_runs"),
        F.count(F.lit(1)).alias("n_mode_rows"),
    )


def _merge_runs_fold(
    runs: DataFrame,
    partition_cols: list[str],
    target_col: str,
    region_col: str,
    margin: int,
    merge_inclusive: bool,
    none_id: str,
) -> DataFrame:
    """Exact port of the reference's ``merge_last_or_append`` fold over the
    per-granule run table (ref processors/OCO3SifProcessor.py:377-405):
    merge when |last.stop − item.start| <= margin (< for CO2-style strict)
    and ids equal OR either side is ``none_id``; the merged id prefers the
    non-none side and updates subsequent comparisons."""
    import pandas as pd
    from pyspark.sql import types as T

    key_fields = [runs.schema[c] for c in partition_cols]
    out_schema = T.StructType(
        [
            *key_fields,
            T.StructField(region_col, T.LongType()),
            T.StructField(target_col, T.StringType()),
            T.StructField("start_idx", T.LongType()),
            T.StructField("stop_excl", T.LongType()),
            T.StructField("n_runs", T.LongType()),
            T.StructField("n_mode_rows", T.LongType()),
        ]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__start")
        merged: list[list] = []  # [start, stop, id, n_runs, n_rows]
        for start, stop, tid, n in zip(
            pdf["__start"], pdf["__stop"], pdf["__tid"], pdf["__n"]
        ):
            if merged:
                last = merged[-1]
                gap = abs(int(start) - int(last[1]))
                gap_ok = gap <= margin if merge_inclusive else gap < margin
                if gap_ok and (last[2] == tid or none_id in (last[2], tid)):
                    rid = last[2] if last[2] != none_id else tid
                    merged[-1] = [last[0], int(stop), rid, last[3] + 1, last[4] + int(n)]
                    continue
            merged.append([int(start), int(stop), tid, 1, int(n)])
        keys = {c: pdf[c].iloc[0] for c in partition_cols}
        return pd.DataFrame(
            [
                {
                    **keys,
                    region_col: i + 1,
                    target_col: m[2],
                    "start_idx": m[0],
                    "stop_excl": m[1],
                    "n_runs": m[3],
                    "n_mode_rows": m[4],
                }
                for i, m in enumerate(merged)
            ],
            columns=[f.name for f in out_schema.fields],
        )

    return runs.groupBy(*partition_cols).applyInPandas(fold, out_schema)


def assign_rows_to_regions(
    df: DataFrame,
    regions: DataFrame,
    partition_cols: list[str],
    idx_col: str,
    region_col: str = "region_id",
    carry_cols: list[str] | None = None,
    bin_size: int = 256,
) -> DataFrame:
    """Membership join: every row whose index falls inside a region's
    ``[start_idx, stop_excl)`` extent — including swallowed off-mode rows,
    matching the reference's ``isel(sounding_id=slice)`` selection
    (ref processors/OCO3SamProcessor.py:447).

    ``carry_cols``: extra region-table columns to propagate onto the member
    rows (e.g. the region's resolved target id, the mode pass).

    The index range is joined as an EQUI-join on fixed index bins (each
    region explodes to the bins its span covers; each row carries its own
    bin) with the exact range predicate refined in-task — the same binned
    technique as the interval-overlap join (q81). A plain theta-join here
    plans as a nested loop over (partition key, range) and goes quadratic
    once a partition holds many regions — measured on the 10× fixture this
    very join was a >20-minute straggler as a nested loop and is seconds
    binned. Region spans are segmentation runs (short relative to
    ``bin_size``), so the explode stays near 1 bin per region; AQE decides
    broadcast vs shuffle from the actual region-table size.
    """
    rkeys = regions.select(
        *[F.col(c).alias(f"__r_{c}") for c in partition_cols],
        F.col(region_col),
        "start_idx",
        "stop_excl",
        *(carry_cols or []),
    ).withColumn(
        "__bin",
        # Guard degenerate regions (stop_excl <= start_idx): Spark's
        # sequence(hi, lo) generates a DESCENDING range, not an empty one,
        # so an empty region would explode spurious bin rows — correct
        # after the exact refine below, but silent join-input inflation.
        F.explode(
            F.when(
                F.col("stop_excl") > F.col("start_idx"),
                F.sequence(
                    (F.col("start_idx") / bin_size).cast("long"),
                    ((F.col("stop_excl") - 1) / bin_size).cast("long"),
                ),
            ).otherwise(F.array().cast("array<long>"))
        ),
    )
    rkeys = rkeys.withColumnRenamed("__bin", "__rbin")
    fact = df.withColumn("__bin", (F.col(idx_col) / bin_size).cast("long"))
    cond = (F.col("__bin") == F.col("__rbin"))
    for c in partition_cols:
        cond = cond & (F.col(c) == F.col(f"__r_{c}"))
    cond = (
        cond
        & (F.col(idx_col) >= F.col("start_idx"))
        & (F.col(idx_col) < F.col("stop_excl"))
    )
    joined = fact.join(rkeys, cond, "inner")
    return joined.drop("__bin", "__rbin", *[f"__r_{c}" for c in partition_cols])
