"""Filter / predicate operators F1-F10 (SURVEY.md §2.2).

All are plain ``filter``/semi-join formulations so Catalyst pushes them into
the scan (verify with ``.explain``: ``PushedFilters`` on the parquet scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mode codes, ref processors/OCO3SamProcessor.py:37-38 (CO2) and
# processors/OCO3SifProcessor.py:37-38 (SIF SAM=3).
OPERATION_MODE_TARGET = 2
OPERATION_MODE_SAM = 4
SIF_MODE_SAM = 3

MISSING_TARGET_IDS = ("Missing", "missing")  # ref processors/OCO3SamProcessor.py:441-445


def mode_filter(df: DataFrame, mode_col: str, modes: list[int]) -> DataFrame:
    """F2: keep soundings in the given operation modes."""
    return df.filter(F.col(mode_col).isin(modes))


def quality_filter_co2(df: DataFrame, qf_col: str = "xco2_quality_flag") -> DataFrame:
    """F3 (CO2): good soundings have flag == 0
    (ref processors/OCO3SamProcessor.py:452)."""
    return df.filter(F.col(qf_col) == 0)


def quality_filter_sif(df: DataFrame, qf_col: str = "Quality_Flag") -> DataFrame:
    """F3 (SIF): good soundings have flag in {0, 1}
    (ref processors/OCO3SifProcessor.py:499-505)."""
    return df.filter(F.col(qf_col).isin(0, 1))


def drop_regions_without_good(
    df: DataFrame, region_cols: list[str], good: Column
) -> DataFrame:
    """F3 region-drop: a region with zero good soundings is dropped entirely
    from the post-QF branch (ref processors/OCO3SamProcessor.py:455-464).

    Left-semi join against the qualifying region keys — a map-side broadcast
    at typical region cardinality, no fact-table shuffle.
    """
    good_regions = df.filter(good).select(*region_cols).distinct()
    return df.join(F.broadcast(good_regions), on=region_cols, how="left_semi")


def pre_post_split(df: DataFrame, good: Column) -> tuple[DataFrame, DataFrame]:
    """F4: every region is emitted twice — unfiltered ('pre') and
    QF-filtered ('post') (ref main.py:374-418). Caller should ``persist``
    the input if both branches are consumed in one job."""
    return df, df.filter(good)


def drop_missing_targets(df: DataFrame, target_col: str = "target_id") -> DataFrame:
    """F5 (ref processors/OCO3SamProcessor.py:441-445)."""
    return df.filter(~F.col(target_col).isin(*MISSING_TARGET_IDS))


def drop_empty_slices(
    df: DataFrame, slice_cols: list[str], value_cols: list[str]
) -> DataFrame:
    """F7: drop output slices whose science variables are all-NaN/null
    (ref utils/dataset_utils.py:21-26, config 'drop-empty' README.md:336-345).
    """
    counts = df.groupBy(*slice_cols).agg(
        *[F.count(F.col(c)).alias(f"__n_{c}") for c in value_cols]
    )
    nonempty = counts.filter(
        sum((F.col(f"__n_{c}") for c in value_cols), F.lit(0)) > 0
    ).select(*slice_cols)
    return df.join(F.broadcast(nonempty), on=slice_cols, how="left_semi")


def time_range(df: DataFrame, time_col: str, start, end) -> DataFrame:
    """F8: climatology-style time subset (ref tools/climatology/main.py:177-221)
    — with ``partitionBy(time)`` storage this is partition pruning."""
    return df.filter(F.col(time_col).between(start, end))


def limit_days(df: DataFrame, day_col: str, n: int) -> DataFrame:
    """F9: cap the number of (ordered) distinct data-days staged per run
    (ref tools/deploy/run.py:596-603)."""
    days = df.select(day_col).distinct().orderBy(day_col).limit(n)
    return df.join(F.broadcast(days), on=day_col, how="left_semi")
