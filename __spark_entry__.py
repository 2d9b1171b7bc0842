"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's signature
sessionization operator) at sf0.001; ``queries()`` / ``oracle_sql()`` expose
the full operator catalog (one entry per implemented operator from
SURVEY.md §2 plus the training-data-pipeline extensions) — see
``oco3_data_transformer_spark/catalog.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from oco3_data_transformer_spark.catalog import REGISTRY

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: gap-merging sessionization (SURVEY §2.4) on sf0.001."""
    return REGISTRY["q18_sessionize_gap_merge"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.sql for name, qd in REGISTRY.items() if qd.sql is not None}
