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
    # rows-only entries are the documented non-SQL-expressible kernels
    rows_only = set(qs) - set(osql)
    assert rows_only == {
        "q42_oco3_pipeline", "q43_image_features",
        "q44_oco3_global_raster", "q53_audio_features",
    }
