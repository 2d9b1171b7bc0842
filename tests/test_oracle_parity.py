"""Every catalog query vs its DuckDB oracle at sf0.001 (the driver's
CORRECTNESS gate runs the same comparison at sf0.01 — oracle_check.py)."""

from __future__ import annotations

import pytest

from oco3_data_transformer_spark.catalog import REGISTRY
from oco3_data_transformer_spark.oracle_check import compare_query, duck_connection

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    res = compare_query(spark, duck, name, SF_DIR)
    assert res["match"], res.get("why")
