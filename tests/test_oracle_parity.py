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


def test_query_groups_are_registry_members():
    """Every QUERY_GROUPS member must be a REGISTRY key: a renamed query
    silently breaks the documented ``--only @group`` CI lanes (the @graph
    lane shipped broken for a round because q121's registry key changed —
    VERDICT r06), and _resolve_only's unknown-name guard then rejects the
    whole lane before running anything."""
    from oco3_data_transformer_spark.oracle_check import QUERY_GROUPS

    for group, members in QUERY_GROUPS.items():
        missing = [m for m in members if m not in REGISTRY]
        assert not missing, f"@{group} names unknown queries: {missing}"


def test_vacuous_zero_row_match_flagged(spark, duck):
    """Non-vacuous floor (VERDICT r06 item 6): a query returning 0 rows
    must FAIL at >= sf0.01 (both engines agreeing on empty proves
    nothing) and be annotated vacuous below it."""
    from oco3_data_transformer_spark.catalog import QueryDef

    good = REGISTRY["q08_day_limit"]
    empty_fn = lambda spark, sf: good.fn(spark, sf).limit(0)  # noqa: E731
    empty_sql = f"SELECT * FROM ({good.sql}) WHERE 1=0"
    REGISTRY["__vacuous_probe"] = QueryDef(fn=empty_fn, sql=empty_sql, doc="")
    try:
        res = compare_query(spark, duck, "__vacuous_probe", SF_DIR)
        assert res["match"] and res.get("vacuous") is True  # sf0.001: annotated
        res = compare_query(spark, duck, "__vacuous_probe", "/root/testdata/sf0.01")
        assert not res["match"] and "vacuous" in res["why"]  # gate sf: fails
    finally:
        del REGISTRY["__vacuous_probe"]


def test_harness_detects_mismatches(spark, duck):
    """Negative control: the comparison harness must actually FAIL on value,
    rowcount, and column differences — otherwise 58 green rows prove
    nothing about the checker itself."""
    from oco3_data_transformer_spark.catalog import QueryDef

    good = REGISTRY["q08_day_limit"]
    broken = {
        "wrong-values": good.sql.replace("count(*)", "count(*) + 1"),
        "wrong-rowcount": good.sql.replace("LIMIT 5", "LIMIT 4"),
        "wrong-columns": good.sql.replace("AS n_orders", "AS n_orderz"),
    }
    try:
        for why, sql in broken.items():
            REGISTRY["q08_day_limit"] = QueryDef(fn=good.fn, sql=sql, doc=good.doc)
            res = compare_query(spark, duck, "q08_day_limit", SF_DIR)
            assert not res["match"], f"harness missed a {why} mismatch"
    finally:
        REGISTRY["q08_day_limit"] = good


def test_float_canon_is_relative_past_double_resolution():
    """r10: 6-dp absolute float canon demanded sub-ulp agreement on
    1e11-magnitude parallel sums (q01 at the 100x fixture flaked on a
    4e-14 relative accumulation-order difference). Above 1e9 the canon is
    12 significant digits: mathematically-equal sums in any partition
    order agree, >= 1e-9 relative differences still fail, and the 6-dp
    absolute canon below the threshold is untouched."""
    from oco3_data_transformer_spark.oracle_check import _canon_cell

    a, b = 283913704431.0, 283913704430.98999  # observed q01 pair
    assert _canon_cell(a) == _canon_cell(b)
    assert _canon_cell(a) != _canon_cell(a * (1 + 1e-9))
    # below the threshold nothing changed
    assert _canon_cell(136761900.0) == "136761900.000000"
    assert _canon_cell(0.05) == "0.050000"
    assert _canon_cell(1.0000004) != _canon_cell(1.0000014)
