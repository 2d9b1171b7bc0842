"""Climatology plan (§3.3 / A1 / A2) vs pandas goldens: monthly and
seasonal span means, valid counts, n_days, month-of-year consolidation."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from oco3_data_transformer_spark.plans.climatology import climatology
from oco3_data_transformer_spark.schemas import STORE_SLICE


@pytest.fixture(scope="module")
def store_rows(spark):
    rows = []
    # one pixel, daily values over 14 months; value null every 5th day
    day = dt.datetime(2023, 1, 1)
    i = 0
    while day < dt.datetime(2024, 3, 1):
        v = None if i % 5 == 0 else float(i % 30)
        rows.append(("oco3", "t1", "post", day, 3, 4, "xco2", v))
        day += dt.timedelta(days=1)
        i += 1
    return spark.createDataFrame(rows, STORE_SLICE), rows


def _pandas_monthly(rows):
    pdf = pd.DataFrame(rows, columns=STORE_SLICE.fieldNames())
    pdf["span"] = pdf["time"].dt.to_period("M").dt.start_time
    g = pdf.groupby("span")
    return pd.DataFrame(
        {
            "mean": g["value"].mean(),
            "valid_count": g["value"].count(),
            "n_days": g["time"].apply(lambda s: s.dt.date.nunique()),
        }
    )


def test_monthly_climatology_matches_pandas(spark, store_rows):
    df, rows = store_rows
    out = climatology(df, freq="month").toPandas().set_index("span").sort_index()
    golden = _pandas_monthly(rows).sort_index()
    assert len(out) == 14  # Jan 2023 .. Feb 2024 inclusive
    for span, g in golden.iterrows():
        row = out.loc[pd.Timestamp(span)]
        assert row["mean"] == pytest.approx(g["mean"])
        assert row["valid_count"] == g["valid_count"]
        assert row["n_days"] == g["n_days"]


def test_time_subset_prunes(spark, store_rows):
    df, _ = store_rows
    out = climatology(df, freq="month", start="2023-06-01", end="2023-08-31 23:59:59")
    spans = sorted(r.span for r in out.select("span").collect())
    assert [s.month for s in spans] == [6, 7, 8]


def test_seasonal_split_at_day_20(spark):
    # The reference's seasonal rule (ref tools/climatology/main.py:194-209):
    # boundaries at day 20 of Mar/Jun/Sep/Dec — Mar 20 closes a season,
    # Mar 21 opens the next; Jan-Mar 20 belongs to Dec 21 of the prior year.
    rows = [
        ("oco3", "t1", "post", dt.datetime(2023, 1, 5), 0, 0, "xco2", 1.0),
        ("oco3", "t1", "post", dt.datetime(2023, 3, 20), 0, 0, "xco2", 2.0),
        ("oco3", "t1", "post", dt.datetime(2023, 3, 21), 0, 0, "xco2", 4.0),
        ("oco3", "t1", "post", dt.datetime(2023, 6, 20), 0, 0, "xco2", 8.0),
        ("oco3", "t1", "post", dt.datetime(2023, 6, 21), 0, 0, "xco2", 16.0),
        ("oco3", "t1", "post", dt.datetime(2023, 12, 21), 0, 0, "xco2", 32.0),
    ]
    df = spark.createDataFrame(rows, STORE_SLICE)
    out = {r.span: r for r in climatology(df, freq="season").collect()}
    spans = sorted(out)
    assert [s.isoformat() for s in spans] == [
        "2022-12-21", "2023-03-21", "2023-06-21", "2023-12-21",
    ]
    assert out[spans[0]].mean == pytest.approx(1.5)   # Jan 5 + Mar 20
    assert out[spans[1]].mean == pytest.approx(6.0)   # Mar 21 + Jun 20
    assert out[spans[2]].mean == pytest.approx(16.0)  # Jun 21
    assert out[spans[3]].mean == pytest.approx(32.0)  # Dec 21


def test_month_of_year_consolidation(spark):
    rows = []
    for year in (2022, 2023):
        for m, v in ((1, 10.0), (2, 20.0)):
            rows.append(("oco3", "t1", "post", dt.datetime(year, m, 5), 0, 0, "xco2", v + year % 10))
    df = spark.createDataFrame(rows, STORE_SLICE)
    out = {r.month: r for r in climatology(df, freq="month", month_of_year=True).collect()}
    assert set(out) == {1, 2}
    # mean of the two yearly monthly means
    assert out[1].mean == pytest.approx((12.0 + 13.0) / 2)
    assert out[1].valid_count == 2
    assert out[1].span == dt.date(1970, 1, 1)
