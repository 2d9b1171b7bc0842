"""q127/q128 accuracy-contract check: positive + NEGATIVE control.

The oracle for these queries predicts every verdict true, so the check
only means something if a violating value actually flips the verdict —
the negative control injects a deliberately-wrong 'approx' aggregate and
asserts the rank-band catches it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oco3_data_transformer_spark.catalog_sketch import _approx_band_query


def _df(spark):
    rows = [("g", float(i)) for i in range(200)] + [("h", float(i * 3)) for i in range(150)]
    return spark.createDataFrame(rows, "grp string, v double")


def test_real_approx_passes_band(spark):
    out = _approx_band_query(_df(spark), "grp", "v", [0.5, 0.9]).collect()
    assert len(out) == 2
    assert all(r.p50_ok and r.p90_ok for r in out)


def test_broken_approx_fails_band(spark):
    # 'approx' that always returns the MIN: rank ~0, nowhere near p=0.5/0.9
    def broken(col, p):
        return F.min(col)

    out = _approx_band_query(_df(spark), "grp", "v", [0.5, 0.9], approx_fn=broken).collect()
    assert all((not r.p50_ok) and (not r.p90_ok) for r in out)


def test_near_miss_outside_slack_fails(spark):
    # an 'approx' at the 40th percentile: outside p=0.5 ± (1/100 + 2/n)
    def p40(col, p):
        return F.percentile(col, F.lit(0.40))

    out = _approx_band_query(_df(spark), "grp", "v", [0.5], approx_fn=p40).collect()
    assert all(not r.p50_ok for r in out)
