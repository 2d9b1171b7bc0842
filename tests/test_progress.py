"""A9 observability: named plan metrics via Observation, JSON progress."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from oco3_data_transformer_spark.operators.progress import observe_counts, progress_json


def test_observe_counts(spark):
    df = spark.range(100).withColumn("flag", (F.col("id") % 4 == 0).cast("int"))
    observed, obs = observe_counts(df, "qf", good=F.col("flag") == 1)
    observed.write.format("noop").mode("overwrite").save()
    assert obs.get == {"total": 100, "good": 25}


def test_progress_json_percentages(spark):
    df = spark.range(50)
    observed, obs = observe_counts(df, "p", even=F.col("id") % 2 == 0)
    observed.write.format("noop").mode("overwrite").save()
    payload = json.loads(progress_json(obs, totals={"even": 50}))
    assert payload["total"] == 50
    assert payload["even"] == 25
    assert payload["even_pct"] == 50.0
