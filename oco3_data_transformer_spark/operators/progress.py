"""A9: progress / telemetry counters (ref utils/Progress.py:22-80).

The reference maintains named subtask counters with totals and percentages,
JSON-logged for CloudWatch scraping. Spark-side the same observability comes
from two built-ins, wrapped here:

  - ``observe`` (Observation API): named aggregate metrics attached to a
    DataFrame, collected as a side effect of the action that consumes it —
    zero extra passes, works in batch plans;
  - accumulators for per-kernel counters incremented inside pandas UDFs
    (e.g. granules decoded, regions gridded);
  - Structured Streaming exposes the same via StreamingQueryListener —
    the ingest module's ledger rows carry batch ids for the same purpose.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_counts(
    df: DataFrame, name: str, **named_conditions
) -> tuple[DataFrame, Observation]:
    """Attach named counters to a plan: total rows plus one count per
    condition. Read ``obs.get`` AFTER an action consumes the DataFrame.

    >>> df, obs = observe_counts(rows, "qf", good=F.col("flag") == 0)
    >>> df.write...; obs.get  # {'total': N, 'good': M}
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("total")]
    for key, cond in named_conditions.items():
        metrics.append(F.count(F.when(cond, 1)).alias(key))
    return df.observe(obs, *metrics), obs


def progress_json(obs: Observation, totals: dict[str, int] | None = None) -> str:
    """The reference's JSON progress line: counters plus percent-of-total
    where a total is known (ref utils/Progress.py:72-77)."""
    got: dict[str, Any] = dict(obs.get)
    if totals:
        for k, total in totals.items():
            if k in got and total:
                got[f"{k}_pct"] = round(100.0 * got[k] / total, 2)
    return json.dumps(got, sort_keys=True, default=str)
