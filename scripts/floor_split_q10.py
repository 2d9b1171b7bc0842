#!/usr/bin/env python
"""Decompose q10_broadcast_dim_join's cost at the 100x fixture
(VERDICT r09 item 2: the sf10 exemption claimed "DuckDB amortizes
better" without showing how much of the 3.5 s is job-floor vs scan vs
join — evidence, not assertion, is required).

Methodology = scripts/floor_split.py (r5) extended with physical
increments, run under the EXACT bench_100x session (get_spark +
tune_for_input, min-of-N warm reps, noop sink so no rows reach the
driver):

  empty       one no-op job over an in-memory range (pure scheduling floor)
  scan_li     lineitem scan, q10's 4 columns, noop   (the fact-scan share)
  scan_od     orders scan + 1996 date filter, noop   (the probe-side share)
  join_core   li JOIN od on orderkey + 2-key agg     (adds the one shuffle
              join; dims excluded)
  full        the registered q10                      (adds 3 broadcast dims)

Prints one JSON line with min/median per leg plus the increments and the
load-provenance stamp (bench._stamp) so a degraded window is visible in
the artifact.  Usage: python scripts/floor_split_q10.py [fixture_dir]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from oco3_data_transformer_spark.catalog import REGISTRY, load  # noqa: E402
from oco3_data_transformer_spark.session import get_spark, tune_for_input  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, ".bench_data", "sf10"
    )
    reps = int(os.environ.get("FLOOR_REPS", "5"))
    spark = get_spark("floor-split-q10")
    spark.sparkContext.setLogLevel("ERROR")
    from oco3_data_transformer_spark.sources.registry import TABLES

    tune_for_input(spark, [f"{sf_dir}/{t}.parquet" for t in TABLES])
    from bench import _stamp  # noqa: E402

    def li():
        return load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )

    def od():
        return load(spark, sf_dir, "orders").filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        ).select("o_orderkey", "o_custkey")

    legs = {
        "empty": lambda: spark.range(1000).select(F.col("id")),
        "scan_li": li,
        "scan_od": od,
        "join_core": lambda: (
            li().join(od(), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy((F.col("o_custkey") % 25).alias("k"))
            .agg(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
                F.count(F.lit(1)).alias("n"),
            )
        ),
        "full": lambda: REGISTRY["q10_broadcast_dim_join"].fn(spark, sf_dir),
    }

    stamp_before = _stamp()
    # warm pass (file-listing caches, JIT, page cache)
    for fn in legs.values():
        fn().write.format("noop").mode("overwrite").save()

    out: dict = {"sf": sf_dir, "reps": reps, "legs": {}}
    for name, fn in legs.items():
        times = []
        for _ in range(reps):
            df = fn()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        out["legs"][name] = {
            "min": round(min(times), 3),
            "median": round(statistics.median(times), 3),
        }
        print(f"# {name}: {out['legs'][name]}", file=sys.stderr, flush=True)
    mins = {k: v["min"] for k, v in out["legs"].items()}
    out["increments"] = {
        "floor": mins["empty"],
        "li_scan_over_floor": round(mins["scan_li"] - mins["empty"], 3),
        "od_scan_over_floor": round(mins["scan_od"] - mins["empty"], 3),
        "join_over_scans": round(
            mins["join_core"] - mins["scan_li"] - mins["scan_od"] + mins["empty"], 3
        ),
        "dims_over_core": round(mins["full"] - mins["join_core"], 3),
        "scan_share_of_full": round(
            (mins["scan_li"] + mins["scan_od"] - 2 * mins["empty"]) / mins["full"], 3
        ),
    }
    out["load"] = {"before": stamp_before, "after": _stamp()}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
