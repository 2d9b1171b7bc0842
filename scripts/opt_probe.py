#!/usr/bin/env python
"""Isolated query timing probe for optimization work (round 10).

Times named catalog queries with the EXACT bench.py methodology — bench
session (get_spark + tune_for_input), plan built once, noop-sink reps,
min + median reported — so numbers here are comparable to BENCH_DETAIL
legs at the same fixture.

    python scripts/opt_probe.py <sf_dir> q106_kmins_distinct[,q111_...] [reps]

Prints one line per query: name, build, min, med, reps.
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from oco3_data_transformer_spark.catalog import REGISTRY
    from oco3_data_transformer_spark.session import get_spark, tune_for_input
    from oco3_data_transformer_spark.sources.registry import TABLES

    spark = get_spark("opt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    applied = tune_for_input(spark, [f"{sf_dir}/{t}.parquet" for t in TABLES])
    print(f"# session conf: {applied}", flush=True)
    # warmup on a trivial plan (excluded)
    REGISTRY["q24_coverage_attrs"].fn(spark, sf_dir).collect()

    for name in names:
        spark.sparkContext.setJobDescription(f"opt-probe {name}")
        t0 = time.perf_counter()
        df = REGISTRY[name].fn(spark, sf_dir)
        build = time.perf_counter() - t0
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        s = sorted(samples)
        med = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
        print(
            f"{name}: build={build:.3f} min={min(samples):.3f} "
            f"med={med:.3f} reps={reps}",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
