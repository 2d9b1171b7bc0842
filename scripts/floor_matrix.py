#!/usr/bin/env python
"""Knob-experiment matrix for the sf0.1 per-query scheduling floor
(VERDICT r04 next-round item 1).

Runs the 14 headline queries under a grid of runtime-settable session
configs, in ONE process window (same JVM, warm codegen), min-of-N per
query, and prints a config x total table.  The goal is to find which
knobs cut the local-mode floor WITHOUT touching the plans themselves,
then either adopt the winners (if they also hold at the 10x fixture)
or publish the matrix as proof the floor is irreducible.

Usage: python scripts/floor_matrix.py [sf_dir] [reps]
"""
from __future__ import annotations

import json
import sys
import time

from oco3_data_transformer_spark.catalog import REGISTRY
from oco3_data_transformer_spark.session import get_spark

HEADLINE = [
    "q01_pricing_summary",
    "q02_filter_pushdown_revenue",
    "q10_broadcast_dim_join",
    "q13_range_refine_join",
    "q17_sessionize_islands",
    "q18_sessionize_gap_merge",
    "q20_climatology_monthly",
    "q25_dedup_keep_first",
    "q31_ngram_jaccard_neardup",
    "q32_minhash_lsh_neardup",
    "q33_simhash_neardup",
    "q34_knn_bruteforce",
    "q40_ivf_knn",
    "q41_grid_kernel",
]

# All runtime-settable (verified: spark.conf.set succeeds for each).
CONFIGS: dict[str, dict[str, str]] = {
    "baseline": {},
    "aqe_off": {"spark.sql.adaptive.enabled": "false"},
    "sp8": {"spark.sql.shuffle.partitions": "8"},
    "sp8_aqe_off": {
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.adaptive.enabled": "false",
    },
    "coalesce_size_first": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
    },
    "sp8_coalesce": {
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
    },
}

BASE = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
}


def run_config(spark, sf_dir: str, overrides: dict[str, str], reps: int) -> dict:
    for k, v in BASE.items():
        spark.conf.set(k, v)
    for k, v in overrides.items():
        spark.conf.set(k, v)
    per_query: dict[str, float] = {}
    for name in HEADLINE:
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        per_query[name] = round(min(samples), 3)
    return per_query


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("floor-matrix")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup
    REGISTRY["q24_coverage_attrs"].fn(spark, sf_dir).collect()
    run_config(spark, sf_dir, {}, 1)  # full-plan codegen warmup pass

    results: dict[str, dict] = {}
    for cfg_name, overrides in CONFIGS.items():
        pq = run_config(spark, sf_dir, overrides, reps)
        total = round(sum(pq.values()), 3)
        results[cfg_name] = {"total": total, "queries": pq}
        print(f"## {cfg_name}: {total} s", file=sys.stderr, flush=True)
    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
