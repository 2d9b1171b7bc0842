#!/usr/bin/env python
"""One-off 100× per-query measurement (PERF.md scaling-curve section):
build the k=100 fixture from sf0.1, run EVERY headline query on both
engines (Spark min-of-2 warm; DuckDB single-pass warm — its quadratic
dedup oracles make multi-rep runs prohibitive), print one JSON blob.

Usage: python scripts/bench_100x.py [dst_dir]   (default .bench_data/sf10)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from make_bench_sf import ensure  # noqa: E402

from oco3_data_transformer_spark.catalog import REGISTRY  # noqa: E402
from oco3_data_transformer_spark.oracle_check import duck_connection  # noqa: E402
from oco3_data_transformer_spark.session import get_spark  # noqa: E402

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


def main() -> int:
    dst = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, ".bench_data", "sf10")
    sf_dir = ensure("/root/testdata/sf0.1", dst, k=100)
    spark = get_spark("bench100")
    spark.sparkContext.setLogLevel("ERROR")
    from oco3_data_transformer_spark.session import tune_for_input
    from oco3_data_transformer_spark.sources.registry import TABLES

    # no-op at this fixture's 1.5 GB (>= the 1 GiB small-input bound) —
    # applied for methodological consistency with bench.py
    tune_for_input(spark, [f"{sf_dir}/{t}.parquet" for t in TABLES])
    out: dict = {"sf": sf_dir, "k": 100, "spark": {}, "spark_build": {}, "duckdb": {}}

    REGISTRY["q24_coverage_attrs"].fn(spark, sf_dir).collect()  # warmup
    for name in HEADLINE:
        # build once / execute twice (plan reuse) — bench.py's methodology
        t0 = time.perf_counter()
        df = REGISTRY[name].fn(spark, sf_dir)
        out["spark_build"][name] = round(time.perf_counter() - t0, 2)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out["spark"][name] = round(best, 2)
        print(f"# spark {name}: {best:.2f}s", file=sys.stderr, flush=True)

    con = duck_connection(sf_dir)
    con.execute("SELECT 1").fetchall()
    for name in HEADLINE:
        sql = REGISTRY[name].sql
        if sql is None:
            continue
        t0 = time.perf_counter()
        con.execute(sql).fetchall()  # warm
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        out["duckdb"][name] = round(time.perf_counter() - t0, 2)
        print(f"# duckdb {name}: {out['duckdb'][name]}s", file=sys.stderr, flush=True)
    con.close()

    out["spark_total"] = round(sum(out["spark"].values()), 2)
    out["duckdb_total"] = round(sum(out["duckdb"].values()), 2)
    out["ratio"] = round(out["spark_total"] / out["duckdb_total"], 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
