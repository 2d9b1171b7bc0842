#!/usr/bin/env python
"""Round-5 graph-family measurement (PERF.md): time q117/q119-q124 plus
the q31-vs-q122 algorithm comparison on both engines at a given fixture
(default the 10x .bench_data/sf1). Same methodology as bench_100x.py:
build once / execute twice (plan reuse), DuckDB warm single-pass.

Usage: python scripts/bench_graph_family.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from oco3_data_transformer_spark.catalog import REGISTRY  # noqa: E402
from oco3_data_transformer_spark.oracle_check import duck_connection  # noqa: E402
from oco3_data_transformer_spark.session import get_spark  # noqa: E402

QUERIES = [
    "q117_transition_pagerank",
    "q119_neardup_graph_triangles",
    "q120_mutual_knn_graph",
    "q121_neardup_graph_communities",
    "q122_prefix_filter_simjoin",
    "q123_neardup_graph_kcore",
    "q124_seed_expansion_ppr",
    "q31_ngram_jaccard_neardup",  # algorithm baseline for q122
]


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    spark_only = "--spark-only" in sys.argv
    skip = {
        a.split("=", 1)[1]
        for a in sys.argv[1:]
        if a.startswith("--skip=")
    }
    queries = [q for q in QUERIES if q not in skip]
    sf_dir = args[0] if args else os.path.join(ROOT, ".bench_data", "sf1")
    spark = get_spark("bench_graph")
    spark.sparkContext.setLogLevel("ERROR")
    from oco3_data_transformer_spark.session import tune_for_input
    from oco3_data_transformer_spark.sources.registry import TABLES

    tune_for_input(spark, [f"{sf_dir}/{t}.parquet" for t in TABLES])
    out: dict = {"sf": sf_dir, "spark": {}, "spark_build": {}, "duckdb": {}}

    REGISTRY["q24_coverage_attrs"].fn(spark, sf_dir).collect()  # warmup
    for name in queries:
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

    if spark_only:
        out["spark_total"] = round(sum(out["spark"].values()), 2)
        print(json.dumps(out))
        return 0
    con = duck_connection(sf_dir)
    con.execute("SELECT 1").fetchall()
    for name in queries:
        sql = REGISTRY[name].sql
        if sql is None:
            continue
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
