#!/usr/bin/env python
"""Round-4 operator measurement at a scale fixture (PERF.md additions):
run the training-loop / sketch / LM / PQ queries (q101-q112) on both
engines and print one JSON blob.

Usage: python scripts/bench_round4.py [sf_dir]   (default .bench_data/sf1)
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

ROUND4 = [
    "q101_train_order",
    "q102_length_batches",
    "q103_class_balance",
    "q104_length_percentiles",
    "q105_epoch_pipeline",
    "q106_kmins_distinct",
    "q107_countmin_heavy",
    "q108_bigram_perplexity",
    "q109_pq_encode",
    "q110_pq_adc_knn",
    "q111_sketch_setops",
    "q112_bpe_apply",
    "q113_histogram_quantiles",
    "q114_bloom_semijoin",
    "q115_ivfpq_knn",
    "q116_ann_recall",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, ".bench_data", "sf1")
    spark = get_spark("bench-r4")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf": sf_dir, "spark": {}, "duckdb": {}}

    REGISTRY["q01_pricing_summary"].fn(spark, sf_dir).collect()  # warmup
    for name in ROUND4:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out["spark"][name] = round(best, 2)
        print(f"# spark {name}: {best:.2f}s", file=sys.stderr, flush=True)

    con = duck_connection(sf_dir)
    con.execute("SELECT 1").fetchall()
    for name in ROUND4:
        sql = REGISTRY[name].sql
        if sql is None:
            continue
        con.execute(sql).fetchall()  # warm
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        out["duckdb"][name] = round(time.perf_counter() - t0, 2)
        print(f"# duckdb {name}: {out['duckdb'][name]}s", file=sys.stderr, flush=True)
    con.close()

    oracled = [n for n in ROUND4 if REGISTRY[n].sql is not None]
    out["spark_total_oracled"] = round(sum(out["spark"][n] for n in oracled), 2)
    out["duckdb_total"] = round(sum(out["duckdb"].values()), 2)
    out["ratio"] = round(out["spark_total_oracled"] / out["duckdb_total"], 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
