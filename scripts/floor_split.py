#!/usr/bin/env python
"""Split the per-query sf0.1 cost into (a) DataFrame construction —
driver-side Py4J/analysis chatter — vs (b) execution of an already-built
plan, under the winning floor_matrix config. Informs whether bench-side
plan reuse (VERDICT r04 item 1, judge-sanctioned) is worth adopting.
"""
from __future__ import annotations

import json
import sys
import time

from oco3_data_transformer_spark.catalog import REGISTRY
from oco3_data_transformer_spark.session import get_spark
from scripts.floor_matrix import HEADLINE  # type: ignore

def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cfg = sys.argv[2] if len(sys.argv) > 2 else "sp8_aqe_off"
    spark = get_spark("floor-split")
    spark.sparkContext.setLogLevel("ERROR")
    if cfg == "sp8_aqe_off":
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    REGISTRY["q24_coverage_attrs"].fn(spark, sf_dir).collect()
    # warm pass
    for name in HEADLINE:
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    out = {}
    for name in HEADLINE:
        build, run, full = [], [], []
        for _ in range(3):
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            build.append(t1 - t0)
            full.append(t2 - t0)
            # re-execute the SAME DataFrame object (plan reuse)
            t3 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            run.append(time.perf_counter() - t3)
        out[name] = {
            "build": round(min(build), 3),
            "full": round(min(full), 3),
            "reused_exec": round(min(run), 3),
        }
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)
    tot = {k: round(sum(v[k] for v in out.values()), 3) for k in ("build", "full", "reused_exec")}
    print(json.dumps({"totals": tot, "queries": out}))
    return 0

if __name__ == "__main__":
    sys.exit(main())
