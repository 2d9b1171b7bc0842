#!/usr/bin/env python
"""Assemble BENCH_SF10.json from a completed-but-interrupted bench_100x run.

bench_100x.py writes its artifact only at the very end, so a run whose
LAST DuckDB leg exceeds practical runtime loses every already-measured
number. This assembler recovers them with full provenance instead of
re-measuring:

  - Spark timings are parsed from the interrupted run's stderr log
    (min-of-2 warm, measured at the HEAD recorded in the artifact);
  - DuckDB timings present in the log are taken as-is;
  - the pair-generating dedup oracles (q31/q32/q33) are carried from a
    prior BENCH_SF10-shaped file exactly like bench_100x --reuse-duck
    (oracle timings are repo-code-independent);
  - any still-missing CHEAP oracle leg is run fresh here (warm,
    single-pass — bench_100x's own duck methodology);
  - a query named in --skip-duck is recorded with duckdb = null plus a
    "duckdb_skipped" provenance note (e.g. an oracle leg aborted after
    N seconds: the artifact then carries a ratio UPPER BOUND, not a
    measurement, and bench.py's rising-ratio check treats null as
    not-evidence).

Usage:
  python scripts/assemble_bench_sf10.py LOG [--reuse-duck PREV.json]
      [--skip-duck name:reason] [dst_dir]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from make_bench_sf import ensure  # noqa: E402

from oco3_data_transformer_spark.catalog import REGISTRY  # noqa: E402
from oco3_data_transformer_spark.oracle_check import duck_connection  # noqa: E402

REUSABLE = {
    "q31_ngram_jaccard_neardup",
    "q32_minhash_lsh_neardup",
    "q33_simhash_neardup",
}


def main() -> int:
    argv = list(sys.argv[1:])
    log_path = argv.pop(0)
    reuse_duck = None
    if "--reuse-duck" in argv:
        i = argv.index("--reuse-duck")
        with open(argv[i + 1]) as fh:
            reuse_duck = json.load(fh)
        del argv[i : i + 2]
    skips: dict[str, str] = {}
    while "--skip-duck" in argv:
        i = argv.index("--skip-duck")
        name, _, reason = argv[i + 1].partition(":")
        skips[name] = reason
        del argv[i : i + 2]
    dst = argv[0] if argv else os.path.join(ROOT, ".bench_data", "sf10")

    text = open(log_path, errors="replace").read().replace("\r", "\n")
    spark = {
        m.group(1): float(m.group(2))
        for m in re.finditer(r"# spark (\S+): ([0-9.]+)s", text)
    }
    duck = {
        m.group(1): float(m.group(2))
        for m in re.finditer(r"# duckdb (\S+): ([0-9.]+)s", text)
    }

    from bench_sets import HEADLINE, KERNEL_DETAIL, ROUND6_DETAIL, SKETCH_DETAIL

    both_engines = HEADLINE + SKETCH_DETAIL + ROUND6_DETAIL
    expected_spark = both_engines + KERNEL_DETAIL
    missing_spark = [n for n in expected_spark if n not in spark]
    if missing_spark:
        print(f"log is missing spark legs {missing_spark}; re-run bench_100x",
              file=sys.stderr)
        return 1

    try:
        head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=ROOT,
            capture_output=True, text=True,
        ).stdout.strip()
    except OSError:
        head = "unknown"
    out: dict = {
        "sf": dst, "k": 100, "head": head,
        "spark": {n: spark[n] for n in expected_spark},
        "spark_build": {},  # not recoverable from the log; omitted
        "duckdb": {},
        "assembled_from_log": os.path.basename(log_path),
    }

    reused = {}
    if reuse_duck is not None:
        reused = {n: v for n, v in reuse_duck["duckdb"].items() if n in REUSABLE}
        out["duckdb"].update(reused)
        out["duckdb_reused"] = {
            "head": reuse_duck.get("head"), "queries": sorted(reused),
        }
    for n, v in duck.items():
        out["duckdb"].setdefault(n, v)
    if skips:
        out["duckdb_skipped"] = skips

    missing = [
        n for n in both_engines
        if n not in out["duckdb"] and n not in skips
        and REGISTRY[n].sql is not None
    ]
    if missing:
        sf_dir = ensure("/root/testdata/sf0.1", dst, k=100)
        con = duck_connection(sf_dir)
        con.execute("SELECT 1").fetchall()
        for name in missing:
            sql = REGISTRY[name].sql
            con.execute(sql).fetchall()  # warm
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            out["duckdb"][name] = round(time.perf_counter() - t0, 2)
            print(f"# duckdb {name}: {out['duckdb'][name]}s",
                  file=sys.stderr, flush=True)
        con.close()

    out["per_query_ratio"] = {
        n: round(out["spark"][n] / d, 2) if d else None
        for n, d in out["duckdb"].items()
    }
    hd = [n for n in out["duckdb"] if n in set(HEADLINE)]
    out["spark_total"] = round(sum(out["spark"][n] for n in hd), 2)
    out["duckdb_total"] = round(sum(out["duckdb"][n] for n in hd), 2)
    out["ratio"] = (
        round(out["spark_total"] / out["duckdb_total"], 3)
        if out["duckdb_total"] else None
    )
    with open(os.path.join(ROOT, "BENCH_SF10.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in ("head", "spark_total", "duckdb_total", "ratio")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
