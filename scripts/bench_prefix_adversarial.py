#!/usr/bin/env python
"""Prefix-filter vs full co-occurrence on the ADVERSARIAL hot-shingle
corpus (PERF.md) — the regime q122's algorithm exists for. Reuses the
test fixture (tests/test_dedup_adversarial.py: 1k exact dups + 500-doc
chain + 1.5k filler, 30% of docs carrying one shared 4-token run),
scaled by --mult via disjoint token namespaces per replica EXCEPT the
hot run, which stays global — so the hot shingle's document count grows
linearly with the corpus and the co-occurrence join's k² expansion grows
quadratically, while the prefix index (rarest-first) keeps excluding it.

Both operators produce the SAME exact pair set (equality asserted before
timing). Timings: plan-reuse (build once, min of 2 executions).

Usage: python scripts/bench_prefix_adversarial.py [--mult 4] [--threshold 0.5]
"""

from __future__ import annotations

import argparse
import random
import sys
import time

import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from oco3_data_transformer_spark.operators import dedup  # noqa: E402
from oco3_data_transformer_spark.session import get_spark  # noqa: E402

SEED = 7
HOT = "common boilerplate header shared"


def corpus(mult: int) -> list[tuple[int, str]]:
    """CANONICAL corpus (post-exact-dedup, the documented operating point
    for every near-dup operator — dedup.py module docstring): a near-dup
    chain + unique filler, with 30% of docs carrying one shared hot token
    run. The hot shingles pair docs that are NOT near-dups (Jaccard ~0.1
    << threshold), so their k²/2 co-occurrence expansion is pure wasted
    candidate work — the regime prefix filtering exists for. Replica
    token namespaces are disjoint; the hot run is GLOBAL, so its document
    count (and the quadratic expansion) grows with mult."""
    rng = random.Random(SEED)
    docs = []
    for rep in range(mult):
        words = [f"r{rep}w{i}" for i in range(5000)]  # disjoint per replica
        base = rep * 100_000
        stream = rng.choices(words, k=4 * 500 + 40)
        for i in range(500):
            docs.append((base + 10_000 + i, " ".join(stream[4 * i : 4 * i + 40])))
        for i in range(1500):
            docs.append((base + 20_000 + i, " ".join(rng.choices(words, k=40))))
    out = []
    for doc_id, text in docs:
        if rng.random() < 0.30:
            out.append((doc_id, text + " " + HOT))  # GLOBAL hot run
        else:
            out.append((doc_id, text))
    return out


def timed(df) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=4)
    ap.add_argument("--threshold", type=float, default=0.5)
    a = ap.parse_args()
    spark = get_spark("bench_prefix_adv")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.createDataFrame(corpus(a.mult), "doc_id long, text string")
    docs = docs.localCheckpoint()  # corpus build off the clock
    n = docs.count()

    forms = {
        "cooccurrence_salted": lambda: dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", 3, a.threshold, "auto"
        ),
        "cooccurrence_unsalted": lambda: dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", 3, a.threshold, None
        ),
        "prefix_filter": lambda: dedup.prefix_filter_jaccard_pairs(
            docs, "doc_id", "text", 3, a.threshold
        ),
    }
    # correctness first: identical pair sets
    sets = {}
    for name, f in forms.items():
        sets[name] = {
            (r["id_a"], r["id_b"], round(r["jacc"], 6)) for r in f().collect()
        }
    assert sets["prefix_filter"] == sets["cooccurrence_salted"] == sets[
        "cooccurrence_unsalted"
    ], "forms disagree"
    out = {"docs": n, "mult": a.mult, "threshold": a.threshold,
           "pairs": len(sets["prefix_filter"]), "sec": {}}
    for name, f in forms.items():
        df = f()
        out["sec"][name] = round(timed(df), 2)
        print(f"# {name}: {out['sec'][name]}s", file=sys.stderr, flush=True)
    import json

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
