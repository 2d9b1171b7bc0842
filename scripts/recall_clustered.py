#!/usr/bin/env python
"""Measure the q116 recall dial on a CLUSTERED (mixture-of-Gaussians)
corpus — the regime real embedding models produce — alongside the
committed worst-case uniform numbers (PERF.md). Also verifies the
ordering property shortlist-rerank >= direct ADC at several codebook
sizes. Run: python scripts/recall_clustered.py
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from oco3_data_transformer_spark.operators import similarity as sim
from oco3_data_transformer_spark.session import get_spark

D = 32
M = 8
DSUB = D // M
N_CLUSTERS = 8
N_PER = 75
N_QUERIES = 10
RECALL_K = 3
SHORTLIST = 50


def mog_corpus(seed: int = 11):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0.0, 10.0, (N_CLUSTERS, D))
    rows = []
    vid = 0
    for c in range(N_CLUSTERS):
        pts = centers[c] + rng.normal(0.0, 1.0, (N_PER, D))
        for p in pts:
            rows.append((vid, [float(x) for x in p]))
            vid += 1
    return rows


def exact_topk(rows, query_ids, k):
    X = np.array([r[1] for r in rows])
    gt = {}
    for q in query_ids:
        d2 = ((X - X[q]) ** 2).sum(axis=1)
        order = np.lexsort((np.arange(len(rows)), d2))
        gt[q] = [int(i) for i in order if i != q][:k]
    return gt


def recall(pred: dict[int, list[int]], gt: dict[int, list[int]]) -> float:
    hits = sum(len(set(pred.get(q, [])) & set(g)) for q, g in gt.items())
    return hits / sum(len(g) for g in gt.values())


def main() -> int:
    spark = get_spark("recall-clustered")
    spark.sparkContext.setLogLevel("ERROR")
    rows = mog_corpus()
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    query_ids = list(range(N_QUERIES))
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    gt = exact_topk(rows, query_ids, RECALL_K)
    X = np.array([r[1] for r in rows])

    print(f"| configuration | direct ADC recall@{RECALL_K} | "
          f"shortlist-rerank recall@({RECALL_K},{SHORTLIST}) |")
    print("|---|---|---|")
    for n_codes in (16, 64, 128):
        books = sim.pq_codebooks(emb, m=M, dsub=DSUB, n_codes=n_codes)
        codes = sim.pq_encode(emb, books, dsub=DSUB).select(
            "vec_id", "subspace", "code"
        )
        direct = sim.pq_adc_knn(codes, books, queries, k=RECALL_K, dsub=DSUB)
        pred_d: dict[int, list[int]] = {}
        for r in direct.collect():
            pred_d.setdefault(r.query_id, []).append(r.neighbor_id)
        short = sim.pq_adc_knn(codes, books, queries, k=SHORTLIST, dsub=DSUB)
        pred_r: dict[int, list[int]] = {}
        for q, cands in (
            (q, [r.neighbor_id for r in grp])
            for q, grp in __import__("itertools").groupby(
                sorted(short.collect(), key=lambda r: (r.query_id, r.rank)),
                key=lambda r: r.query_id,
            )
        ):
            d2 = ((X[cands] - X[q]) ** 2).sum(axis=1)
            order = np.lexsort((np.array(cands), d2))
            pred_r[q] = [int(cands[i]) for i in order[:RECALL_K]]
        rd, rr = recall(pred_d, gt), recall(pred_r, gt)
        print(f"| PQ m={M} x {n_codes} codewords | {rd:.3f} | {rr:.3f} |")
        assert rr >= rd, f"ordering property violated at n_codes={n_codes}"
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
