#!/usr/bin/env python
"""Graph-family build-floor decomposition (round 11, VERDICT r10 item 4).

Times, at a given fixture, the pieces of the q121/q123/q124 builds:
front end (rare-shingle occurrences), wedge aggregate, edge
symmetrize+persist, the control-plane probes, and EACH per-round eager
step of LPA / k-core / PPR — so the ~1 s/round floor is decomposed into
broadcast build vs round compute vs checkpoint materialization.

    python scripts/probe_graph_rounds.py <sf_dir> [lpa|kcore|ppr|all]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> int:
    sf_dir = sys.argv[1]
    which = sys.argv[2] if len(sys.argv) > 2 else "lpa"

    from pyspark.sql import functions as F

    from oco3_data_transformer_spark import catalog_corpus
    from oco3_data_transformer_spark.catalog import REGISTRY
    from oco3_data_transformer_spark.operators import graph as graph_ops
    from oco3_data_transformer_spark.session import get_spark, tune_for_input
    from oco3_data_transformer_spark.sources.registry import TABLES

    spark = get_spark("probe-graph")
    spark.sparkContext.setLogLevel("ERROR")
    applied = tune_for_input(spark, [f"{sf_dir}/{t}.parquet" for t in TABLES])
    print(f"# session conf: {applied}", flush=True)
    REGISTRY["q24_coverage_attrs"].fn(spark, sf_dir).collect()  # warmup

    t0 = time.perf_counter()
    shr = catalog_corpus._rare_shingle_occurrences.__wrapped__(spark, sf_dir) \
        if hasattr(catalog_corpus._rare_shingle_occurrences, "__wrapped__") \
        else catalog_corpus._rare_shingle_occurrences(spark, sf_dir)
    nshr = shr.count()
    print(f"front end (rare occurrences) : {time.perf_counter()-t0:.3f}  rows={nshr}", flush=True)

    a = shr.select(F.col("id").alias("id_a"), "h")
    b = shr.select(F.col("id").alias("id_b"), "h")
    t0 = time.perf_counter()
    wedges = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    wedges = wedges.localCheckpoint(eager=True)
    nw = wedges.count()
    print(f"wedge aggregate              : {time.perf_counter()-t0:.3f}  edges={nw}", flush=True)

    if which in ("lpa", "all"):
        # ---- LPA unrolled with per-phase timers (mirrors label_propagation)
        from pyspark.sql import Window  # noqa: F401

        iters = 4
        half = wedges.select(
            F.col("id_a").alias("__a"), F.col("id_b").alias("__b"),
            F.col("n_common").cast("long").alias("__w"),
        ).filter(F.col("__a") != F.col("__b"))
        t0 = time.perf_counter()
        e = (
            half.select(
                F.explode(
                    F.array(
                        F.struct(F.col("__a"), F.col("__b"), F.col("__w")),
                        F.struct(
                            F.col("__b").alias("__a"),
                            F.col("__a").alias("__b"),
                            F.col("__w"),
                        ),
                    )
                ).alias("__e")
            )
            .select("__e.__a", "__e.__b", "__e.__w")
            .repartition(graph_ops._sess_width(wedges), "__a")
        )
        e = e.persist()
        ne = e.count()
        print(f"lpa: symmetrize+persist      : {time.perf_counter()-t0:.3f}  rows={ne}", flush=True)

        t0 = time.perf_counter()
        labels = (
            e.select(F.col("__a").alias("node"))
            .distinct()
            .select("node", F.col("node").alias("community"))
        )
        nl = labels.count()
        print(f"lpa: labels probe (count)    : {time.perf_counter()-t0:.3f}  nodes={nl}", flush=True)

        for i in range(iters):
            t0 = time.perf_counter()
            lab = F.broadcast(labels)
            votes = (
                e.join(lab, e["__b"] == lab["node"])
                .groupBy(F.col("__a").alias("n"), F.col("community").alias("cand"))
                .agg(F.sum("__w").alias("__wsum"))
            )
            labels = votes.groupBy(F.col("n").alias("node")).agg(
                F.min_by(
                    "cand", F.struct((-F.col("__wsum")).alias("nw"), F.col("cand"))
                ).alias("community")
            )
            build = time.perf_counter() - t0
            t0 = time.perf_counter()
            if i + 1 < iters:
                labels = labels.localCheckpoint(eager=True)
            ckpt = time.perf_counter() - t0
            print(f"lpa: round {i}: plan={build:.3f} eager-ckpt={ckpt:.3f}", flush=True)
        t0 = time.perf_counter()
        labels.write.format("noop").mode("overwrite").save()
        print(f"lpa: final round exec        : {time.perf_counter()-t0:.3f}", flush=True)

    if which in ("ppr", "all"):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        from oco3_data_transformer_spark.catalog_corpus import PPR_SEED_MAX, PPR_ITERS  # noqa
        wsym = wedges.select(
            F.explode(
                F.array(
                    F.struct(F.col("id_a").alias("a"), F.col("id_b").alias("b"), F.col("n_common")),
                    F.struct(F.col("id_b").alias("a"), F.col("id_a").alias("b"), F.col("n_common")),
                )
            ).alias("__e")
        ).select("__e.a", "__e.b", "__e.n_common")
        seeds = docs.filter(F.col("doc_id") < PPR_SEED_MAX).select(F.col("doc_id").alias("node"))
        t0 = time.perf_counter()
        out = graph_ops.personalized_pagerank(
            wsym, "a", "b", "n_common", seeds, iters=PPR_ITERS
        )
        print(f"ppr: total build             : {time.perf_counter()-t0:.3f}", flush=True)
        t0 = time.perf_counter()
        out.write.format("noop").mode("overwrite").save()
        print(f"ppr: exec                    : {time.perf_counter()-t0:.3f}", flush=True)

    return 0


if __name__ == "__main__":
    sys.exit(main())
