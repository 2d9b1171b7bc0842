#!/usr/bin/env python
"""q32 (minhash_dedup) stage decomposition at a given fixture (round 11).

Times each successive subplan with the noop sink (bench session/methodology)
so the expensive stage is identified before touching anything — guide §1.

    python scripts/probe_q32.py <sf_dir> [reps]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def noop_time(df, reps):
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return min(samples)


def main() -> int:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from oco3_data_transformer_spark.catalog import REGISTRY
    from oco3_data_transformer_spark.functions import hashing
    from oco3_data_transformer_spark.operators import dedup as dedup_ops
    from oco3_data_transformer_spark.session import get_spark, tune_for_input
    from oco3_data_transformer_spark.sources.registry import TABLES

    spark = get_spark("probe-q32")
    spark.sparkContext.setLogLevel("ERROR")
    applied = tune_for_input(spark, [f"{sf_dir}/{t}.parquet" for t in TABLES])
    print(f"# session conf: {applied}", flush=True)
    REGISTRY["q24_coverage_attrs"].fn(spark, sf_dir).collect()  # warmup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n, k, bands = 3, len(hashing.MINHASH_SEEDS), 4
    rows_per_band = k // bands

    # stage 1: hashed shingle table WITHOUT h28 (xxhash64 only)
    sh_no28 = dedup_ops.hashed_shingle_table(docs, "doc_id", "text", n)
    print(f"s1  shingles(no h28)        : {noop_time(sh_no28, reps):.3f}", flush=True)

    # stage 1b: with h28 (adds md5-per-occurrence)
    sh = dedup_ops.hashed_shingle_table(docs, "doc_id", "text", n, with_h28=True)
    print(f"s1b shingles(+h28/md5)      : {noop_time(sh, reps):.3f}", flush=True)

    # stage 2: signature aggregate (count + collect_list + k minima)
    sig = sh.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_sh"),
        F.collect_list("h").alias("hs"),
        *[
            F.min(hashing.minhash_value(F.col("h28"), i)).alias(f"m{i}")
            for i in range(k)
        ],
    )
    print(f"s2  sig agg(full)           : {noop_time(sig, reps):.3f}", flush=True)

    # stage 2b: signature aggregate without the hs array
    sig_min = sh.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_sh"),
        *[
            F.min(hashing.minhash_value(F.col("h28"), i)).alias(f"m{i}")
            for i in range(k)
        ],
    )
    print(f"s2b sig agg(no hs array)    : {noop_time(sig_min, reps):.3f}", flush=True)

    # stage 3: banding + bucket grouping + pair expansion (cands)
    band_cols = []
    for b in range(bands):
        member = [
            F.col(f"m{i}").cast("string")
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        band_cols.append(F.concat_ws("|", F.lit(b), F.md5(F.concat_ws(",", *member))))
    banded = sig.select(
        F.struct("id", "n_sh").alias("node"),
        F.explode(F.array(*band_cols)).alias("bb"),
    )
    grouped = banded.groupBy("bb").agg(
        F.array_sort(F.collect_list("node")).alias("nodes")
    )
    cands = (
        grouped.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("nodes"),
                        lambda x, i: F.transform(
                            F.slice(F.col("nodes"), i + 2, F.size(F.col("nodes"))),
                            lambda y: F.struct(x.alias("a"), y.alias("b")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select(
            F.col("p.a.id").alias("id_a"),
            F.col("p.b.id").alias("id_b"),
            F.col("p.a.n_sh").alias("n_a"),
            F.col("p.b.n_sh").alias("n_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    print(f"s3  cands                   : {noop_time(cands, reps):.3f}", flush=True)

    # stage 4: full q32
    q32 = REGISTRY["q32_minhash_lsh_neardup"].fn(spark, sf_dir)
    print(f"s4  full q32                : {noop_time(q32, reps):.3f}", flush=True)

    # counts for context
    print(f"# docs={docs.count()} shingle_rows={sh.count()} cands={cands.count()}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
