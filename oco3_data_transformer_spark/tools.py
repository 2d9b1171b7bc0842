"""Standalone-tool CLI surface — the engine analogs of the reference's
``tools/`` directory, so a reference user can run every tool they run today:

    python -m oco3_data_transformer_spark.tools climatology <store> <out> \\
        [--span monthly|seasonal|annual|monthly-consolidated] [--start] [--end]
                                   (ref tools/climatology/main.py:489-607)
    python -m oco3_data_transformer_spark.tools checksum <store>
                                   (ref tools/zarrChecksum/checksum.py)
    python -m oco3_data_transformer_spark.tools verify <store>
    python -m oco3_data_transformer_spark.tools repair <store>
                                   (ref tools/repair/repair.py)
    python -m oco3_data_transformer_spark.tools compact <store> [--max-files N]
                                   (small-file maintenance; the columnar
                                   analog of Zarr consolidation/rechunk)
    python -m oco3_data_transformer_spark.tools sync <local.parquet> <remote.parquet>
                                   (ref tools/s3Sync/sync.py — manifests of
                                   (key, size, mtime); prints the action plan)
    python -m oco3_data_transformer_spark.tools corpus-prep <docs.parquet> <out> \\
        [--min-tokens N] [--no-near-dup] [--capacity N] [--shards N]
                                   (training-corpus pipeline: exact dedup ->
                                   near-dup components -> quality floor ->
                                   hash split -> sequence packing; engine
                                   addition, no reference analog)
    python -m oco3_data_transformer_spark.tools export-zarr <store> <out.zarr> \\
        --mission M --target T --qf pre|post --lat-res N --lon-res N \\
        [--chunk-t N] [--bbox min_lon,min_lat,max_lon,max_lat]
                                   (ref writers/ZarrWriter.py:82-326 — the
                                   reference's primary output container,
                                   written from-spec by sinks/zarrlite.py;
                                   chunk assembly and writes run on the
                                   executors, sinks/zarr_store.py)

The deploy orchestrator has its own entry point
(``python -m oco3_data_transformer_spark.orchestrator``, ref tools/deploy).
bbox-tools map to ``functions.scalar`` (C6/C7) and need no driver.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F

SPAN_TO_FREQ = {
    "monthly": ("month", False),
    "seasonal": ("season", False),
    "annual": ("year", False),
    "monthly-consolidated": ("month", True),
}


def _climatology(args) -> int:
    from .plans.climatology import climatology
    from .session import get_spark

    spark = get_spark("climatology-tool")
    freq, consolidate = SPAN_TO_FREQ[args.span]
    out = climatology(
        spark.read.parquet(args.store),
        freq=freq,
        start=args.start,
        end=args.end,
        month_of_year=consolidate,
    )
    out.write.mode("overwrite" if args.overwrite else "errorifexists").parquet(
        args.output
    )
    n = spark.read.parquet(args.output).count()
    print(json.dumps({"spans_written": n, "output": args.output}))
    return 0


def _checksum(args) -> int:
    from .session import get_spark
    from .sinks import store

    spark = get_spark("checksum-tool")
    print(json.dumps({"digest": store.checksum(spark, args.store)}))
    return 0


def _verify(args) -> int:
    from .session import get_spark
    from .sinks import store

    spark = get_spark("verify-tool")
    rep = store.verify(spark, args.store)
    print(json.dumps(rep, default=str))
    return 0 if rep["duplicate_keys"] == 0 else 1


def _repair(args) -> int:
    from .session import get_spark
    from .sinks import store

    spark = get_spark("repair-tool")
    n = store.repair(spark, args.store)
    rep = store.verify(spark, args.store)
    print(json.dumps({"rows_after_repair": n, **rep}, default=str))
    return 0 if rep["duplicate_keys"] == 0 else 1


def _compact(args) -> int:
    from .session import get_spark
    from .sinks import store

    spark = get_spark("compact-tool")
    n = store.compact(spark, args.store, args.max_files)
    print(json.dumps({"partitions_rewritten": n}))
    return 0


def _sync(args) -> int:
    from .operators.joins import sync_diff
    from .session import get_spark

    spark = get_spark("sync-tool")
    plan = sync_diff(
        spark.read.parquet(args.local), spark.read.parquet(args.remote)
    )
    counts = {
        r["action"]: r["n"]
        for r in plan.groupBy("action").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if args.plan_output:
        plan.filter(F.col("action") != "unchanged").write.mode("overwrite").parquet(
            args.plan_output
        )
    print(json.dumps(counts))
    return 0


def _corpus_prep(args) -> int:
    from .plans.corpus_prep import corpus_prep
    from .session import get_spark

    spark = get_spark("corpus-prep-tool")
    packed, stats = corpus_prep(
        spark.read.parquet(args.documents),
        min_tokens=args.min_tokens,
        near_dup=not args.no_near_dup,
        capacity=args.capacity,
        n_shards=args.shards,
    )
    packed.write.mode("overwrite" if args.overwrite else "errorifexists").parquet(
        args.output
    )
    print(json.dumps({**stats.as_dict(), "output": args.output}))
    return 0


def _export_zarr(args) -> int:
    from .session import get_spark
    from .sinks.export import GLOBAL_BBOX
    from .sinks.zarr_store import export_zarr

    spark = get_spark("export-zarr-tool")
    rows = spark.read.parquet(args.store).filter(
        (F.col("mission") == args.mission)
        & (F.col("target_id") == args.target)
        & (F.col("qf") == args.qf)
    )
    bbox = (
        tuple(float(x) for x in args.bbox.split(","))
        if args.bbox
        else GLOBAL_BBOX
    )
    manifest = export_zarr(
        rows,
        args.output,
        lat_res=args.lat_res,
        lon_res=args.lon_res,
        chunk_t=args.chunk_t,
        bbox=bbox,
    )
    print(json.dumps(manifest))
    return 0


def _append_zarr(args) -> int:
    from .session import get_spark
    from .sinks.zarr_store import append_zarr

    spark = get_spark("append-zarr-tool")
    rows = spark.read.parquet(args.store)
    print(json.dumps(append_zarr(rows, args.zarr)))
    return 0


def _verify_zarr(args) -> int:
    from .sinks.zarr_store import verify_zarr

    rep = verify_zarr(args.zarr)
    print(json.dumps(rep))
    return 0 if rep["ok"] else 1


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="oco3-spark-tools")
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("climatology", help="per-span pixel climatology over the store")
    c.add_argument("store")
    c.add_argument("output")
    c.add_argument("--span", choices=sorted(SPAN_TO_FREQ), default="monthly")
    c.add_argument("--start", default=None)
    c.add_argument("--end", default=None)
    c.add_argument("--overwrite", action="store_true")
    c.set_defaults(fn=_climatology)

    for name, fn in (("checksum", _checksum), ("verify", _verify), ("repair", _repair)):
        p = sub.add_parser(name)
        p.add_argument("store")
        p.set_defaults(fn=fn)

    k = sub.add_parser("compact", help="rewrite fragmented store partitions")
    k.add_argument("store")
    k.add_argument("--max-files", type=int, default=1)
    k.set_defaults(fn=_compact)

    s = sub.add_parser("sync", help="incremental sync plan from two manifests")
    s.add_argument("local")
    s.add_argument("remote")
    s.add_argument("--plan-output", default=None)
    s.set_defaults(fn=_sync)

    cp = sub.add_parser(
        "corpus-prep",
        help="training-corpus pipeline: dedup -> quality -> split -> pack",
    )
    cp.add_argument("documents")
    cp.add_argument("output")
    cp.add_argument("--min-tokens", type=int, default=5)
    cp.add_argument("--no-near-dup", action="store_true")
    cp.add_argument("--capacity", type=int, default=2048)
    cp.add_argument("--shards", type=int, default=64)
    cp.add_argument("--overwrite", action="store_true")
    cp.set_defaults(fn=_corpus_prep)

    z = sub.add_parser(
        "export-zarr",
        help="export one (mission, target, qf) store slice as a Zarr v2 store",
    )
    z.add_argument("store")
    z.add_argument("output")
    z.add_argument("--mission", required=True)
    z.add_argument("--target", required=True)
    z.add_argument("--qf", choices=["pre", "post"], required=True)
    z.add_argument("--lat-res", type=int, required=True)
    z.add_argument("--lon-res", type=int, required=True)
    z.add_argument("--chunk-t", type=int, default=64)
    z.add_argument("--bbox", default=None,
                   help="min_lon,min_lat,max_lon,max_lat (default global)")
    z.set_defaults(fn=_export_zarr)

    za = sub.add_parser(
        "append-zarr",
        help="append store-slice parquet rows along time to a Zarr store "
        "(keep-first on duplicate days; out-of-order days rewrite sorted)",
    )
    za.add_argument("store", help="parquet of store-slice rows to append")
    za.add_argument("zarr", help="existing Zarr store written by export-zarr")
    za.set_defaults(fn=_append_zarr)

    zv = sub.add_parser(
        "verify-zarr",
        help="S7 verification of a Zarr store: monotonic time, no "
        "duplicate days, shape/chunk-grid consistency (exit 1 on problems)",
    )
    zv.add_argument("zarr")
    zv.set_defaults(fn=_verify_zarr)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
