#!/usr/bin/env python
"""Scale-up bench fixture: derive an sf1.0-class dataset from the driver's
sf0.1 dir by replicating the fact tables K× (default 10×) with per-replica
transforms that keep the workload shape LINEAR in K:

- ``lineitem`` / ``orders``: order keys offset per replica (join structure
  and group cardinalities preserved; the lineitem<->orders join stays
  consistent because both sides use the same span).
- ``events``: user/event ids offset per replica — 10× the users, same
  session-length distribution, so sessionization work scales linearly
  instead of producing 10×-longer per-user sequences.
- ``documents``: every whitespace token gets a replica suffix (replica 0 is
  untouched). Within-replica near-dup/exact-dup structure is preserved
  bit-for-bit; cross-replica shingle overlap is zero, so LSH/Jaccard pair
  counts scale ×K, not ×K².
- ``embeddings``: per-replica deterministic Rademacher sign flip of the
  vector (seeded by replica id; replica 0 untouched). Norms are exactly
  preserved; cross-replica cosines are ~N(0, 1/d), so near-dup/KNN
  candidate structure scales linearly.
- dimension tables (``region nation customer supplier part``) are copied
  unchanged — at 100 TB the dims stay broadcast-sized too.

Everything is deterministic (fixed seeds, no wall-clock), and pyarrow
round-trips the source schemas exactly — notably events.ts stays parquet
TIMESTAMP(NANOS), exercising the same nanos read path as the driver data.

Usage: python scripts/make_bench_sf.py [--src /root/testdata/sf0.1]
                                       [--dst .bench_data/sf1] [-k 10]
"""

from __future__ import annotations

import argparse
import os
import re
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DIM_TABLES = ("region", "nation", "customer", "supplier", "part")
FACT_TABLES = ("lineitem", "orders", "events", "documents", "embeddings")


def _span(*arrays) -> int:
    """Power-of-10 span strictly above every key in *arrays* — keeps
    per-replica key blocks visually distinct and collision-free."""
    hi = max(int(pa.compute.max(a).as_py()) for a in arrays)
    span = 10
    while span <= hi:
        span *= 10
    return span


def _offset(table: pa.Table, col: str, delta: int) -> pa.Table:
    i = table.schema.get_field_index(col)
    shifted = pa.compute.add(table.column(col), pa.scalar(delta, pa.int64()))
    return table.set_column(i, table.schema.field(i), shifted.cast(table.schema.field(i).type))


def _suffix_tokens(text: str, tag: str) -> str:
    # Append the tag to every ALPHANUMERIC RUN (not whitespace chunk): the
    # engine's tokenizer splits on [^a-z0-9]+, so "w12,x" -> "w12r3,xr3"
    # keeps token count and n-gram structure exactly isomorphic to the
    # original (tag chars merge into the token instead of forming a marker
    # token, which would collapse every context of a common word into one
    # hot "tag word tag" shingle).
    return re.sub(r"[A-Za-z0-9]+", lambda m: m.group(0) + tag, text)


def _replicate(name: str, src: pa.Table, r: int, spans: dict) -> pa.Table:
    if r == 0:
        return src
    if name == "lineitem":
        return _offset(src, "l_orderkey", r * spans["order"])
    if name == "orders":
        return _offset(src, "o_orderkey", r * spans["order"])
    if name == "events":
        t = _offset(src, "event_id", r * spans["event"])
        return _offset(t, "user_id", r * spans["user"])
    if name == "documents":
        tag = f"r{r}"
        texts = [
            None if v is None else _suffix_tokens(v, tag)
            for v in src.column("text").to_pylist()
        ]
        t = _offset(src, "doc_id", r * spans["doc"])
        ti = t.schema.get_field_index("text")
        t = t.set_column(ti, t.schema.field(ti), pa.array(texts, pa.string()))
        ni = t.schema.get_field_index("n_chars")
        n_chars = pa.array(
            [None if v is None else len(v) for v in texts],
            t.schema.field(ni).type,
        )
        return t.set_column(ni, t.schema.field(ni), n_chars)
    if name == "embeddings":
        t = _offset(src, "vec_id", r * spans["vec"])
        vi = t.schema.get_field_index("embedding")
        col = t.column("embedding").combine_chunks()
        flat = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
        values = np.asarray(flat.values, dtype=np.float32).copy()
        dim = len(values) // len(t)
        signs = np.random.default_rng(1_000 + r).choice(
            np.float32([-1.0, 1.0]), size=dim
        )
        values = (values.reshape(-1, dim) * signs).reshape(-1)
        rebuilt = pa.ListArray.from_arrays(
            flat.offsets, pa.array(values, pa.float32())
        ).cast(t.schema.field(vi).type)
        return t.set_column(vi, t.schema.field(vi), rebuilt)
    raise KeyError(name)


def ensure(src: str, dst: str, k: int = 10, force: bool = False) -> str:
    """Idempotently materialize the scaled fixture; returns *dst*."""
    stamp = os.path.join(dst, f".complete_k{k}")
    if os.path.exists(stamp) and not force:
        return dst
    os.makedirs(dst, exist_ok=True)
    for name in DIM_TABLES:
        shutil.copyfile(f"{src}/{name}.parquet", f"{dst}/{name}.parquet")

    lineitem = pq.read_table(f"{src}/lineitem.parquet")
    orders = pq.read_table(f"{src}/orders.parquet")
    events = pq.read_table(f"{src}/events.parquet")
    docs = pq.read_table(f"{src}/documents.parquet")
    embs = pq.read_table(f"{src}/embeddings.parquet")
    spans = {
        "order": _span(lineitem.column("l_orderkey"), orders.column("o_orderkey")),
        "event": _span(events.column("event_id")),
        "user": _span(events.column("user_id")),
        "doc": _span(docs.column("doc_id")),
        "vec": _span(embs.column("vec_id")),
    }
    for name, src_t in (
        ("lineitem", lineitem),
        ("orders", orders),
        ("events", events),
        ("documents", docs),
        ("embeddings", embs),
    ):
        out = pa.concat_tables([_replicate(name, src_t, r, spans) for r in range(k)])
        pq.write_table(out, f"{dst}/{name}.parquet")
    with open(stamp, "w") as f:
        f.write(f"src={src} k={k}\n")
    return dst


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(os.path.dirname(__file__), "..", ".bench_data", "sf1"))
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--force", action="store_true")
    a = ap.parse_args()
    dst = ensure(a.src, os.path.abspath(a.dst), a.k, a.force)
    for name in DIM_TABLES + FACT_TABLES:
        n = pq.ParquetFile(f"{dst}/{name}.parquet").metadata.num_rows
        print(f"{name}: {n} rows")
    return 0


if __name__ == "__main__":
    main()
