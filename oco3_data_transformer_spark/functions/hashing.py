"""Deterministic, engine-portable hashing primitives.

The reference computes a Merkle-fold MD5 over a Zarr store to compare two
stores (ref tools/zarrChecksum/checksum.py:142-189). This engine generalizes
that into column-level deterministic hashes that are *bit-identical* between
Spark and ANSI-SQL engines, which makes probabilistic operators (MinHash,
SimHash) fully oracle-checkable rather than "approximately similar".

Portable 60-bit hash:
    Spark : conv(substr(md5(x), 1, 15), 16, 10)  cast to bigint
    DuckDB: CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)
Both parse the same 15 hex chars of the same md5 digest -> identical int64.

MinHash uses the classic universal family h_i(x) = (a_i*x + b_i) mod p over a
28-bit base hash so a_i * x stays < 2^57 (no int64 overflow in either engine).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Prime just under 2^29; base hash is 28 bits so a*h + b < 2^57 < 2^63.
MINHASH_PRIME = 536870909
# Deterministic seed table (generated once from digits of pi/e mixing; any
# fixed odd constants work — these are committed so oracle SQL can embed them).
MINHASH_SEEDS: list[tuple[int, int]] = [
    (15485863, 32452843),
    (49979687, 67867967),
    (86028121, 104395301),
    (122949823, 141650939),
    (160481183, 179424673),
    (198491317, 217645177),
    (236887691, 256203161),
    (275604541, 295075147),
    (314606869, 334214459),
    (353868013, 373587883),
    (393342739, 413158511),
    (433024223, 452930459),
    (472882027, 492876847),
    (512927357, 533000389),
    (15486041, 32452867),
    (49979693, 67868003),
]


def portable_hash64(col: Column) -> Column:
    """60-bit deterministic hash of a string column (md5-prefix)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def portable_hash64_sql(expr: str) -> str:
    """DuckDB SQL producing the identical value as :func:`portable_hash64`."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def portable_hash28(col: Column) -> Column:
    """28-bit deterministic hash (MinHash base domain)."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long")


def portable_hash28_sql(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 7) AS BIGINT)"


def minhash_value(base_hash: Column, seed_idx: int) -> Column:
    """One MinHash permutation value h_i(x) = (a*x + b) mod p (pre-min)."""
    a, b = MINHASH_SEEDS[seed_idx]
    return (base_hash * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)


def minhash_value_sql(expr: str, seed_idx: int) -> str:
    a, b = MINHASH_SEEDS[seed_idx]
    return f"(({expr}) * {a} + {b}) % {MINHASH_PRIME}"


def merkle_fold(hash_col: Column) -> Column:
    """Order-insensitive Merkle-style fold of per-row md5 hex strings.

    Aggregate expression: md5 of the '|'-joined *sorted* member hashes —
    the deterministic store-checksum idiom of
    ref tools/zarrChecksum/checksum.py:142-189 (which sorts file paths then
    pairwise-combines digests). Use inside ``groupBy(...).agg(...)``.
    """
    return F.md5(F.array_join(F.array_sort(F.collect_list(hash_col)), "|"))
