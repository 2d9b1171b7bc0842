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


# Extended permutation family for the k-mins cardinality sketch
# (operators/sketch.py): 48 more committed prime pairs continuing the same
# construction (all a < 2^29, so a*h + b stays < 2^58 in either engine).
# MinHash banding keeps its original 16; the sketch estimator's stderr
# ~ 1/sqrt(k) wants k=64.
KMINS_EXTRA_SEEDS: list[tuple[int, int]] = [
    (533000401, 533000411), (533000449, 533000467),
    (533000509, 533000537), (533000543, 533000561),
    (533000563, 533000579), (533000591, 533000593),
    (533000647, 533000659), (533000723, 533000729),
    (533000731, 533000753), (533000761, 533000791),
    (533000803, 533000833), (533000837, 533000899),
    (533000927, 533000933), (533000989, 533001031),
    (533001059, 533001061), (533001083, 533001089),
    (533001097, 533001109), (533001113, 533001137),
    (533001151, 533001163), (533001191, 533001239),
    (533001257, 533001263), (533001269, 533001299),
    (533001307, 533001311), (533001367, 533001419),
    (533001421, 533001449), (533001523, 533001541),
    (533001551, 533001571), (533001583, 533001593),
    (533001611, 533001617), (533001647, 533001649),
    (533001653, 533001659), (533001691, 533001739),
    (533001743, 533001751), (533001779, 533001797),
    (533001827, 533001829), (533001857, 533001863),
    (533001869, 533001877), (533001881, 533001893),
    (533001907, 533001961), (533001967, 533001971),
    (533001979, 533002021), (533002027, 533002081),
    (533002121, 533002123), (533002133, 533002147),
    (533002187, 533002213), (533002229, 533002297),
    (533002319, 533002321), (533002361, 533002373),
]
KMINS_SEEDS: list[tuple[int, int]] = MINHASH_SEEDS + KMINS_EXTRA_SEEDS


def kmins_value(base_hash: Column, seed_idx: int) -> Column:
    """One k-mins permutation value (extended family, pre-min)."""
    a, b = KMINS_SEEDS[seed_idx]
    return (base_hash * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)


def kmins_value_sql(expr: str, seed_idx: int) -> str:
    a, b = KMINS_SEEDS[seed_idx]
    return f"(({expr}) * {a} + {b}) % {MINHASH_PRIME}"


def portable_hash28_spark_sql(expr: str) -> str:
    """Spark-SQL text parsing to the same expression tree as
    :func:`portable_hash28`. Wide sketch aggregates (64-192 permutation
    mins) build each aggregate with ONE JVM-side parse instead of ~10
    Py4J round trips per composed Column — seconds of driver time per
    DataFrame build (bench "build"); the resolved plan is identical."""
    return f"CAST(conv(substring(md5({expr}), 1, 7), 16, 10) AS BIGINT)"


def kmins_value_spark_sql(expr: str, seed_idx: int) -> str:
    """Spark-SQL text for one k-mins permutation value (pre-min) — the
    string twin of :func:`kmins_value` (explicit parens: SQL ``%`` binds
    like ``*``, so the sum must be wrapped)."""
    a, b = KMINS_SEEDS[seed_idx]
    return f"((({expr}) * {a} + {b}) % {MINHASH_PRIME})"
