"""Vector (embedding) column expressions — dot product, norms, cosine.

Implemented with ``F.zip_with`` + ``F.aggregate`` so the arithmetic runs
JVM-side over ``array<float>`` columns with a *defined left-to-right fold
order*. That ordering matters: the DuckDB oracle's ``list_dot_product`` also
folds sequentially, so double-precision results agree to the last ulp on the
same inputs, making cosine ranks deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_sql(a: str, b: str) -> str:
    """DuckDB cosine with the same sequential-fold semantics (doubles)."""
    da = f"list_transform({a}, x -> CAST(x AS DOUBLE))"
    db = f"list_transform({b}, x -> CAST(x AS DOUBLE))"
    return (
        f"list_dot_product({da}, {db}) / "
        f"(sqrt(list_dot_product({da}, {da})) * sqrt(list_dot_product({db}, {db})))"
    )


def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance with the same defined left-to-right fold order
    as :func:`dot` (cross-engine bit-identical on equal inputs)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2sq_sql(a: str, b: str) -> str:
    """DuckDB squared-L2 with sequential fold semantics (doubles)."""
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) "
        f"* (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"
    )
