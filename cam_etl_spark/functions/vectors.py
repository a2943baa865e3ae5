"""Vector math over ``array<float>`` embedding columns — JVM-side via
``F.zip_with`` / ``F.aggregate`` (no Python in the hot path). Used by the
similarity-search operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine_similarity(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def cosine_from_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """``cosine_similarity`` with both L2 norms precomputed as columns.
    Same expressions in the same order — identical doubles — but a side
    that meets k partners in a join pays its norm fold once per ROW
    instead of once per PAIR (the norm is 1/3 of the per-pair HOF work)."""
    denom = na * nb
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


# --- SQL-text twins -------------------------------------------------------
# The Column builders above cost ~15-30 py4j round-trips each (zip_with/
# aggregate lambdas are built element-wise); query BUILD time is on the
# bench's timed path and pure py4j is its low-noise component. These
# return the SAME expression trees as SQL text parsed in the caller's one
# selectExpr/expr call: `0.0D` is the double literal F.lit(0.0) builds,
# the CASTs and operator order match exactly, so the computed doubles are
# bit-identical. Use them where the inputs are plain SQL fragments.


def dot_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0.0D, (acc, v) -> acc + v)"
    )


def l2_norm_sql(a: str) -> str:
    return (
        f"sqrt(aggregate({a}, 0.0D, "
        "(acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    )


def cosine_from_norms_sql(a: str, b: str, na: str, nb: str) -> str:
    # F.when(denom == 0, 0.0).otherwise(dot/denom): the int literal 0 and
    # the CASE shape match the Column form after analysis
    return (
        f"CASE WHEN ({na}) * ({nb}) = 0 THEN 0.0D "
        f"ELSE {dot_sql(a, b)} / (({na}) * ({nb})) END"
    )


def l2_sq(a: Column, b: Column) -> Column:
    """Squared euclidean distance, left-to-right fold (the order the
    DuckDB oracle's list_sum replays)."""
    diffs = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double"))
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)
