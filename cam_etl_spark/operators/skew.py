"""Skew mitigation (SURVEY §4, SCALE.md).

AQE's skew-join splitting handles most cases at runtime; ``salted_join`` is
the explicit fallback for joins where one key dominates so heavily that
even split partitions hot-spot — e.g. a null-ish default road_id carried by
a large fraction of addresses, or one locality holding half the parcels.

Mechanics: the skewed (large) side gets a deterministic per-row salt in
[0, buckets); the small side is replicated once per salt value. The join
key becomes (key, salt) → the hot key's rows spread over ``buckets``
reducers. Row-count semantics are identical to the plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    buckets: int = 8,
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on ``on`` with the hot-key rows of the
    large side spread across ``buckets`` reducers.

    The salt is xxhash64 over ALL of the large side's columns (deterministic,
    no RNG state; ties only for fully-identical rows, which may legally
    co-locate). The small side is exploded ``buckets``× — keep it small.

    Row-count semantics match the plain join for inner/left-family joins
    only: in a right or full outer join every UNMATCHED small-side row would
    surface once per salt replica (``buckets`` duplicates), so those modes
    are rejected — salt the other input instead (swap sides and use left)."""
    norm = how.lower().replace("_", "")
    if norm in {"right", "rightouter", "full", "fullouter", "outer"}:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched small-side "
            "rows would be duplicated once per salt replica. Swap the inputs "
            "(salt the other side) and use a left join."
        )
    salts = F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    l_salted = large.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(buckets))
    )
    # SHUFFLE_HASH: salting only exists for the regime where the small side
    # is NOT broadcastable (if it were, a broadcast join has no per-key
    # reducers and no skew problem in the first place) — pin the plan to
    # the shuffled join the technique targets, so the (key, salt) spread
    # actually lands on different reducers.
    s_salted = small.withColumn("__salt", salts).hint("shuffle_hash")
    out = l_salted.join(s_salted, [on, "__salt"], how)
    return out.drop("__salt")
