"""Recursive hierarchy closure (SURVEY J12).

The reference resolves site parent chains and PNDB name lineage with
Postgres ``WITH RECURSIVE`` (/root/reference/etl-notes.md:663-722). Spark
SQL has no recursive CTE, so the engine runs an iterative frontier loop:
repeatedly self-join the frontier onto the parent edge until fixpoint.
Each iteration is one shuffle on the join key; depth is bounded by the
longest chain (site hierarchies are shallow), and localCheckpoint/persist
keeps lineage from growing unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_roots(
    edges: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent_id",
    max_iterations: int = 30,
) -> DataFrame:
    """For each node, find its root ancestor and depth (root nodes have
    parent NULL / self / empty). Returns (id, root_id, depth).

    Pointer-doubling style loop: current mapping id→ancestor is repeatedly
    advanced one parent step until no row changes. Deterministic; cycles are
    cut by max_iterations.
    """
    nodes = edges.select(
        F.col(id_col).alias("id"),
        F.when(
            F.col(parent_col).isNull()
            | (F.trim(F.col(parent_col).cast("string")) == "")
            | (F.col(parent_col) == F.col(id_col)),
            F.lit(None),
        )
        .otherwise(F.col(parent_col))
        .alias("parent_id"),
    )
    parent_map = nodes.filter(F.col("parent_id").isNotNull()).select(
        F.col("id").alias("child"), F.col("parent_id").alias("parent")
    )
    state = nodes.select(
        "id",
        F.coalesce("parent_id", "id").alias("anc"),
        F.when(F.col("parent_id").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("depth"),
    )
    for _ in range(max_iterations):
        advanced = (
            state.join(parent_map, state.anc == parent_map.child, "left")
            .select(
                "id",
                F.coalesce("parent", "anc").alias("anc"),
                (F.col("depth") + F.when(F.col("parent").isNotNull(), 1).otherwise(0)).alias("depth"),
            )
        )
        advanced = advanced.localCheckpoint(eager=True)
        moved = advanced.join(
            state.select("id", F.col("anc").alias("prev_anc")), "id"
        ).filter(F.col("anc") != F.col("prev_anc"))
        state = advanced
        if moved.isEmpty():
            break
    return state.select("id", F.col("anc").alias("root_id"), "depth")


def descendants_closure(
    edges: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent_id",
    max_iterations: int = 30,
) -> DataFrame:
    """Full transitive ancestor closure: (id, ancestor_id, distance ≥ 1).
    The frontier-join analogue of the reference's recursive CTE output."""
    base = (
        edges.select(F.col(id_col).alias("id"), F.col(parent_col).alias("ancestor_id"))
        .filter(
            F.col("ancestor_id").isNotNull()
            & (F.trim(F.col("ancestor_id").cast("string")) != "")
            & (F.col("ancestor_id") != F.col("id"))
        )
        .withColumn("distance", F.lit(1))
    )
    edge = base.select(F.col("id").alias("e_child"), F.col("ancestor_id").alias("e_parent"))
    closure = base
    frontier = base
    for _ in range(max_iterations):
        nxt = (
            frontier.join(edge, frontier.ancestor_id == edge.e_child)
            .select("id", F.col("e_parent").alias("ancestor_id"), (F.col("distance") + 1).alias("distance"))
            .join(closure.select("id", "ancestor_id"), ["id", "ancestor_id"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        closure = closure.unionByName(nxt)
        frontier = nxt
    return closure
