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

from cam_etl_spark.io import unpersist_checkpoint


def resolve_roots(
    edges: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent_id",
    max_iterations: int = 30,
) -> DataFrame:
    """For each node, find its root ancestor and depth (root nodes have
    parent NULL / self / empty). Returns (id, root_id, depth).

    True pointer doubling: the id→ancestor map is joined with ITSELF, so
    every surviving pointer advances 2^i parent steps by iteration i —
    ceil(log2(max_depth)) rounds instead of max_depth single-step rounds
    (guide §2.4: each round is an eagerly-checkpointed self-join, so
    halving the round count halves jobs, barriers, and driver overhead).
    A row whose ancestor advanced this round is flagged in the SAME scan
    (``stepped`` = the looked-up ancestor was itself a non-root), so the
    fixpoint test is a filter over the checkpointed result — the previous
    implementation paid an extra join against the prior state per round.
    Deterministic; cycles are cut by max_iterations.
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
    state = nodes.select(
        "id",
        F.coalesce("parent_id", "id").alias("anc"),
        F.when(F.col("parent_id").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("depth"),
    )
    # Invariant: anc is the ancestor exactly ``depth`` parent steps up from
    # id (or id itself for roots, depth 0). Doubling step: look the current
    # ancestor up in the SAME map — new anc = anc's ancestor, new depth =
    # depth + anc's depth. Roots map to themselves with depth 0, so settled
    # rows pass through unchanged and the inner join never drops rows.
    for _ in range(max_iterations):
        hop = state.select(
            F.col("id").alias("h_id"),
            F.col("anc").alias("h_anc"),
            F.col("depth").alias("h_depth"),
        )
        prev = state
        state = (
            state.join(hop, state.anc == hop.h_id)
            .select(
                "id",
                F.col("h_anc").alias("anc"),
                (F.col("depth") + F.col("h_depth")).alias("depth"),
                (F.col("h_depth") > 0).alias("stepped"),
            )
            .localCheckpoint(eager=False)
        )
        # One job does double duty: count() computes EVERY partition, which
        # materializes the lazy checkpoint (truncating lineage) AND yields
        # the fixpoint signal — vs. eager-checkpoint + isEmpty, two jobs.
        done = state.filter("stepped").count() == 0
        # the new checkpoint is materialized now — the previous round's
        # blocks are dead (first round: prev is no checkpoint, no-op)
        unpersist_checkpoint(prev)
        if done:
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
