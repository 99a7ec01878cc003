"""Connected components for dedup-cluster assignment.

After pair generation (MinHash-LSH / SimHash), deduplication needs the
transitive closure: if A~B and B~C, then {A,B,C} form one cluster with
one kept representative. This is iterative min-label propagation:

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated to fixpoint. Each iteration is one shuffle (join labels to
the symmetrized edge list + groupBy-min); rounds needed = graph
diameter, and near-dup clusters are small and dense, so 3-5 rounds
close real corpora. This is the simple variant of the map-reduce CC
algorithms in the literature (large-star/small-star contraction, which
converges in O(log n) rounds on adversarial graphs, reduces to the
same per-round join shape).

Scale notes: the labels DataFrame is ``localCheckpoint``-ed every
round — iterative plans otherwise grow the lineage exponentially and
re-execute every prior round at each action. Convergence is detected
with a count of changed labels (one action per round, the canonical
fixpoint test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in the edge list; component =
    the minimum node id reachable from it.

    ``edges`` is an undirected pair list (each pair once, either
    order). Deterministic: component ids are stable min-ids, not
    partition-dependent.
    """
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    sym = sym.distinct().localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # Candidate label for each node: the min label among neighbors.
        neighbor_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nmin", F.col("label"))
                ).alias("label"),
                (F.col("nmin") < F.col("label")).alias("_changed"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))
