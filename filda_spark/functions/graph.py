"""Distributed connected components by min-label propagation — the
Pregel-style loop shared by the fire-perimeter polygonizer
(`pipeline.perimeters`) and near-dup group assembly
(`training.dup_components`), without a graph library.

Converges to the unique fixpoint (every node's label = min node id
reachable from it). Each round combines one hop of neighbor-min
propagation with POINTER DOUBLING (label <- label-of-label, the
path-halving step of union-find): the neighbor hop moves mins one edge,
the doubling step shortcuts label chains exponentially, so convergence is
O(log diameter) rounds rather than O(diameter) — the difference between
~8 and ~220 rounds on a long lattice component (round-4 finding: DBSCAN
over a dense point field produced exactly that chain and blew the
iteration cap under pure propagation). Per round: one shuffle join
(edges -> labels), one partial-aggregated groupBy, and one labels⋈labels
self-join for the doubling; `localCheckpoint` truncates the iterative
lineage so the physical plan stays constant-size across rounds, and the
driver only ever sees a scalar changed-count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def min_label_components(
    labels: DataFrame, edges: DataFrame, node_col: str, max_iters: int
) -> DataFrame:
    """Propagate min labels to convergence.

    ``labels``: (node_col, component) seeded with component = node id.
    ``edges``: (src, dst), already symmetrized and restricted to real nodes.
    Raises RuntimeError if the fixpoint is not reached within ``max_iters``
    rounds — a silent fall-through would report one connected region as
    several, with under-counted boundaries (review finding, round 3)."""
    for _ in range(max_iters):
        nbr = (
            edges.join(labels, edges.dst == labels[node_col])
            .groupBy("src")
            .agg(F.min("component").alias("_nbr"))
        )
        stepped = labels.join(nbr, labels[node_col] == nbr.src, "left").select(
            node_col,
            F.col("component").alias("_prev"),
            F.least(
                F.col("component"), F.coalesce("_nbr", F.col("component"))
            ).alias("component"),
        )
        # the stepped frame feeds BOTH sides of the doubling join; persist
        # so the edges-join + neighbor-min work runs once, not per consumer
        stepped = stepped.persist()
        # pointer doubling: follow each node's label to THAT node's label
        # (every component value is itself a node id, so the lookup is a
        # self-join); labels only decrease, staying within the component
        parent = stepped.select(
            F.col(node_col).alias("_pn"), F.col("component").alias("_pc")
        )
        # carry the previous label through the update so convergence is a
        # filter over the just-materialized frame, not another shuffle join
        new = (
            stepped.join(parent, stepped.component == parent._pn, "left")
            .select(
                node_col,
                "_prev",
                F.least(
                    F.col("component"), F.coalesce("_pc", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = new.filter(F.col("component") != F.col("_prev")).count()
        stepped.unpersist()
        labels = new.select(node_col, "component")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"min-label connected components did not converge within {max_iters} "
        f"rounds (component graph diameter exceeds the bound); raise the "
        f"iteration cap for graphs with very long chains"
    )
