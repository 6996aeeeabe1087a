"""Distributed connected components over a pair/edge relation.

The training-data dedup flow needs "near-dup PAIRS -> dup GROUPS ->
one canonical doc per group": transitive closure over the LSH/SimHash
pair relations (llm/dedup.py). The reference has no graph operator —
its closest analogue is the driver-side union-find used for attribute
clusters (python/sparker/attribute_clustering.py:117-135), which is
fine for #attributes-sized graphs but not for billions of document
nodes. This is the distributed counterpart.

Algorithm: min-label propagation with pointer jumping.

* propagate:   c(u) <- min(c(u), min_{v in N(u)} c(v))
* pointer jump: c(u) <- min(c(u), c(c(u)))

Plain propagation alone needs O(diameter) rounds (fatal on chain-
shaped components); the jump step halves label-chain depth each round,
giving O(log diameter) rounds total — the same reason the classic
MapReduce formulations (large-star/small-star, Kiveris et al. 2014)
aim at logarithmic round counts. Every round is two shuffles on node
keys (a groupBy-min and a self-join) plus an eager ``localCheckpoint``
to truncate lineage — without truncation an iterative DataFrame plan
grows per round and re-executes from the source. Convergence is
detected with a single scalar aggregate: labels are monotone
non-increasing, so the label sum strictly decreases iff any label
changed — no per-row diff join.

Determinism: the result is exactly "component = min node id reachable",
independent of partitioning or iteration interleaving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConnectedComponents:
    @staticmethod
    def run(
        edges: DataFrame,
        src: str = "p1",
        dst: str = "p2",
        nodes: DataFrame | None = None,
        max_iter: int = 30,
    ) -> DataFrame:
        """Edges (src, dst) -> (node, component), component = min
        reachable node id.

        ``nodes``: optional single-column relation of node ids to
        include even when isolated (each becomes its own singleton
        component); by default only endpoint nodes appear.
        ``max_iter`` bounds rounds defensively; with pointer jumping
        even a path of 2^30 nodes converges long before 30 rounds.
        """
        e = (
            edges.select(
                F.col(src).cast("long").alias("u"),
                F.col(dst).cast("long").alias("v"),
            )
            .where(F.col("u") != F.col("v"))
        )
        und = (
            e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .distinct()
            .cache()
        )
        node_rel = und.select("u")
        if nodes is not None:
            node_rel = node_rel.unionByName(
                nodes.select(F.col(nodes.columns[0]).cast("long").alias("u"))
            )
        # seed labels with the direct-neighborhood min (one aggregation)
        # instead of identity — saves a full propagate+jump round on
        # every input, since round 1 would otherwise just compute this
        nbr_min0 = und.groupBy("u").agg(F.min("v").alias("nv"))
        labels = (
            node_rel.distinct()
            .join(nbr_min0, "u", "left")
            .select("u", F.least("u", F.coalesce("nv", "u")).alias("c"))
            .localCheckpoint(eager=True)
        )
        prev_sum = labels.agg(F.sum("c")).first()[0]
        for _ in range(max_iter):
            nbr = (
                und.join(
                    labels.select(F.col("u").alias("v"), F.col("c").alias("nc")),
                    "v",
                )
                .groupBy("u")
                .agg(F.min("nc").alias("nc"))
            )
            l1 = labels.join(nbr, "u", "left").select(
                "u", F.least("c", F.coalesce("nc", "c")).alias("c")
            )
            # pointer jump: label(u) -> label(label(u)). label(u) is
            # always itself a node id, so the self-join is total except
            # where u already carries its component min.
            jump = l1.select(F.col("u").alias("c"), F.col("c").alias("cc"))
            l2 = l1.join(jump, "c", "left").select(
                "u", F.least("c", F.coalesce("cc", "c")).alias("c")
            )
            new_labels = l2.localCheckpoint(eager=True)
            new_sum = new_labels.agg(F.sum("c")).first()[0]
            labels = new_labels
            if new_sum == prev_sum:
                break
            prev_sum = new_sum
        und.unpersist()
        return labels.select(
            F.col("u").alias("node"), F.col("c").alias("component")
        )

    @staticmethod
    def canonical_groups(
        edges: DataFrame,
        src: str = "p1",
        dst: str = "p2",
        nodes: DataFrame | None = None,
    ) -> DataFrame:
        """(node, component, cluster_size, is_canonical): the keep-one-
        per-dup-group projection — canonical = the component's min id."""
        cc = ConnectedComponents.run(edges, src, dst, nodes)
        sizes = cc.groupBy("component").agg(
            F.count("*").cast("long").alias("cluster_size")
        )
        return cc.join(sizes, "component").select(
            "node",
            "component",
            "cluster_size",
            (F.col("node") == F.col("component")).alias("is_canonical"),
        )
