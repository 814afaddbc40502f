"""Distributed connected components via iterative min-label
propagation — the clustering step of near-duplicate deduplication
(cluster = transitive closure of the near-dup pair graph, keep the
min-id member per cluster).

Exact, converges in O(graph diameter) rounds; every round is one
shuffle-join on node ids. No driver-side graph state: edges and labels
stay distributed, so the operator scales to edge sets that never fit
one machine. Near-dup graphs have tiny diameter in practice (dup
clusters are cliques or short chains), so 2-4 rounds is typical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components_min_label(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(doc, cluster) for every node in ``edges``; cluster = min
    reachable node id.

    Each round joins labels across the symmetrized edge list, keeps
    the elementwise min, and folds the convergence check into the
    localCheckpoint-ed update (one action per round, no second join
    against the previous labels). ``localCheckpoint`` truncates the
    growing lineage so round N's plan doesn't replay rounds 1..N-1.
    """
    both = edges.select(F.col(src).alias("doc_a"),
                        F.col(dst).alias("doc_b"))
    both = both.union(
        both.select(F.col("doc_b").alias("doc_a"),
                    F.col("doc_a").alias("doc_b"))
    ).cache()
    labels = (
        both.select(F.col("doc_a").alias("doc"))
        .distinct()
        .withColumn("cluster", F.col("doc"))
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            both.join(labels, both.doc_b == labels.doc)
            .groupBy(both.doc_a.alias("doc"))
            .agg(F.min("cluster").alias("nb_cluster"))
        )
        # ONE action per round: the lazy localCheckpoint materializes
        # as a side effect of the full (non-short-circuit) convergence
        # count — an eager checkpoint plus a separate count would pay
        # two job launches per round, which dominates wall-clock on
        # small graphs. The full count visits every partition, so the
        # checkpoint is completely stored before the next round reads
        # it; lineage still truncates at each round.
        updated = (
            labels.withColumnRenamed("cluster", "old")
            .join(neighbor_min, "doc", "left")
            .select(
                "doc", "old",
                F.least(
                    F.col("old"),
                    F.coalesce(F.col("nb_cluster"), F.col("old")),
                ).alias("cluster"),
            )
        ).localCheckpoint(eager=False)
        changed = (
            updated.filter(F.col("cluster") < F.col("old")).count()
        )
        labels = updated.select("doc", "cluster")
        if changed == 0:
            converged = True
            break
    both.unpersist()
    if not converged:
        # Under-convergence means labels that LOOK final but are not
        # the component minimum — silently wrong clusters downstream.
        # Fail loudly instead (VERDICT r3 stretch task); callers on a
        # pathological high-diameter graph raise max_iter consciously.
        raise RuntimeError(
            f"connected components did not converge in {max_iter} rounds"
            " — graph diameter exceeds the iteration budget"
        )
    return labels


MEMBER_SAMPLE_N = 100


def cluster_summary(labels: DataFrame,
                    sample_n: int = MEMBER_SAMPLE_N) -> DataFrame:
    """(cluster_id, cluster_size, members) per connected component.

    ``members`` holds only the ``sample_n`` smallest member ids:
    an unbounded ``collect_list`` turns a boilerplate mega-cluster
    (10⁷ near-identical docs at 100 TB) into one giant row built by
    one task. Ranking first and collecting only rank ≤ N bounds the
    aggregation buffer itself, while ``count(*)`` stays exact over all
    members. The window's hash partitioning on ``cluster`` satisfies
    the groupBy's distribution, so the whole summary is one shuffle.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("cluster").orderBy("doc")
    return (
        labels.withColumn("__rk", F.row_number().over(w))
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            # collect_list skips NULLs → only the sample_n smallest
            # ids ever enter the buffer
            F.sort_array(F.collect_list(
                F.when(F.col("__rk") <= sample_n, F.col("doc"))
            )).cast("string").alias("members"),
        )
        .select(F.col("cluster").alias("cluster_id"),
                "cluster_size", "members")
    )
