"""Near-duplicate cluster resolution (scale extension; no reference twin).

The LSH operators (``operators.dedup``) stop at *pairs*; a training-data
pipeline needs pairs resolved into *clusters* with a kept representative —
this module adds the missing step: connected components over the pair graph
via iterative min-label propagation, then a keep/drop assignment.

Scale design (100 TB): each round is two keyed shuffles (edges ⋈ labels,
then a min-aggregate) — no driver-side graph, no collect. Rounds needed =
graph diameter, and near-dup clusters are short-diameter by construction
(docs in a cluster share most shingles, so they share LSH buckets and the
pair graph is dense). ``max_iters`` bounds the worst case; lineage is
truncated every round with ``localCheckpoint`` (swap for a reliable
``checkpoint`` dir on a real cluster — noted inline). For adversarial
long-chain graphs, the alternating large-star/small-star variant
(Kiveris et al., "Connected Components in MapReduce", SoCC'14) converges in
O(log²) rounds; near-dup workloads don't need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    vertices: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """(id, cluster_id) for every vertex; cluster_id = min id reachable.

    ``pairs`` is an undirected edge list (one row per pair, either
    orientation); ``vertices`` supplies the full id universe so isolated
    docs become singleton clusters. Deterministic: min-label is
    order-insensitive.

    Raises ``RuntimeError`` if propagation hasn't converged after
    ``max_iters`` rounds — returning a half-propagated labeling would
    silently split clusters.
    """
    sym = (
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .unionAll(pairs.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .persist()
    )
    # propagate ONLY over pair-touched vertices: everything else is a
    # singleton by definition and gets unioned back after convergence. At
    # 100 TB this is the difference between corpus-sized and pairs-sized
    # shuffles per round — the vertex universe is orders of magnitude
    # larger than the near-dup pair graph.
    # touched is checkpointed ONCE: it seeds the labels AND drives the
    # final singleton anti-join, and cutting its lineage here lets the edge
    # cache release without re-materializing anything downstream
    touched = sym.select(F.col("src").alias("id")).distinct().localCheckpoint()
    labels = touched.select(
        F.col("id"), F.col("id").alias("label")
    )  # cluster deployments: spark.sparkContext.setCheckpointDir + .checkpoint()
    converged = False
    for _ in range(max_iters):
        nbr = (
            sym.join(labels, sym.src == labels.id)
            .groupBy(F.col("dst").alias("nid"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr, labels.id == nbr.nid, "left")
            .select(
                labels.id.alias("id"),
                F.least(labels.label, F.col("nbr_label")).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        sym.unpersist()
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iters} rounds "
            "(pathological chain graph? raise max_iters)"
        )
    sym.unpersist()  # labels are checkpointed; touched is checkpointed —
    # nothing downstream re-reads the edge frame
    singletons = (
        vertices.select(F.col(id_col).alias("id"))
        .join(touched, "id", "left_anti")
        .select("id", F.col("id").alias("label"))
    )
    return labels.unionByName(singletons).select(
        F.col("id").alias(id_col), F.col("label").alias("cluster_id")
    )


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    jaccard_col: str = "jaccard",
    threshold: float | None = None,
    max_iters: int = 20,
) -> DataFrame:
    """Resolve near-dup pairs into (cluster_id, id, is_representative).

    ``pairs`` is typically ``dedup.minhash_dedup_pairs`` output; pass
    ``threshold`` to keep only pairs with verified Jaccard ≥ threshold
    (thresholding on the rounded ``jaccard`` column keeps engine parity).
    The representative (kept doc) is the min id of each component; every
    doc in ``df`` appears exactly once (singletons keep themselves)."""
    if threshold is not None:
        pairs = pairs.where(F.col(jaccard_col) >= threshold)
    cc = connected_components(pairs, df, id_col=id_col, max_iters=max_iters)
    return cc.select(
        F.col("cluster_id"),
        F.col(id_col),
        (F.col(id_col) == F.col("cluster_id")).alias("is_representative"),
    )
