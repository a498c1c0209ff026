"""Graph operators: weighted PageRank over an edge DataFrame.

Scale extension (no counterpart in the reference): rank propagation over a
relationship graph — the standard importance measure for entity graphs
derived from warehouse facts (who-supplies-whom, who-buys-from-whom).

Spark-first iterative shape: ranks live in a (node, pr) DataFrame; every
iteration is one broadcast-or-shuffle join of the edge list against the
current ranks plus a groupBy(dst) re-aggregation — the textbook
edge-partitioned formulation. The edge list shuffles ONCE onto its join
key and stays partitioned (persist) across iterations; only the small
rank table moves. Iterations are a fixed, caller-chosen count, so the
whole lineage stays a finite DAG (no driver-side convergence loop over
unbounded steps; at 100 TB checkpoint every ~10 iterations to cut
lineage depth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    cache: bool = True,
) -> DataFrame:
    """Weighted PageRank with uniform init 1/N:

    pr'(v) = (1-d)/N + d · Σ_{u→v} pr(u) · w(u,v)/outw(u)

    Nodes with no outgoing edges contribute nothing (their mass damps
    away — the oracle mirrors this exactly rather than redistributing).
    Returns (node, pr) for every node appearing as src or dst."""
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
    )
    outw = e.groupBy("src").agg(F.sum("w").alias("outw"))
    # normalized transition edges: partitioned once, reused every iteration
    trans = e.join(outw, "src").select(
        "src", "dst", (F.col("w") / F.col("outw")).alias("p")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if cache:  # caller-owned lifecycle, repo convention
        trans, nodes = trans.persist(), nodes.persist()
    n_nodes = nodes.count()
    ranks = nodes.withColumn("pr", F.lit(1.0 / n_nodes))
    for _ in range(iterations):
        contrib = (
            trans.join(ranks, trans["src"] == ranks["node"])
            .select("dst", (F.col("pr") * F.col("p")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("mass"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))
                ).alias("pr"),
            )
        )
    return ranks


def label_propagation(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    cache: bool = True,
) -> DataFrame:
    """Weighted label-propagation community detection (Raghavan et al.
    2007), synchronized rounds, fully deterministic: labels start as the
    node id; each round every node adopts the label with the LARGEST
    incident edge-weight mass among its neighbours (ties → smallest
    label; isolated nodes keep their label). Integer weights keep the
    argmax exact — no float comparison anywhere.

    Same iterative shape as :func:`pagerank`: the undirected edge list
    shuffles once and stays persisted; each round is one join against the
    node-sized label table, a (node, label) re-aggregation, and a keyed
    row_number argmax. Returns ``(node, community)``.
    """
    from pyspark.sql.window import Window

    w = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    half = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"), w.alias("w"))
    e = (
        half.unionByName(
            half.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
        )
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.sum("w").cast("long").alias("w"))
    )
    if cache:  # reused every round; caller-owned lifecycle
        e = e.persist()
    # node set from the RAW edge list (before the u != v drop): a node whose
    # only incident edges are self-loops still exists — it keeps its own
    # label as a singleton community instead of vanishing from the output.
    nodes = (
        half.select(F.col("u").alias("node"))
        .unionByName(half.select(F.col("v").alias("node")))
        .distinct()
    )
    if cache:
        nodes = nodes.persist()
    labels = nodes.select("node", F.col("node").alias("lab"))
    rank_w = Window.partitionBy("u").orderBy(F.col("sw").desc(), F.col("lab"))
    for _ in range(iterations):
        mass = (
            e.join(labels, e["v"] == labels["node"])
            .groupBy("u", "lab")
            .agg(F.sum("w").cast("long").alias("sw"))
        )
        vote = (
            mass.withColumn("rn", F.row_number().over(rank_w))
            .where(F.col("rn") == 1)
            .select(F.col("u").alias("node"), F.col("lab").alias("vlab"))
        )
        labels = nodes.join(vote, "node", "left").select(
            "node", F.coalesce("vlab", F.col("node")).alias("lab")
        )
    return labels.select("node", F.col("lab").alias("community"))


def triangle_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Triangle count + global clustering coefficient — the cohesion
    metrics next to :func:`pagerank` (importance) and
    :func:`label_propagation` (communities): triangles via the canonical
    ordered edge-join (every undirected edge stored once as u < v, each
    triangle a < b < c counted exactly once), wedges from the degree
    frame as ``Σ deg·(deg−1)/2``, clustering = 3·triangles / wedges.
    All exact integers; the coefficient is one shared expression.
    Returns one row ``(n_nodes, n_edges, n_triangles, n_wedges,
    clustering)``.

    Scale: two keyed self-joins of the deduplicated edge list — the
    standard distributed triangle enumeration; at 100 TB pre-partition
    the edge list by its join key and cap skew with degree-ordered
    orientation (already implicit in the u < v canonicalization)."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionByName(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    tri = (
        e.alias("ab")
        .join(e.alias("bc"), F.col("ab.v") == F.col("bc.u"))
        .join(
            e.alias("ac"),
            (F.col("ab.u") == F.col("ac.u")) & (F.col("bc.v") == F.col("ac.v")),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    base = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        (F.sum("d") / 2).cast("long").alias("n_edges"),
        F.sum(F.expr("d * (d - 1) div 2")).cast("long").alias("n_wedges"),
    )
    return (
        base.crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            "n_wedges",
            F.expr(
                "case when n_wedges > 0 then "
                "round(3e0 * n_triangles / n_wedges, 4) end"
            ).alias("clustering"),
        )
    )
