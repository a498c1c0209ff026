"""PageRank operator units (operators/graph.py)."""

import pytest

from azure_medicine_data_engineering_spark.operators.graph import pagerank


def _pr(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    return {r.node: r.pr for r in pagerank(df, weight="w", **kw).collect()}


def test_symmetric_cycle_stays_uniform(spark):
    # 1⇄2 with equal weights: uniform ranks are the fixed point
    out = _pr(spark, [(1, 2, 1.0), (2, 1, 1.0)], iterations=3)
    assert out[1] == pytest.approx(0.5)
    assert out[2] == pytest.approx(0.5)


def test_sink_node_accumulates(spark):
    # 1→3, 2→3: after one iteration node 3 holds (1-d)/3 + d*(2/3)
    out = _pr(spark, [(1, 3, 1.0), (2, 3, 1.0)], iterations=1)
    d, n = 0.85, 3
    assert out[3] == pytest.approx((1 - d) / n + d * (2 / n))
    assert out[1] == pytest.approx((1 - d) / n)  # nothing points at 1


def test_weights_split_proportionally(spark):
    # 1 sends 3/4 of its mass to 2 and 1/4 to 3
    out = _pr(spark, [(1, 2, 3.0), (1, 3, 1.0)], iterations=1)
    d, n = 0.85, 3
    assert out[2] == pytest.approx((1 - d) / n + d * (1 / n) * 0.75)
    assert out[3] == pytest.approx((1 - d) / n + d * (1 / n) * 0.25)


def test_mass_is_bounded_and_positive(spark):
    edges = [(i, (i * 7) % 10, float(1 + i % 3)) for i in range(10)]
    out = _pr(spark, edges, iterations=4)
    assert all(0 < v < 1 for v in out.values())
    assert sum(out.values()) <= 1.0 + 1e-9  # dangling mass damps away


class TestLabelPropagation:
    def test_two_planted_communities(self, spark):
        from azure_medicine_data_engineering_spark.operators.graph import (
            label_propagation,
        )

        # two dense triangles {1,2,3} and {10,11,12} joined by one weak edge
        edges = [
            (1, 2, 5), (2, 3, 5), (1, 3, 5),
            (10, 11, 5), (11, 12, 5), (10, 12, 5),
            (3, 10, 1),
        ]
        df = spark.createDataFrame(edges, ["src", "dst", "w"])
        out = {r["node"]: r["community"] for r in
               label_propagation(df, iterations=3, weight="w").collect()}
        assert out[1] == out[2] == out[3]
        assert out[10] == out[11] == out[12]
        assert out[1] != out[10]

    def test_isolated_pairs_keep_min_label(self, spark):
        from azure_medicine_data_engineering_spark.operators.graph import (
            label_propagation,
        )

        df = spark.createDataFrame([(5, 9, 1)], ["src", "dst", "w"])
        out = {r["node"]: r["community"] for r in
               label_propagation(df, iterations=2, weight="w").collect()}
        # after round 1 they swap labels; round 2 swaps back deterministically
        assert out == {5: 5, 9: 9}


def test_triangle_stats_known_graphs(spark):
    from azure_medicine_data_engineering_spark.operators.graph import (
        triangle_stats,
    )

    # K4: 4 triangles, 12 wedges, clustering = 1
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    df = spark.createDataFrame(k4, "src long, dst long")
    r = triangle_stats(df).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"], r["n_wedges"]) == (4, 6, 4, 12)
    assert r["clustering"] == 1.0

    # path 0-1-2: no triangle, 1 wedge, clustering 0; dup/reversed/self
    # edges must not change anything
    path = spark.createDataFrame(
        [(0, 1), (1, 2), (1, 0), (2, 2), (0, 1)], "src long, dst long"
    )
    r2 = triangle_stats(path).collect()[0]
    assert (r2["n_triangles"], r2["n_wedges"], r2["clustering"]) == (0, 1, 0.0)
