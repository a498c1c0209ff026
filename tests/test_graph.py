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
