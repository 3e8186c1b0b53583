"""Connected components: chains, stars, determinism, convergence bound."""

from __future__ import annotations

from cie_spark.operators.canon import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r.node: r.component for r in connected_components(df).collect()}


def test_chain(spark):
    # pathological chain: worst case for naive propagation
    edges = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(12)]
    got = _cc(spark, edges)
    assert set(got.values()) == {"n00"}
    assert len(got) == 13


def test_two_components_and_star(spark):
    edges = [("a", "b"), ("b", "c"), ("x", "y"), ("x", "z"), ("x", "w")]
    got = _cc(spark, edges)
    assert got["a"] == got["b"] == got["c"] == "a"
    assert got["x"] == got["y"] == got["z"] == got["w"] == "w"


def test_deterministic_across_partitionings(spark):
    edges = [("a", "b"), ("c", "b"), ("d", "e")]
    df1 = spark.createDataFrame(edges, "src string, dst string").repartition(1)
    df8 = spark.createDataFrame(edges, "src string, dst string").repartition(8)
    r1 = {r.node: r.component for r in connected_components(df1).collect()}
    r8 = {r.node: r.component for r in connected_components(df8).collect()}
    assert r1 == r8
