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


def test_local_canon_agrees_with_distributed(spark):
    """canonicalize_rows_local (driver union-find, used by the pipeline's
    local-linking fast path) must be bit-identical to canonicalize_linkmap
    (distributed connected-components) — incl. alias chains that span
    several surfaces, singleton ids, and representative choice (lexicographic
    min entity_id per component)."""
    from cie_spark.operators.canon import (
        canonicalize_linkmap,
        canonicalize_rows_local,
    )

    rows = [
        # chain: e3 ~ e2 (share n1), e2 ~ e1 (share n2) -> all map to e1
        ("S a", "n1", "ent:e3", "dict"),
        ("S b", "n1", "ent:e2", "fuzzy"),
        ("S c", "n2", "ent:e2", "dict"),
        ("S d", "n2", "ent:e1", "stub"),
        # separate component: z2 ~ z9 -> z2
        ("S e", "n3", "ent:z9", "dict"),
        ("S f", "n3", "ent:z2", "dict"),
        # singletons keep their id
        ("S g", "n4", "ent:solo", "stub"),
        ("S h", "n5", "ent:e1", "dict"),
    ]
    local = sorted(canonicalize_rows_local(rows))
    df = spark.createDataFrame(
        rows, "surface string, surface_norm string, "
        "entity_id string, link_tier string",
    )
    dist = sorted(
        (r.surface, r.surface_norm, r.entity_id, r.link_tier)
        for r in canonicalize_linkmap(df).collect()
    )
    assert local == dist
    by_surface = {s: e for s, _n, e, _t in local}
    assert by_surface["S a"] == by_surface["S d"] == "ent:e1"
    assert by_surface["S e"] == "ent:z2"
    assert by_surface["S g"] == "ent:solo"


def test_deterministic_across_partitionings(spark):
    edges = [("a", "b"), ("c", "b"), ("d", "e")]
    df1 = spark.createDataFrame(edges, "src string, dst string").repartition(1)
    df8 = spark.createDataFrame(edges, "src string, dst string").repartition(8)
    r1 = {r.node: r.component for r in connected_components(df1).collect()}
    r8 = {r.node: r.component for r in connected_components(df8).collect()}
    assert r1 == r8
