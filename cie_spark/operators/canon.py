"""Canonicalization: connected components over alias-equivalence edges.

Where the reference dedups + canonicalizes by deterministic IDs and explicit
alias resolution (ids.go:31-63, resolver.go:198-229), surfaces linked by the
fuzzy tier can form alias *chains* (A~B, B~C). We close them with connected
components so every member maps to one canonical entity ID.

Implementation: min-label propagation with POINTER DOUBLING — each round
first propagates the minimum component label across edges, then contracts
pointer chains with comp := comp(comp) (path halving, the core step of the
Kiveris et al. SOCC'14 MapReduce-CC family). Label propagation alone needs
O(graph diameter) rounds; the doubling step halves every chain each round,
giving O(log diameter) convergence. Each round `localCheckpoint()`s to
truncate lineage — the same checkpointed-iteration discipline the reference
applies to its bounded BFS (trace.go:291-354). Canonical representative =
lexicographic min entity_id in the component: partition-order independent,
hence deterministic at any cluster size.

If max_iter is exhausted before convergence (pathological chain far longer
than 2^max_iter — not reachable with real alias data), the function raises
rather than silently returning non-canonical representatives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, max_iter: int = 25
) -> DataFrame:
    """edges(src,dst) -> (node, component) with component = min node id.

    Node IDs are strings; comparison is lexicographic. Raises RuntimeError
    if not converged within max_iter rounds (with pointer doubling this
    bounds component diameter at 2^max_iter — unreachable in practice).
    """
    # undirected: keep each edge in canonical (min,max) orientation
    e = (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint()
    )

    # parent pointers start as self
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .dropDuplicates(["node"])
    )
    parent = nodes.select("node", F.col("node").alias("comp")).localCheckpoint()

    for _ in range(max_iter):
        # 1. propagate: comp(node) = min(comp(node), min over neighbors comp)
        msgs = (
            e.join(parent.withColumnRenamed("node", "src"), on="src")
            .select(F.col("dst").alias("node"), "comp")
            .unionByName(
                e.join(parent.withColumnRenamed("node", "dst"), on="dst").select(
                    F.col("src").alias("node"), "comp"
                )
            )
        )
        propagated = (
            parent.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        # 2. pointer doubling (path halving): comp := comp(comp) — one keyed
        # self-join; chains shrink geometrically so total rounds are
        # O(log diameter), not O(diameter)
        lut = propagated.select(
            F.col("node").alias("comp"), F.col("comp").alias("comp2")
        )
        new_parent = (
            propagated.join(lut, on="comp", how="left")
            .select(
                "node", F.coalesce(F.least("comp2", "comp"), F.col("comp")).alias("comp")
            )
            .localCheckpoint()
        )
        changed = (
            new_parent.alias("n")
            .join(parent.alias("p"), on="node")
            .filter(F.col("n.comp") != F.col("p.comp"))
            .limit(1)
            .count()
        )
        parent = new_parent
        if changed == 0:
            return parent.select("node", F.col("comp").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(component diameter > 2^max_iter?)"
    )


def canonicalize_rows_local(
    rows: list[tuple[str, str, str, str]],
) -> list[tuple[str, str, str, str]]:
    """Driver-local rendering of canonicalize_linkmap over collected
    (surface, surface_norm, entity_id, link_tier) rows: union-find over the
    ids-sharing-a-surface_norm equivalence, representative = lexicographic
    min entity_id per component — bit-identical to the distributed
    connected-components rendering (pinned by
    tests/test_canon.py::test_local_canon_agrees_with_distributed).

    Exists because the distributed path costs 2+ driver job rounds of pure
    per-leg serial time (the isEmpty probe alone profiled at 1.9 s) while
    the link map on the local linking path is a <=64k-row Python list the
    driver already holds."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    by_norm: dict[str, str] = {}
    for _s, n, eid, _t in rows:
        if eid not in parent:
            parent[eid] = eid
        first = by_norm.setdefault(n, eid)
        if first != eid:
            ra, rb = find(first), find(eid)
            if ra != rb:
                # union by min id so the final find() is the representative
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
    return [(s, n, find(eid), t) for s, n, eid, t in rows]


def canonicalize_linkmap(linkmap: DataFrame) -> DataFrame:
    """Close alias chains in a (surface_norm, entity_id) link map.

    Surfaces sharing an entity_id witness an equivalence between the ids
    they map to; after components, every surface maps to the component
    representative. Input/output shape: (surface, surface_norm, entity_id,
    link_tier) -> same, with entity_id replaced by the canonical one.
    """
    # edges between entity ids that share a normalized surface
    ids_per_surface = linkmap.select("surface_norm", "entity_id")
    pairs = (
        ids_per_surface.alias("a")
        .join(ids_per_surface.alias("b"), on="surface_norm")
        .select(F.col("a.entity_id").alias("src"), F.col("b.entity_id").alias("dst"))
        .filter(F.col("src") < F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    # common case: every surface maps to exactly one id -> no chains to
    # close; skip the iterative loop (its driver-side rounds are fixed
    # serial cost that would cap scaling efficiency)
    if pairs.isEmpty():
        return linkmap
    comp = connected_components(pairs)
    return (
        linkmap.join(
            F.broadcast(comp.withColumnRenamed("node", "entity_id")),
            on="entity_id",
            how="left",
        )
        .withColumn("entity_id", F.coalesce("component", "entity_id"))
        .drop("component")
    )
