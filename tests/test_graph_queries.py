"""Query-tool layer over triple tables (Q1..Q28 analogs, SURVEY §2.B)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cie_spark.operators.extract import extract_mentions
from cie_spark.operators.graph_queries import GraphQueries
from cie_spark.operators.link import link_mentions
from cie_spark.operators.triples import all_triples
from cie_spark.sources.gen import generate_transcripts


@pytest.fixture(scope="module")
def gq(spark):
    t = generate_transcripts(spark, n_convs=15, avg_turns=12, seed=42).cache()
    linked = link_mentions(spark, extract_mentions(t))
    trips = all_triples(linked, t).cache()
    ents = (
        linked.groupBy("entity_id")
        .agg(F.min("kind").alias("kind"), F.collect_set("surface").alias("surfaces"))
        .select(
            "entity_id", "kind",
            F.regexp_replace("entity_id", "^(ent:|tool:)", "").alias("canonical_name"),
            "surfaces",
        )
        .cache()
    )
    return GraphQueries(trips, ents, t)


def test_index_status(gq):
    rows = {r.pred: r.n_edges for r in gq.index_status().collect()}
    assert set(rows) == {"calls", "contains", "mentioned_with"}
    assert all(v > 0 for v in rows.values())


def test_find_callers_and_callees(gq):
    tools = gq.list_tools().collect()
    assert tools
    top_tool = tools[0].tool_id
    callers = gq.find_callers(top_tool).collect()
    assert callers and all(r.subj.startswith("agent:") for r in callers)
    agent = callers[0].subj
    callees = gq.find_callees(agent).collect()
    assert any(r.obj == top_tool for r in callees)
    cg = gq.call_graph(agent).collect()
    assert all(r.direction == "callee" for r in cg)  # agents are only callers


def test_find_entity_by_alias(gq):
    got = gq.find_entity("postgresql").collect()
    assert len(got) == 1
    assert got[0].entity_id == "ent:postgresql"


def test_search_and_grep_and_absence(gq):
    hits = gq.search_text("calling tool", literal=True, limit=10).collect()
    assert hits
    grep = gq.grep(["discussed", "session start"], limit=50).collect()
    assert grep
    va = {r.pattern: (r.n_violations, r.passed) for r in gq.verify_absence(["xyzzy-not-present", "discussed"]).collect()}
    assert va["xyzzy-not-present"] == (0, True)
    assert va["discussed"][0] > 0 and va["discussed"][1] is False


def test_top_entities_per_conv_window(gq):
    rows = gq.top_entities_per_conv(n=3).collect()
    assert rows
    per_conv: dict[str, list[int]] = {}
    for r in rows:
        per_conv.setdefault(r.conv_id, []).append(r.rank)
    for ranks in per_conv.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3


def test_semantic_search_keyword_boost(gq):
    got = gq.semantic_search("postgresql database", k=5).collect()
    assert got
    # the keyword-boosted exact-name entity should rank first
    assert got[0].canonical_name == "postgresql"


def test_semantic_search_post_filters_and_fallback(gq):
    # min_similarity post-filter: every surviving row clears the floor
    strict = gq.semantic_search(
        "postgresql database", k=10, min_similarity=0.05, exclude_stubs=True
    ).collect()
    assert all(r.sim >= 0.05 for r in strict)
    assert all(not r.entity_id.startswith("ent:") or len(r.entity_id) != 20
               or r.canonical_name for r in strict)
    # name_filter regex restricts the result set
    filt = gq.semantic_search(
        "postgresql database", k=10, name_filter="^postg"
    ).collect()
    assert filt and all(r.canonical_name.startswith("postg") for r in filt)
    # keyword fallback (no embedding service): pure term-hit ranking
    fb = gq.semantic_search(
        "postgresql database", k=5, use_embeddings=False
    ).collect()
    assert fb and fb[0].canonical_name == "postgresql"
    assert all(r.score > 0 for r in fb)


def test_find_callers_indirect_bfs(gq, spark):
    """3-hop chain fixture: agent2 never calls tool 'alpha' but shares tool
    'beta' with agent1 (who does) -> agent2 is an indirect caller at depth 3."""
    rows = [
        ("agent:a1", "calls", "tool:alpha", "c1", 0, None, 1),
        ("agent:a1", "calls", "tool:beta", "c1", 1, None, 1),
        ("agent:a2", "calls", "tool:beta", "c2", 0, None, 1),
        ("agent:a3", "calls", "tool:gamma", "c3", 0, None, 1),  # disconnected
    ]
    trips = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, conv_id string, "
        "turn_idx int, ts timestamp, weight long",
    )
    g = GraphQueries(trips)
    got = {r.subj: (r.n_calls, r.indirect)
           for r in g.find_callers("tool:alpha", include_indirect=True).collect()}
    assert got["agent:a1"] == (1, False)  # direct
    assert got["agent:a2"] == (0, True)   # 3 hops: alpha<-a1<-beta<-a2
    assert "agent:a3" not in got          # unreachable within depth 3
    assert "tool:beta" not in got         # depth-2 node is a tool, not a caller
    # depth map sanity via the generic BFS
    reach = {
        r.node: r.depth
        for r in g.bfs_reachable(
            trips.select("subj", "obj"), "tool:alpha", max_depth=3
        ).collect()
    }
    assert reach["agent:a1"] == 1 and reach["tool:beta"] == 2 and reach["agent:a2"] == 3


def test_get_code_exact_then_partial(gq, spark):
    # exact match exists -> only exact rows, truncated at max_chars
    got = gq.get_code("PostgreSQL", max_chars=10, limit=5).collect()
    assert got and all(r.match_kind == "exact" for r in got)
    assert all(len(r.code_text) <= 10 for r in got)
    assert any(r.truncated for r in got)
    # no exact match -> partial fallback ('postgre' is a substring of
    # 'postgresql' but not a canonical name)
    part = gq.get_code("postgre", max_chars=100, limit=5).collect()
    assert part and all(r.match_kind == "partial" for r in part)
    # no match at all -> empty
    assert gq.get_code("zzz-no-such-entity").collect() == []


def test_grep_context_lines(gq):
    rows = gq.grep_context("discussed").collect()
    assert rows
    for r in rows:
        assert "discussed" in r.text
        # context columns exist; first turn of a conv has no prev
        if r.turn_idx > 0:
            assert r.prev_text is not None


def test_trace_path_bfs(gq):
    # connected entities within one conversation: find any mentioned_with
    # edge and trace it (depth 1), then a 2-hop target via a shared neighbor
    edge = gq.triples.filter(F.col("pred") == "mentioned_with").first()
    paths = gq.trace_path(edge.subj, edge.obj, max_depth=3)
    assert paths and paths[0][0] == edge.subj and paths[0][-1] == edge.obj
    assert gq.trace_path(edge.subj, "ent:does-not-exist", max_depth=2) is None


def test_history_and_introduction_and_blame(gq, spark):
    intro = gq.find_introduction().collect()
    assert intro and all(r.first_ts is not None for r in intro)
    ent = intro[0].entity_id
    hist = gq.entity_history(ent).collect()
    assert hist
    conv = gq.triples.first().conv_id
    blame = gq.blame(conv).collect()
    assert abs(sum(r.share for r in blame) - 1.0) < 0.01


def test_find_callees_dispatch_fanout(spark):
    """Q7 dispatch: conv c1 (agent a1) mentions entity e1; conv c2 also
    mentions e1 and its agent calls tool:zeta, which a1 never calls — the
    dispatch tier must surface zeta (flagged), the direct join cannot."""
    rows = [
        ("agent:c1", "calls", "tool:alpha", "c1", 0, None, 1),
        ("conv:c1", "contains", "ent:e1", "c1", 1, None, 1),
        ("conv:c2", "contains", "ent:e1", "c2", 0, None, 1),
        ("agent:c2", "calls", "tool:zeta", "c2", 1, None, 1),
        # unrelated conversation: shares no entity with c1
        ("conv:c3", "contains", "ent:e9", "c3", 0, None, 1),
        ("agent:c3", "calls", "tool:omega", "c3", 1, None, 1),
    ]
    trips = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, conv_id string, "
        "turn_idx int, ts timestamp, weight long",
    )
    g = GraphQueries(trips)
    direct_only = {r.obj for r in g.find_callees("agent:c1").collect()}
    assert direct_only == {"tool:alpha"}
    got = {
        r.obj: r.dispatch
        for r in g.find_callees("agent:c1", include_dispatch=True).collect()
    }
    assert got == {"tool:alpha": False, "tool:zeta": True}
    assert "tool:omega" not in got  # no shared entity -> no dispatch path


def test_trace_path_waypoints_and_entry_autodetect(spark):
    """Parity extras (trace.go:642-694, 57-354): a waypoint forces a longer
    route than the direct shortest path; src=None auto-detects call-graph
    roots; no-path failures report the deepest partial path explored."""
    trips = spark.createDataFrame(
        [
            ("a", "calls", "b", "c1", 1),
            ("b", "calls", "c", "c1", 2),
            ("a", "calls", "c", "c1", 3),
            ("x", "calls", "y", "c2", 1),
        ],
        "subj string, pred string, obj string, conv_id string, turn_idx int",
    )
    g = GraphQueries(trips)
    # direct shortest path is one hop
    assert g.trace_path("a", "c", max_depth=3) == [["a", "c"]]
    # the waypoint forces the two-hop route through b
    assert g.trace_path("a", "c", waypoints=["b"], max_depth=3) == [
        ["a", "b", "c"]
    ]
    # auto entry-point: roots (never an object) are {a, x}; 'a' reaches c
    assert g.trace_path(None, "c", max_depth=3) == [["a", "c"]]
    # no-path: diagnostics carry the deepest frontier representative
    diag = g.trace_path("a", "zzz", max_depth=4, diagnostics=True)
    assert diag["paths"] == []
    assert diag["max_depth_reached"] >= 1
    assert diag["deepest_partial"] is not None
    assert diag["deepest_partial"][0] == "a"
    # waypoint segment failure names the failing segment and the prefix
    d2 = g.trace_path("a", "zzz", waypoints=["b"], max_depth=3, diagnostics=True)
    assert d2["paths"] == [] and d2["failed_segment"] == ["b", "zzz"]
    assert d2["prefix"] == ["a", "b"]


def test_semantic_search_stored_vs_computed_same_result(spark):
    """semantic_search over a stored `embedding` column returns the same
    ranking as the compute-on-query fallback (the pipeline materializes the
    same vectors), r3 verdict "what's wrong" #1."""
    import pandas as pd

    from cie_spark.functions import mock_embedding_matrix

    names = [f"widget{i}" for i in range(20)] + ["postgres database"]
    vecs = mock_embedding_matrix(pd.Series(names))
    rows = [
        (f"ent:{n.replace(' ', '-')}", n, [float(x) for x in vecs[i]])
        for i, n in enumerate(names)
    ]
    ents = spark.createDataFrame(
        rows, "entity_id string, canonical_name string, embedding array<float>"
    )
    stored = GraphQueries(None, ents).semantic_search("postgres database", k=3)
    computed = GraphQueries(None, ents.drop("embedding")).semantic_search(
        "postgres database", k=3
    )
    a = [(r.entity_id, r.sim, r.score) for r in stored.collect()]
    b = [(r.entity_id, r.sim, r.score) for r in computed.collect()]
    assert a == b
    assert a[0][0] == "ent:postgres-database"


def test_grep_limit_deterministic_across_partitioning(gq):
    """grep's limit is ordered (r3 verdict minor #4): the same rows come
    back regardless of the input's partitioning."""
    a = [(r.conv_id, r.turn_idx) for r in gq.grep(["discussed"], limit=5).collect()]
    g2 = GraphQueries(gq.triples, gq.entities, gq.transcripts.repartition(7))
    b = [(r.conv_id, r.turn_idx) for r in g2.grep(["discussed"], limit=5).collect()]
    assert a == b and len(a) == 5


def test_semantic_search_filters_push_before_topk(spark):
    """Filter-aware search (r4 verdict wrong #3): when the stub filter kills
    the ENTIRE naive top-(k*over_fetch), the engine must still return k
    matching rows — unlike the reference's HNSW, a scan filters during
    search, so over-fetch starvation cannot occur."""
    import pandas as pd

    from cie_spark.functions import mock_embedding_matrix

    qv = [float(x) for x in mock_embedding_matrix(pd.Series(["target query"]))[0]]
    # 50 stub-id entities with PERFECT similarity (stored embedding == the
    # query vector) occupy the whole naive top-40…
    rows = [(f"ent:{i:016x}", f"{i:016x}", qv) for i in range(50)]
    # …and 12 real entities sit strictly below them (positive, lower sim)
    lower = [x * 0.5 for x in qv]
    lower[0] += 0.8  # tilt so sim < 1 but > 0
    rows += [(f"ent:real{i:02d}", f"real{i:02d}", lower) for i in range(12)]
    ents = spark.createDataFrame(
        rows, "entity_id string, canonical_name string, embedding array<float>"
    )
    got = GraphQueries(None, ents).semantic_search(
        "target query", k=10, over_fetch=4, exclude_stubs=True,
        min_similarity=0.01,
    ).collect()
    assert len(got) == 10, f"over-fetch starvation: only {len(got)} rows"
    assert all(r.entity_id.startswith("ent:real") for r in got)
