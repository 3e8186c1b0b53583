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
