"""CLI surface: index -> query tools -> sql over one warehouse (the
reference's `cie index` / MCP-tool / `cie query` user path)."""

from __future__ import annotations

import json

import pytest

from cie_spark import cli
from cie_spark.sources.gen import generate_transcripts


@pytest.fixture(scope="module")
def wh(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cliwh")
    tdir = str(root / "transcripts")
    generate_transcripts(spark, n_convs=8, avg_turns=8, seed=6).write.mode(
        "overwrite"
    ).parquet(tdir)
    return str(root / "wh"), tdir


def _run(capsys, argv):
    rc = cli.main(argv)
    assert rc == 0
    out = capsys.readouterr().out.strip()
    return [json.loads(line) for line in out.splitlines() if line]


def test_cli_index_then_query_then_sql(wh, capsys, spark):
    warehouse, tdir = wh
    rows = _run(capsys, [
        "--warehouse", warehouse, "--master", "local[4]",
        "index", "--transcripts", tdir,
    ])
    assert rows[0]["triples"] > 0

    status = _run(capsys, ["--warehouse", warehouse, "query", "index_status"])
    assert {r["pred"] for r in status} >= {"calls", "contains"}

    callers = _run(capsys, [
        "--warehouse", warehouse, "query", "find_callers", "tool:bash",
    ])
    assert all(r["subj"].startswith("agent:") for r in callers)

    sem = _run(capsys, [
        "--warehouse", warehouse, "query", "semantic_search", "postgresql",
    ])
    assert sem and sem[0]["canonical_name"] == "postgresql"

    text = _run(capsys, [
        "--warehouse", warehouse, "query", "grep", "discussed",
        "--transcripts", tdir,
    ])
    assert text

    sql = _run(capsys, [
        "--warehouse", warehouse, "sql",
        "SELECT pred, count(*) AS n FROM triples GROUP BY pred",
    ])
    assert sql and all(r["n"] > 0 for r in sql)

    # incremental no-op on re-index
    again = _run(capsys, [
        "--warehouse", warehouse, "index", "--transcripts", tdir,
    ])
    assert again[0].get("skipped") is True


def test_serve_protocol_one_session(wh, spark):
    """serve mode (MCP-surface analog): several tools through the JSON-lines
    protocol over ONE warm session, plus an error response for an unknown
    tool and a malformed line — errors never kill the loop."""
    import io

    from cie_spark.cli import serve_loop
    from cie_spark.operators.graph_queries import GraphQueries
    from cie_spark.plans.pipeline import KGPipeline

    warehouse, tdir = wh  # indexed by test_cli_index_then_query_then_sql
    pipe = KGPipeline(spark, warehouse)
    gq = GraphQueries(
        pipe.triples.read(), pipe.entities.read(),
        spark.read.parquet(tdir),
    )
    reqs = [
        {"id": 1, "tool": "index_status"},
        {"id": 2, "tool": "find_callers",
         "args": {"tool_id": "tool:bash", "limit": 5}},
        {"id": 3, "tool": "semantic_search",
         "args": {"query": "postgresql", "k": 3}},
        {"id": 4, "tool": "index_health"},
        {"id": 5, "tool": "no_such_tool"},
        "not json at all",
        {"id": 6, "tool": "grep", "args": {"patterns": ["discussed"]}},
    ]
    inp = io.StringIO(
        "\n".join(r if isinstance(r, str) else json.dumps(r) for r in reqs)
    )
    out = io.StringIO()
    n = serve_loop(gq, inp, out)
    assert n == 7
    resp = [json.loads(line) for line in out.getvalue().splitlines()]
    by_id = {r.get("id"): r for r in resp}
    assert by_id[1]["ok"] and {row["pred"] for row in by_id[1]["rows"]} >= {"calls"}
    assert by_id[2]["ok"] and all(
        row["subj"].startswith("agent:") for row in by_id[2]["rows"]
    )
    assert by_id[3]["ok"] and by_id[3]["rows"][0]["canonical_name"] == "postgresql"
    assert by_id[4]["ok"]
    health = {row["kind"]: row for row in by_id[4]["rows"]}
    assert health["entity"]["n_embedded"] > 0
    assert health["entity"]["warn_no_embeddings"] == 0
    assert not by_id[5]["ok"] and "no_such_tool" in by_id[5]["error"]
    assert by_id[6]["ok"] and by_id[6]["rows"]
    # the malformed line produced an ok=false response with id=None
    assert any(not r["ok"] and r.get("id") is None for r in resp)


def test_cli_expire_keeps_warehouse_readable(wh, capsys, spark):
    """`expire` prunes snapshot history on every warehouse table while the
    current state stays fully readable."""
    warehouse, tdir = wh
    # a couple of extra commits so there is history to prune
    _run(capsys, [
        "--warehouse", warehouse, "index", "--transcripts", tdir, "--full",
    ])
    out = _run(capsys, [
        "--warehouse", warehouse, "expire", "--keep-last", "1",
    ])
    assert out and "triples" in out[0]
    status = _run(capsys, ["--warehouse", warehouse, "query", "index_status"])
    assert {r["pred"] for r in status} >= {"calls", "contains"}


def test_emit_limit_zero_prints_nothing(spark, capsys):
    """limit=0 means 'no rows', not 'all rows' — and no bogus truncation
    warning alongside full output (ADVICE r4 low: truthiness/is-None mix)."""
    df = spark.range(5).toDF("n")
    cli._emit(df, limit=0)
    cap = capsys.readouterr()
    assert cap.out.strip() == ""
    assert "truncated at 0 rows" in cap.err

    cli._emit(df, limit=None)  # explicit no-cap: all rows, no warning
    cap = capsys.readouterr()
    assert len(cap.out.strip().splitlines()) == 5
    assert "truncated" not in cap.err
