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
