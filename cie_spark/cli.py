"""`cie`-style CLI over the warehouse: the reference's user surface
(cmd/cie: `cie index`, `cie query`, `cie watch`, MCP tools
cmd/cie/mcp.go:578-1234) re-expressed as subcommands over the snapshot
warehouse. A reference user maps 1:1:

    cie index  -> python -m cie_spark.cli index --events ... --warehouse W
    cie watch  -> python -m cie_spark.cli watch --transcripts DIR --warehouse W
    MCP tool X -> python -m cie_spark.cli query X [args] --warehouse W
    cie query  -> python -m cie_spark.cli sql "SELECT ..." --warehouse W
                  (tables: triples, entities, lineage, processed_convs)

Query output is JSON-lines on stdout (one row per line) — pipeable, like
the reference's tool responses.
"""

from __future__ import annotations

import argparse
import json
import sys


def _queries(spark, warehouse, need_transcripts: str | None):
    from cie_spark.operators.graph_queries import GraphQueries
    from cie_spark.plans.pipeline import KGPipeline

    pipe = KGPipeline(spark, warehouse)
    triples = pipe.triples.read()
    if triples is None:
        raise SystemExit(f"no indexed triples in warehouse {warehouse!r} — run `index` first")
    entities = pipe.entities.read()
    transcripts = None
    if need_transcripts:
        transcripts = spark.read.parquet(need_transcripts)
    return GraphQueries(triples, entities, transcripts), pipe


# collect() safety net: no emit path may pull an unbounded result to the
# driver (a server-mode reuse of _emit would otherwise OOM on a fat query)
DEFAULT_ROW_CAP = 1000


def _emit(df, limit: int | None = DEFAULT_ROW_CAP) -> None:
    # fetch cap+1 so a hit of the cap is detectable: silent truncation makes
    # a partial export look complete (ADVICE r3 low). `is not None`
    # consistently: limit=0 means "no rows", not "all rows" (ADVICE r4 low)
    rows = df.limit(limit + 1).collect() if limit is not None else df.collect()
    truncated = limit is not None and len(rows) > limit
    for r in rows[:limit] if limit is not None else rows:
        print(json.dumps(r.asDict(recursive=True), default=str))
    if truncated:
        print(
            f"warning: output truncated at {limit} rows "
            "(raise the limit or add LIMIT/--limit to the query)",
            file=sys.stderr,
        )


# tools servable over the JSON-lines protocol: every GraphQueries method a
# reference MCP client would call (cmd/cie/mcp.go:578-1234 registry analog);
# args map 1:1 onto the method's keyword parameters
SERVE_TOOLS = frozenset({
    "index_status", "index_health", "search_text", "find_entity",
    "find_callers", "find_callees", "call_graph", "similar_entities",
    "conv_summary", "semantic_search", "grep", "grep_context",
    "verify_absence", "list_tools", "top_entities_per_conv", "trace_path",
    "entity_history", "find_introduction", "blame", "get_code",
})


def serve_loop(gq, inp, out, row_cap: int = DEFAULT_ROW_CAP) -> int:
    """Long-lived JSON-lines tool server over a warm SparkSession — the
    analog of the reference's MCP stdio surface (cmd/cie/mcp.go:38-46
    framing, 1280+ dispatch): one request object per line
    `{"id"?, "tool", "args"?}`, one response per line `{"id", "ok", "rows"}`
    or `{"id", "ok": false, "error"}`. Errors never kill the session, so a
    client pays Spark startup once for any number of queries."""
    from pyspark.sql import DataFrame

    n = 0
    for line in inp:
        line = line.strip()
        if not line:
            continue
        req: dict = {}
        try:
            req = json.loads(line)
            if not isinstance(req, dict):
                raise ValueError("request must be a JSON object")
            tool = req.get("tool")
            if tool not in SERVE_TOOLS:
                raise ValueError(f"unknown tool {tool!r}")
            res = getattr(gq, tool)(**req.get("args", {}))
            if isinstance(res, DataFrame):
                rows = [
                    r.asDict(recursive=True)
                    for r in res.limit(row_cap).collect()
                ]
                resp = {"id": req.get("id"), "ok": True, "rows": rows}
            else:  # trace_path returns plain python
                resp = {"id": req.get("id"), "ok": True, "result": res}
        except Exception as e:  # noqa: BLE001 — protocol: report, keep serving
            resp = {
                "id": req.get("id") if isinstance(req, dict) else None,
                "ok": False,
                "error": f"{type(e).__name__}: {e}",
            }
        out.write(json.dumps(resp, default=str) + "\n")
        out.flush()
        n += 1
    return n


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="cie_spark", description=__doc__)
    ap.add_argument("--master", default=None)
    ap.add_argument("--warehouse", required=False)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("index", help="run the construction pipeline (cie index)")
    p.add_argument("--events")
    p.add_argument("--transcripts")
    p.add_argument("--full", action="store_true")
    p.add_argument("--resume", default="trust_checkpoint",
                   choices=["trust_checkpoint", "force_reprocess", "fail_fast"])

    p = sub.add_parser("watch", help="streaming incremental reindex (cie watch)")
    p.add_argument("--transcripts", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--continuous", action="store_true")

    p = sub.add_parser("sql", help="raw SQL over warehouse tables (cie query)")
    p.add_argument("statement")

    p = sub.add_parser(
        "expire", help="prune old snapshots + dead filesets on every "
        "warehouse table (Iceberg expire_snapshots analog)"
    )
    p.add_argument("--keep-last", type=int, default=10)

    p = sub.add_parser(
        "serve",
        help="long-lived JSON-lines tool server over one warm session "
        "(MCP-surface analog): requests {'tool', 'args'} on stdin, "
        "responses on stdout",
    )
    p.add_argument("--transcripts", help="transcript parquet for text tools")
    p.add_argument("--row-cap", type=int, default=DEFAULT_ROW_CAP)

    q = sub.add_parser("query", help="run one query tool (MCP tool analog)")
    q.add_argument("tool", choices=[
        "index_status", "index_health", "find_callers", "find_callees", "call_graph",
        "find_entity", "similar_entities", "semantic_search", "search_text",
        "grep", "grep_context", "verify_absence", "list_tools",
        "top_entities_per_conv", "conv_summary", "entity_history",
        "find_introduction", "blame", "trace_path", "get_code",
    ])
    q.add_argument("args", nargs="*", help="positional tool arguments")
    q.add_argument("--transcripts", help="transcript parquet for text tools")
    q.add_argument("--limit", type=int, default=100)
    q.add_argument("--indirect", action="store_true")

    a = ap.parse_args(argv)
    if not a.warehouse:
        ap.error("--warehouse is required")

    from pyspark.sql import SparkSession

    from cie_spark.session import get_spark

    # only stop the session if this invocation created it (embedded callers
    # — tests, notebooks — keep theirs)
    pre_existing = SparkSession.getActiveSession()
    spark = get_spark(app="cie_spark_cli", master=a.master)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if a.cmd == "index":
            from cie_spark import spec
            from cie_spark.plans.pipeline import KGPipeline

            if a.events:
                spark.read.parquet(a.events).createOrReplaceTempView("events")
                transcripts = spark.sql(spec.TRANSCRIPTS_FROM_EVENTS_SQL)
            elif a.transcripts:
                transcripts = spark.read.parquet(a.transcripts)
            else:
                raise SystemExit("index needs --events or --transcripts")
            out = KGPipeline(spark, a.warehouse).run(
                transcripts, incremental=not a.full, resume=a.resume
            )
            print(json.dumps(out))
            return 0

        if a.cmd == "watch":
            from cie_spark.streaming.watch import watch

            qh = watch(
                spark, a.transcripts, a.warehouse,
                checkpoint_dir=a.checkpoint,
                available_now=not a.continuous,
            )
            qh.awaitTermination()
            return 0

        if a.cmd == "sql":
            from cie_spark.plans.pipeline import KGPipeline

            pipe = KGPipeline(spark, a.warehouse)
            for name, tbl in (
                ("triples", pipe.triples), ("entities", pipe.entities),
                ("lineage", pipe.lineage), ("processed_convs", pipe.processed),
            ):
                df = tbl.read()
                if df is not None:
                    df.createOrReplaceTempView(name)
            _emit(spark.sql(a.statement))
            return 0

        if a.cmd == "expire":
            from cie_spark.plans.pipeline import KGPipeline

            out = KGPipeline(spark, a.warehouse).expire_snapshots(
                keep_last=a.keep_last
            )
            print(json.dumps(out))
            return 0

        if a.cmd == "serve":
            gq, _pipe = _queries(spark, a.warehouse, a.transcripts)
            serve_loop(gq, sys.stdin, sys.stdout, row_cap=a.row_cap)
            return 0

        # query tools
        gq, _pipe = _queries(spark, a.warehouse, a.transcripts)
        t, args = a.tool, a.args
        if t == "index_status":
            _emit(gq.index_status())
        elif t == "index_health":
            _emit(gq.index_health())
        elif t == "find_callers":
            _emit(gq.find_callers(args[0], include_indirect=a.indirect, limit=a.limit))
        elif t == "find_callees":
            _emit(gq.find_callees(args[0], limit=a.limit))
        elif t == "call_graph":
            _emit(gq.call_graph(args[0]))
        elif t == "find_entity":
            _emit(gq.find_entity(args[0]))
        elif t == "similar_entities":
            _emit(gq.similar_entities(args[0], limit=a.limit))
        elif t == "semantic_search":
            _emit(gq.semantic_search(" ".join(args), k=a.limit))
        elif t == "search_text":
            _emit(gq.search_text(args[0], limit=a.limit))
        elif t == "grep":
            _emit(gq.grep(list(args), limit=a.limit))
        elif t == "grep_context":
            _emit(gq.grep_context(args[0]), limit=a.limit)
        elif t == "verify_absence":
            _emit(gq.verify_absence(list(args)))
        elif t == "list_tools":
            _emit(gq.list_tools(), limit=a.limit)
        elif t == "top_entities_per_conv":
            _emit(gq.top_entities_per_conv(int(args[0]) if args else 5), limit=a.limit)
        elif t == "conv_summary":
            _emit(gq.conv_summary(args[0]))
        elif t == "entity_history":
            _emit(gq.entity_history(args[0]), limit=a.limit)
        elif t == "find_introduction":
            _emit(gq.find_introduction(), limit=a.limit)
        elif t == "blame":
            _emit(gq.blame(args[0]))
        elif t == "get_code":
            _emit(gq.get_code(args[0], limit=a.limit))
        elif t == "trace_path":
            paths = gq.trace_path(args[0], args[1])
            print(json.dumps({"paths": paths}))
        return 0
    finally:
        if pre_existing is None:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
