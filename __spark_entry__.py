"""Driver contract for the spark-graft builder (PySpark target).

Each `queries()` entry is an implemented operator from SURVEY.md §2 (or the
training-data-pipeline extensions); each `oracle_sql()` entry is the
equivalent DuckDB SQL over the same parquet views. KG queries run over a
transcripts table derived deterministically from `events` via ONE shared SQL
spec (cie_spark/spec.py TRANSCRIPTS_FROM_EVENTS_SQL, valid verbatim in both
engines) — so the Spark pipeline (pandas-UDF extraction + broadcast-join
linking) is checked bit-for-bit against an independent ANSI-SQL derivation.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cie_spark import spec
from cie_spark.operators import dedup, extract, link, simsearch, textstats, triples
from cie_spark.sources import gen

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _prep(spark: SparkSession) -> None:
    # bit-exact timestamp comparison vs DuckDB (UTC-naive)
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    return gen.transcripts_from_events(spark, sf_dir)


def _linked(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    t = _transcripts(spark, sf_dir)
    m = extract.extract_mentions(t)
    return link.link_mentions(spark, m), t


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


TRIPLE_COLS = ["subj", "pred", "obj", "conv_id", "turn_idx", "ts", "weight"]


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG construction at sf0.001 — derive transcripts, run
    pandas-UDF extraction + 3-tier linking, emit all (subj, pred, obj)
    triples with provenance."""
    linked, t = _linked(spark, "/root/testdata/sf0.001")
    return triples.all_triples(linked, t)


# ---------------------------------------------------------------------------
# Spark-side queries
# ---------------------------------------------------------------------------


def q_kg_transcripts(spark, sf_dir):
    return _transcripts(spark, sf_dir)


def q_kg_mentions(spark, sf_dir):
    t = _transcripts(spark, sf_dir)
    m = extract.extract_mentions(t)
    return m.filter(F.col("kind") == "entity").select("conv_id", "turn_idx", "surface")


def q_kg_tool_calls(spark, sf_dir):
    linked, t = _linked(spark, sf_dir)
    return triples.calls_triples(linked, t).select(TRIPLE_COLS)


def q_kg_calls_agg(spark, sf_dir):
    linked, t = _linked(spark, sf_dir)
    return (
        triples.calls_triples(linked, t)
        .groupBy("subj", "obj")
        .agg(F.count("*").alias("n_calls"))
    )


def q_kg_linked_entities(spark, sf_dir):
    linked, _ = _linked(spark, sf_dir)
    return linked.filter(F.col("kind") == "entity").select(
        "conv_id", "turn_idx", "entity_id"
    )


def q_kg_contains(spark, sf_dir):
    linked, t = _linked(spark, sf_dir)
    return triples.contains_triples(linked, t).select(TRIPLE_COLS)


def q_kg_mentioned_with(spark, sf_dir):
    linked, t = _linked(spark, sf_dir)
    return triples.mentioned_with_triples(linked, t).drop("ts")


def q_kg_cooccur_window(spark, sf_dir):
    linked, t = _linked(spark, sf_dir)
    return triples.mentioned_with_windowed(linked, t).drop("ts")


def q_kg_entity_stats(spark, sf_dir):
    linked, _ = _linked(spark, sf_dir)
    return (
        linked.filter(F.col("kind") == "entity")
        .groupBy("entity_id")
        .agg(
            F.count("*").alias("n_mentions"),
            F.countDistinct("conv_id").alias("n_convs"),
        )
    )


def q_kg_index_status(spark, sf_dir):
    linked, t = _linked(spark, sf_dir)
    return triples.all_triples(linked, t).groupBy("pred").agg(
        F.count("*").alias("n")
    )


def q_kg_find_callers(spark, sf_dir):
    linked, t = _linked(spark, sf_dir)
    return (
        triples.calls_triples(linked, t)
        .filter(F.col("obj") == "tool:bash")
        .groupBy("subj")
        .agg(F.count("*").alias("n_calls"))
    )


def q_kg_top_tools_per_agent(spark, sf_dir):
    from pyspark.sql import Window

    linked, t = _linked(spark, sf_dir)
    agg = (
        triples.calls_triples(linked, t)
        .groupBy("subj", "obj")
        .agg(F.count("*").alias("n_calls"))
    )
    w = Window.partitionBy("subj").orderBy(F.desc("n_calls"), F.asc("obj"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("subj", "obj", "n_calls", "rank")
    )


def q_kg_search_text(spark, sf_dir):
    t = _transcripts(spark, sf_dir)
    return t.filter(F.col("text").contains("Iceberg")).select(
        "conv_id", "turn_idx", "role"
    )


def q_kg_verify_absence(spark, sf_dir):
    t = _transcripts(spark, sf_dir)
    pats = ["password", "secret", "Iceberg"]
    parts = [
        t.select(
            F.lit(p).alias("pattern"),
            F.col("text").contains(p).cast("long").alias("hit"),
        )
        for p in pats
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy("pattern").agg(
        F.sum("hit").alias("n_violations"),
        (F.sum("hit") == 0).cast("int").alias("passed"),
    )


def q_kg_conv_activity(spark, sf_dir):
    t = _transcripts(spark, sf_dir)
    return t.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.sum((F.col("role") == "tool").cast("long")).alias("n_tool_calls"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


def q_doc_dedup_exact(spark, sf_dir):
    return dedup.exact_groups(_docs(spark, sf_dir))


def q_doc_token_stats(spark, sf_dir):
    return textstats.doc_token_stats(_docs(spark, sf_dir))


def q_doc_quality(spark, sf_dir):
    return textstats.doc_quality(_docs(spark, sf_dir))


def q_doc_lang_guess(spark, sf_dir):
    return textstats.doc_lang_guess(_docs(spark, sf_dir))


def q_doc_fingerprint(spark, sf_dir):
    return textstats.doc_fingerprint(_docs(spark, sf_dir))


def q_ann_topk_bruteforce(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return simsearch.topk_bruteforce(emb, list(qvec), k=10)


def q_kg_list_tools(spark, sf_dir):
    linked, t = _linked(spark, sf_dir)
    return (
        triples.calls_triples(linked, t)
        .groupBy(F.col("obj").alias("tool_id"))
        .agg(F.count("*").alias("n_calls"), F.countDistinct("subj").alias("n_agents"))
    )


def q_kg_top_entities_per_conv(spark, sf_dir):
    from pyspark.sql import Window

    linked, t = _linked(spark, sf_dir)
    c = triples.contains_triples(linked, t)
    w = Window.partitionBy("conv_id").orderBy(F.desc("weight"), F.asc("obj"))
    return (
        c.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("conv_id", F.col("obj").alias("entity_id"), "weight", "rank")
    )


def q_kg_find_introduction(spark, sf_dir):
    from pyspark.sql import Window

    linked, _t = _linked(spark, sf_dir)
    ents = linked.filter(F.col("kind") == "entity")
    w = Window.partitionBy("entity_id").orderBy("ts", "conv_id", "turn_idx", "pos")
    return (
        ents.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "entity_id",
            F.col("ts").alias("first_ts"),
            F.col("conv_id").alias("first_conv"),
            F.col("turn_idx").alias("first_turn"),
        )
    )


def q_kg_blame(spark, sf_dir):
    t = _transcripts(spark, sf_dir)
    return t.groupBy("conv_id", "role").agg(
        F.count("*").alias("n_turns"), F.max("ts").alias("last_ts")
    )


def q_kg_call_graph(spark, sf_dir):
    linked, t = _linked(spark, sf_dir)
    calls = triples.calls_triples(linked, t)
    callers = (
        calls.filter(F.col("obj") == "tool:bash")
        .select(F.col("subj").alias("other"), F.lit("caller").alias("direction"))
    )
    callees = (
        calls.filter(F.col("subj") == "agent:conv-000000")
        .select(F.col("obj").alias("other"), F.lit("callee").alias("direction"))
    )
    return callers.unionByName(callees).groupBy("other", "direction").agg(
        F.count("*").alias("n")
    )


def q_kg_entity_history(spark, sf_dir):
    linked, t = _linked(spark, sf_dir)
    tr = triples.all_triples(linked, t)
    return tr.filter(
        (F.col("subj") == "ent:postgresql") | (F.col("obj") == "ent:postgresql")
    ).select("pred", "conv_id", "turn_idx", "ts", "weight")


def q_kg_grep_multi(spark, sf_dir):
    t = _transcripts(spark, sf_dir)
    pats = ["discussed", "failed"]
    parts = [
        t.filter(F.col("text").contains(p)).select(
            "conv_id", "turn_idx", F.lit(p).alias("pattern")
        )
        for p in pats
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u


def q_kg_similar_entities(spark, sf_dir):
    linked, _ = _linked(spark, sf_dir)
    return (
        linked.filter(F.col("kind") == "entity")
        .select("entity_id")
        .distinct()
        .filter(F.col("entity_id").rlike("post|kafka"))
    )


# rows-only checks (no SQL-expressible oracle; verified in pytest instead)


def q_kg_semantic_search(spark, sf_dir):
    from cie_spark.operators.graph_queries import GraphQueries

    linked, t = _linked(spark, sf_dir)
    ents = (
        linked.groupBy("entity_id")
        .agg(F.min("kind").alias("kind"), F.collect_set("surface").alias("surfaces"))
        .select(
            "entity_id", "kind",
            F.regexp_replace("entity_id", "^(ent:|tool:)", "").alias("canonical_name"),
            "surfaces",
        )
    )
    gq = GraphQueries(triples.all_triples(linked, t), ents, t)
    return gq.semantic_search("postgresql database", k=10)


def q_kg_entity_embeddings(spark, sf_dir):
    from cie_spark.functions import mock_embedding

    linked, _ = _linked(spark, sf_dir)
    ents = linked.filter(F.col("kind") == "entity").select("entity_id").distinct()
    return ents.select("entity_id", mock_embedding(F.col("entity_id")).alias("embedding"))


def q_ann_topk_lsh(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return simsearch.topk_lsh(emb, list(qvec), k=10)


def q_doc_minhash_pairs(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.5)


def q_doc_simhash_pairs(spark, sf_dir):
    return dedup.simhash_pairs(_docs(spark, sf_dir), max_hamming=3)


def q_emb_near_dup(spark, sf_dir):
    return simsearch.cosine_near_dup_pairs(_emb(spark, sf_dir), threshold=0.9)


def q_kg_full_pipeline(spark, sf_dir):
    linked, t = _linked(spark, sf_dir)
    return triples.all_triples(linked, t)


def q_kg_agents_with_toolset(spark, sf_dir):
    """Q23 analog (find_implementations): set-containment — agents whose
    called-tool set contains ALL required tools (collect_set + forall)."""
    linked, t = _linked(spark, sf_dir)
    required = ["tool:bash", "tool:search"]
    agents = (
        triples.calls_triples(linked, t)
        .groupBy("subj")
        .agg(F.collect_set("obj").alias("tools"))
    )
    has_all = F.forall(
        F.array(*[F.lit(r) for r in required]),
        lambda r: F.array_contains(F.col("tools"), r),
    )
    return agents.filter(has_all).select(
        "subj", F.size("tools").alias("n_tools")
    )


def q_kg_calls_with_arg_over_50(spark, sf_dir):
    """Q24 analog (find_by_signature): coarse rlike prefilter + precise
    parse of the extracted argument, post-filtered."""
    t = _transcripts(spark, sf_dir)
    pre = t.filter(F.col("text").rlike(r"with arg [0-9]+"))
    arg = F.regexp_extract(F.col("text"), r"with arg ([0-9]+)", 1).cast("int")
    return (
        pre.withColumn("arg", arg)
        .filter(F.col("arg") > 50)
        .select("conv_id", "turn_idx", "tool", "arg")
    )


def q_doc_jaccard_pairs_exact(spark, sf_dir):
    return dedup.jaccard_pairs_exact(_docs(spark, sf_dir), threshold=0.8)


def q_emb_near_dup_exact(spark, sf_dir):
    return simsearch.cosine_near_dup_exact(_emb(spark, sf_dir), threshold=0.5)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "kg_transcripts": q_kg_transcripts,
        "kg_mentions": q_kg_mentions,
        "kg_tool_calls": q_kg_tool_calls,
        "kg_calls_agg": q_kg_calls_agg,
        "kg_linked_entities": q_kg_linked_entities,
        "kg_contains": q_kg_contains,
        "kg_mentioned_with": q_kg_mentioned_with,
        "kg_cooccur_window": q_kg_cooccur_window,
        "kg_entity_stats": q_kg_entity_stats,
        "kg_index_status": q_kg_index_status,
        "kg_find_callers": q_kg_find_callers,
        "kg_top_tools_per_agent": q_kg_top_tools_per_agent,
        "kg_search_text": q_kg_search_text,
        "kg_verify_absence": q_kg_verify_absence,
        "kg_conv_activity": q_kg_conv_activity,
        "kg_full_pipeline": q_kg_full_pipeline,
        "kg_list_tools": q_kg_list_tools,
        "kg_top_entities_per_conv": q_kg_top_entities_per_conv,
        "kg_find_introduction": q_kg_find_introduction,
        "kg_blame": q_kg_blame,
        "kg_call_graph": q_kg_call_graph,
        "kg_entity_history": q_kg_entity_history,
        "kg_grep_multi": q_kg_grep_multi,
        "kg_similar_entities": q_kg_similar_entities,
        "kg_semantic_search": q_kg_semantic_search,
        "kg_entity_embeddings": q_kg_entity_embeddings,
        "doc_dedup_exact": q_doc_dedup_exact,
        "doc_token_stats": q_doc_token_stats,
        "doc_quality": q_doc_quality,
        "doc_lang_guess": q_doc_lang_guess,
        "doc_fingerprint": q_doc_fingerprint,
        "ann_topk_bruteforce": q_ann_topk_bruteforce,
        "ann_topk_lsh": q_ann_topk_lsh,
        "doc_minhash_pairs": q_doc_minhash_pairs,
        "doc_simhash_pairs": q_doc_simhash_pairs,
        "emb_near_dup": q_emb_near_dup,
        "doc_jaccard_pairs_exact": q_doc_jaccard_pairs_exact,
        "emb_near_dup_exact": q_emb_near_dup_exact,
        "kg_agents_with_toolset": q_kg_agents_with_toolset,
        "kg_calls_with_arg_over_50": q_kg_calls_with_arg_over_50,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_NORM_SURF = spec.norm_sql("surface", dialect="duckdb")
_STUB = f"'ent:' || substr(sha256({_NORM_SURF}), 1, 16)"
_CANON = f"coalesce({spec.canonical_case_sql(_NORM_SURF)}, {_STUB})"
_NORM_TOOL = spec.norm_sql("tool", dialect="duckdb")

_KG_CTES = f"""
WITH transcripts AS (
{spec.TRANSCRIPTS_FROM_EVENTS_SQL}
),
mentions AS (
  SELECT conv_id, turn_idx,
         unnest(regexp_extract_all(text, '{spec.MARKER_SQL_PATTERN}', 1)) AS surface
  FROM transcripts
),
linked AS (
  SELECT conv_id, turn_idx, {_CANON} AS entity_id FROM mentions
),
per_turn AS (
  SELECT DISTINCT conv_id, turn_idx, entity_id FROM linked
),
calls AS (
  SELECT concat('agent:', conv_id) AS subj, 'calls' AS pred,
         concat('tool:', {_NORM_TOOL}) AS obj,
         conv_id, turn_idx, ts, CAST(1 AS BIGINT) AS weight
  FROM transcripts
  WHERE role = 'tool' AND tool IS NOT NULL AND tool <> ''
),
contains_t AS (
  SELECT concat('conv:', l.conv_id) AS subj, 'contains' AS pred,
         l.entity_id AS obj, l.conv_id AS conv_id,
         CAST(min(l.turn_idx) AS INT) AS turn_idx, count(*) AS weight
  FROM linked l GROUP BY l.conv_id, l.entity_id
),
contains_ts AS (
  SELECT c.subj, c.pred, c.obj, c.conv_id, c.turn_idx, t.ts, c.weight
  FROM contains_t c JOIN transcripts t
    ON c.conv_id = t.conv_id AND c.turn_idx = t.turn_idx
),
mw AS (
  SELECT a.entity_id AS subj, 'mentioned_with' AS pred, b.entity_id AS obj,
         a.conv_id AS conv_id, CAST(min(a.turn_idx) AS INT) AS turn_idx,
         count(*) AS weight
  FROM per_turn a JOIN per_turn b
    ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
   AND a.entity_id < b.entity_id
  GROUP BY a.entity_id, b.entity_id, a.conv_id
)
""".strip()


def oracle_sql() -> dict[str, str]:
    w = spec.WINDOW_TURNS
    return {
        "kg_transcripts": spec.TRANSCRIPTS_FROM_EVENTS_SQL,
        "kg_mentions": f"{_KG_CTES} SELECT conv_id, turn_idx, surface FROM mentions",
        "kg_tool_calls": f"{_KG_CTES} SELECT subj, pred, obj, conv_id, turn_idx, ts, weight FROM calls",
        "kg_calls_agg": f"{_KG_CTES} SELECT subj, obj, count(*) AS n_calls FROM calls GROUP BY subj, obj",
        "kg_linked_entities": f"{_KG_CTES} SELECT conv_id, turn_idx, entity_id FROM linked",
        "kg_contains": f"{_KG_CTES} SELECT subj, pred, obj, conv_id, turn_idx, ts, weight FROM contains_ts",
        "kg_mentioned_with": f"{_KG_CTES} SELECT subj, pred, obj, conv_id, turn_idx, weight FROM mw",
        "kg_cooccur_window": f"""{_KG_CTES}, wpairs AS (
  SELECT DISTINCT least(a.entity_id, b.entity_id) AS subj,
         greatest(a.entity_id, b.entity_id) AS obj,
         a.conv_id AS conv_id, a.turn_idx AS ti, b.turn_idx AS tj
  FROM per_turn a JOIN per_turn b
    ON a.conv_id = b.conv_id
   AND b.turn_idx > a.turn_idx AND b.turn_idx - a.turn_idx <= {w}
   AND a.entity_id <> b.entity_id
)
SELECT subj, 'mentioned_with_w' AS pred, obj, conv_id,
       CAST(min(ti) AS INT) AS turn_idx, count(*) AS weight
FROM wpairs GROUP BY subj, obj, conv_id""",
        "kg_entity_stats": f"""{_KG_CTES}
SELECT entity_id, count(*) AS n_mentions,
       count(DISTINCT conv_id) AS n_convs
FROM linked GROUP BY entity_id""",
        "kg_index_status": f"""{_KG_CTES}
SELECT pred, count(*) AS n FROM (
  SELECT pred FROM calls
  UNION ALL SELECT pred FROM contains_t
  UNION ALL SELECT pred FROM mw
) GROUP BY pred""",
        "kg_find_callers": f"""{_KG_CTES}
SELECT subj, count(*) AS n_calls FROM calls WHERE obj = 'tool:bash' GROUP BY subj""",
        "kg_top_tools_per_agent": f"""{_KG_CTES}, agg AS (
  SELECT subj, obj, count(*) AS n_calls FROM calls GROUP BY subj, obj
)
SELECT subj, obj, n_calls, CAST(rank AS INT) AS rank FROM (
  SELECT subj, obj, n_calls,
         row_number() OVER (PARTITION BY subj ORDER BY n_calls DESC, obj ASC) AS rank
  FROM agg
) WHERE rank <= 3""",
        "kg_search_text": f"""{_KG_CTES}
SELECT conv_id, turn_idx, role FROM transcripts WHERE text LIKE '%Iceberg%'""",
        "kg_verify_absence": f"""{_KG_CTES}, pats AS (
  SELECT unnest(['password', 'secret', 'Iceberg']) AS pattern
)
SELECT p.pattern AS pattern,
       CAST(sum(CASE WHEN t.text LIKE '%' || p.pattern || '%' THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
       CAST(CASE WHEN sum(CASE WHEN t.text LIKE '%' || p.pattern || '%' THEN 1 ELSE 0 END) = 0
            THEN 1 ELSE 0 END AS INT) AS passed
FROM pats p CROSS JOIN transcripts t GROUP BY p.pattern""",
        "kg_conv_activity": f"""{_KG_CTES}
SELECT conv_id, count(*) AS n_turns,
       CAST(sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS BIGINT) AS n_tool_calls,
       min(ts) AS first_ts, max(ts) AS last_ts
FROM transcripts GROUP BY conv_id""",
        "kg_full_pipeline": f"""{_KG_CTES}
SELECT subj, pred, obj, conv_id, turn_idx, ts, weight FROM calls
UNION ALL SELECT subj, pred, obj, conv_id, turn_idx, ts, weight FROM contains_ts
UNION ALL SELECT m.subj, m.pred, m.obj, m.conv_id, m.turn_idx, t.ts, m.weight
FROM mw m JOIN transcripts t ON m.conv_id = t.conv_id AND m.turn_idx = t.turn_idx""",
        "kg_list_tools": f"""{_KG_CTES}
SELECT obj AS tool_id, count(*) AS n_calls, count(DISTINCT subj) AS n_agents
FROM calls GROUP BY obj""",
        "kg_top_entities_per_conv": f"""{_KG_CTES}
SELECT conv_id, obj AS entity_id, weight, CAST(rank AS INT) AS rank FROM (
  SELECT conv_id, obj, weight,
         row_number() OVER (PARTITION BY conv_id ORDER BY weight DESC, obj ASC) AS rank
  FROM contains_t
) WHERE rank <= 3""",
        "kg_find_introduction": f"""{_KG_CTES}, linked_ts AS (
  SELECT l.entity_id, l.conv_id, l.turn_idx, t.ts
  FROM linked l JOIN transcripts t
    ON l.conv_id = t.conv_id AND l.turn_idx = t.turn_idx
)
SELECT entity_id, ts AS first_ts, conv_id AS first_conv, turn_idx AS first_turn
FROM (
  SELECT entity_id, ts, conv_id, turn_idx,
         row_number() OVER (PARTITION BY entity_id ORDER BY ts, conv_id, turn_idx) AS rn
  FROM linked_ts
) WHERE rn = 1""",
        "kg_blame": f"""{_KG_CTES}
SELECT conv_id, role, count(*) AS n_turns, max(ts) AS last_ts
FROM transcripts GROUP BY conv_id, role""",
        "kg_call_graph": f"""{_KG_CTES}
SELECT other, direction, count(*) AS n FROM (
  SELECT subj AS other, 'caller' AS direction FROM calls WHERE obj = 'tool:bash'
  UNION ALL
  SELECT obj AS other, 'callee' AS direction FROM calls
  WHERE subj = 'agent:conv-000000'
) GROUP BY other, direction""",
        "kg_entity_history": f"""{_KG_CTES}, allt AS (
  SELECT subj, pred, obj, conv_id, turn_idx, ts, weight FROM calls
  UNION ALL SELECT subj, pred, obj, conv_id, turn_idx, ts, weight FROM contains_ts
  UNION ALL SELECT m.subj, m.pred, m.obj, m.conv_id, m.turn_idx, t.ts, m.weight
  FROM mw m JOIN transcripts t ON m.conv_id = t.conv_id AND m.turn_idx = t.turn_idx
)
SELECT pred, conv_id, turn_idx, ts, weight FROM allt
WHERE subj = 'ent:postgresql' OR obj = 'ent:postgresql'""",
        "kg_grep_multi": f"""{_KG_CTES}
SELECT conv_id, turn_idx, 'discussed' AS pattern FROM transcripts
WHERE text LIKE '%discussed%'
UNION ALL
SELECT conv_id, turn_idx, 'failed' AS pattern FROM transcripts
WHERE text LIKE '%failed%'""",
        "kg_similar_entities": f"""{_KG_CTES}
SELECT DISTINCT entity_id FROM linked
WHERE regexp_matches(entity_id, 'post|kafka')""",
        "doc_dedup_exact": """
SELECT md5(regexp_replace(trim(lower(coalesce(text, ''))), '\\s+', ' ', 'g')) AS fingerprint,
       count(*) AS n_dups, min(doc_id) AS keep_id
FROM documents GROUP BY 1""",
        "doc_token_stats": """
SELECT doc_id,
       CAST(CASE WHEN length(trim(text)) = 0 OR text IS NULL THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS INT) AS n_tokens,
       CAST(length(coalesce(text, '')) AS INT) AS n_chars
FROM documents""",
        "doc_quality": """
SELECT doc_id,
  CAST(length(coalesce(text,'')) AS INT) AS n_chars,
  CAST(length(regexp_replace(lower(coalesce(text,'')), '[^a-z]', '', 'g')) AS INT) AS n_alpha,
  CAST(length(regexp_replace(coalesce(text,''), '[^0-9]', '', 'g')) AS INT) AS n_digit,
  CAST(length(regexp_replace(coalesce(text,''), '[^.,;:!?]', '', 'g')) AS INT) AS n_punct,
  CAST(CASE WHEN length(trim(coalesce(text,''))) = 0 THEN 0
       ELSE len(regexp_split_to_array(trim(coalesce(text,'')), '\\s+')) END AS INT) AS n_tokens,
  CAST((len(string_split(' ' || lower(coalesce(text,'')) || ' ', ' the ')) - 1)
     + (len(string_split(' ' || lower(coalesce(text,'')) || ' ', ' a ')) - 1)
     + (len(string_split(' ' || lower(coalesce(text,'')) || ' ', ' an ')) - 1)
     + (len(string_split(' ' || lower(coalesce(text,'')) || ' ', ' and ')) - 1)
     + (len(string_split(' ' || lower(coalesce(text,'')) || ' ', ' or ')) - 1)
     + (len(string_split(' ' || lower(coalesce(text,'')) || ' ', ' of ')) - 1)
     + (len(string_split(' ' || lower(coalesce(text,'')) || ' ', ' to ')) - 1)
     + (len(string_split(' ' || lower(coalesce(text,'')) || ' ', ' in ')) - 1)
     + (len(string_split(' ' || lower(coalesce(text,'')) || ' ', ' is ')) - 1)
     + (len(string_split(' ' || lower(coalesce(text,'')) || ' ', ' it ')) - 1)
     + (len(string_split(' ' || lower(coalesce(text,'')) || ' ', ' for ')) - 1)
     + (len(string_split(' ' || lower(coalesce(text,'')) || ' ', ' on ')) - 1) AS INT) AS n_stopword_hits,
  CAST(CASE WHEN length(coalesce(text,'')) >= 100 THEN 1 ELSE 0 END AS INT) AS len_ok
FROM documents""",
        "doc_lang_guess": _LANG_GUESS_SQL,
        "doc_fingerprint": """
SELECT doc_id,
  md5(regexp_replace(trim(lower(coalesce(text,''))), '\\s+', ' ', 'g')) AS fingerprint,
  CAST(length(regexp_replace(trim(lower(coalesce(text,''))), '\\s+', ' ', 'g')) AS INT) AS norm_len
FROM documents""",
        "kg_agents_with_toolset": f"""{_KG_CTES}
SELECT subj, CAST(count(DISTINCT obj) AS INT) AS n_tools
FROM calls GROUP BY subj
HAVING max(CASE WHEN obj = 'tool:bash' THEN 1 ELSE 0 END) = 1
   AND max(CASE WHEN obj = 'tool:search' THEN 1 ELSE 0 END) = 1""",
        "kg_calls_with_arg_over_50": f"""{_KG_CTES}
SELECT conv_id, turn_idx, tool,
       CAST(regexp_extract(text, 'with arg ([0-9]+)', 1) AS INT) AS arg
FROM transcripts
WHERE regexp_matches(text, 'with arg [0-9]+')
  AND CAST(regexp_extract(text, 'with arg ([0-9]+)', 1) AS INT) > 50""",
        "doc_jaccard_pairs_exact": """
WITH arr AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(coalesce(text, ''))), '\\s+') AS a
  FROM documents
),
sh AS (
  SELECT doc_id,
    CASE WHEN len(a) >= 3 THEN
      list_distinct(list_transform(generate_series(1, len(a) - 2),
        i -> a[i] || ' ' || a[i + 1] || ' ' || a[i + 2]))
    ELSE [array_to_string(a, ' ')] END AS sh
  FROM arr
),
pairs AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
    CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
      / len(list_distinct(x.sh || y.sh)) AS j
  FROM sh x JOIN sh y ON x.doc_id < y.doc_id
)
SELECT doc_a, doc_b, round(j, 4) AS jaccard FROM pairs WHERE j >= 0.8""",
        "emb_near_dup_exact": """
WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS s
  FROM d a JOIN d b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, round(s, 4) AS sim FROM p WHERE s >= 0.5""",
        "ann_topk_bruteforce": """
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0
),
scored AS (
  SELECT e.vec_id,
         list_dot_product(CAST(e.embedding AS DOUBLE[]), q.v)
         / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
            * sqrt(list_dot_product(q.v, q.v))) AS sim_raw
  FROM embeddings e CROSS JOIN q
)
SELECT vec_id, round(sim_raw, 4) AS sim
FROM scored ORDER BY sim_raw DESC, vec_id ASC LIMIT 10""",
    }


def _mk_lang_sql() -> str:
    score_exprs = {}
    for lang, words in sorted(textstats.LANG_MARKERS.items()):
        parts = [
            f"(len(string_split(' ' || lower(coalesce(text,'')) || ' ', ' {w} ')) - 1)"
            for w in words
        ]
        score_exprs[lang] = "(" + " + ".join(parts) + ")"
    s = score_exprs
    return f"""
WITH scored AS (
  SELECT doc_id, {s['de']} AS s_de, {s['en']} AS s_en,
         {s['es']} AS s_es, {s['fr']} AS s_fr
  FROM documents
)
SELECT doc_id,
  CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
       WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
       WHEN s_es >= s_fr THEN 'es'
       ELSE 'fr' END AS lang_guess,
  CAST(greatest(s_de, s_en, s_es, s_fr) AS BIGINT) AS lang_score
FROM scored"""


_LANG_GUESS_SQL = _mk_lang_sql()
