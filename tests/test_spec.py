"""The three renderings of the spec (Python / Spark Column / SQL) agree."""

from __future__ import annotations

from pyspark.sql import functions as F

from cie_spark import spec
from cie_spark import functions as CF

CASES = [
    "PostgreSQL",
    "Apache Spark",
    "postgres-db",
    "ES cluster",
    "  weird__Name!! ",
    "k8s",
    "",
    "---",
    "PostgreSQL 14",
]


def test_norm_python_vs_column(spark):
    df = spark.createDataFrame([(s,) for s in CASES], "s string")
    got = [r[0] for r in df.select(CF.norm_col("s")).collect()]
    assert got == [spec.norm(s) for s in CASES]


def test_norm_python_vs_sql(spark):
    df = spark.createDataFrame([(s,) for s in CASES], "s string")
    df.createOrReplaceTempView("norm_cases")
    got = [
        r[0]
        for r in spark.sql(f"SELECT {spec.norm_sql('s')} FROM norm_cases").collect()
    ]
    assert got == [spec.norm(s) for s in CASES]


def test_norm_sql_duckdb_agrees():
    import duckdb

    rel = duckdb.sql(
        "SELECT "
        + spec.norm_sql("s", dialect="duckdb")
        + " FROM (SELECT unnest(?) AS s)",
        params=[CASES],
    )
    got = [r[0] for r in rel.fetchall()]
    assert got == [spec.norm(s) for s in CASES]


def test_canonical_case_sql_matches_dict():
    import duckdb

    keys = sorted(spec.SURFACE_TO_CANONICAL)
    rel = duckdb.sql(
        "SELECT k, " + spec.canonical_case_sql("k") + " FROM (SELECT unnest(?) AS k)",
        params=[keys],
    )
    got = dict(rel.fetchall())
    assert got == spec.SURFACE_TO_CANONICAL


def test_stub_id_python_vs_column(spark):
    surfaces = ["frobnicatorx", "quantum-widget", "x"]
    df = spark.createDataFrame([(s,) for s in surfaces], "s string")
    got = [r[0] for r in df.select(CF.stub_entity_id_col(F.col("s"))).collect()]
    assert got == [spec.stub_entity_id(s) for s in surfaces]


def test_jaccard_examples():
    assert spec.jaccard(spec.shingles("postgresql-14"), spec.shingles("postgresql")) > 0.7
    assert spec.jaccard(spec.shingles("abc"), spec.shingles("xyz")) == 0.0


def test_canonical_ids_are_ascii():
    """The DuckDB FNV oracle hashes codepoints while Spark hashes UTF-8
    bytes — they agree only on ASCII. Canonical ids are ASCII by
    construction (norm collapses non-[a-z0-9] to '-'); pin it."""
    for k, v in spec.SURFACE_TO_CANONICAL.items():
        k.encode("ascii"); v.encode("ascii")
    for t in spec.TOOL_VOCAB:
        spec.norm(t).encode("ascii")
    # norm of arbitrary unicode is still ASCII
    assert spec.norm("café Ünïcode 日本語") .encode("ascii")
    assert spec.stub_entity_id(spec.norm("日本語")).encode("ascii")


def test_prose_regex_lower_equivalence():
    """The case-sensitive lowered-scan pattern must produce the same matches
    (spans + original-cased surfaces) as the IGNORECASE pattern."""
    samples = [
        "we like PostgreSQL and pg", "APACHE SPARK!", "postgres-db vs DuckDB",
        "noPostgreSQLword should not match", "ES cluster here",
        "k8s, redis-cache; Apache Airflow.", "prom prometheus PROM",
        "spark sparkly pyspark", "", "[[markers are masked elsewhere]]",
    ]
    joined = " \x00]\x00 ".join(samples)
    ref = [
        (m.start(1), m.group(1)) for m in spec.prose_regex().finditer(joined)
    ]
    lowered = joined.lower()
    assert len(lowered) == len(joined)
    got = [
        (m.start(1), joined[m.start(1):m.end(1)])
        for m in spec.prose_regex_lower().finditer(lowered)
    ]
    assert got == ref and ref  # non-trivial corpus
