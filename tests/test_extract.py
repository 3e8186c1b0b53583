"""Extraction UDF vs hand-computed expectations (tier-1 analog of the
reference's golden parser fixtures, pkg/ingestion/testdata/go/*.go)."""

from __future__ import annotations

import datetime as dt

from cie_spark.operators.extract import extract_mentions

TS = dt.datetime(2026, 1, 1)


def _df(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def _collect(df):
    return sorted(
        (r.conv_id, r.turn_idx, r.kind, r.surface, r.tier, r.pos)
        for r in df.collect()
    )


def test_markers_and_duplicates(spark):
    t = _df(spark, [("c1", 0, "user", "see [[Postgres]] and [[Postgres]] plus [[Iceberg]]", None, TS)])
    got = _collect(extract_mentions(t))
    assert got == [
        ("c1", 0, "entity", "Iceberg", "marker", 2),
        ("c1", 0, "entity", "Postgres", "marker", 0),
        ("c1", 0, "entity", "Postgres", "marker", 1),
    ]


def test_tool_column_and_marker_dedup(spark):
    # tool row whose text repeats the same tool -> one mention (column tier)
    t = _df(spark, [("c1", 1, "tool", "calling tool <bash> with arg 7", "bash", TS)])
    got = _collect(extract_mentions(t))
    assert got == [("c1", 1, "tool", "bash", "column", 0)]


def test_tool_marker_in_assistant(spark):
    t = _df(spark, [("c1", 2, "assistant", "let me run: calling tool <search> now", None, TS)])
    got = _collect(extract_mentions(t))
    assert got == [("c1", 2, "tool", "search", "marker", 0)]


def test_malformed_marker_and_empty(spark):
    t = _df(
        spark,
        [
            ("c1", 3, "user", "broken [[Postgres left open", None, TS),
            ("c1", 4, "user", "", None, TS),
            ("c1", 5, "user", None, None, TS),
        ],
    )
    # malformed marker contributes nothing from the marker tier, but
    # "Postgres" is still a prose-tier dictionary hit
    got = _collect(extract_mentions(t))
    assert got == [("c1", 3, "entity", "Postgres", "prose", 0)]
    got_no_prose = _collect(extract_mentions(t, prose=False))
    assert got_no_prose == []


def test_prose_word_boundaries(spark):
    t = _df(
        spark,
        [
            ("c1", 6, "user", "we use Spark daily", None, TS),
            ("c1", 7, "user", "sparkling water", None, TS),  # no match
            ("c1", 8, "user", "[[Spark]] plus prose Kafka", None, TS),
        ],
    )
    got = _collect(extract_mentions(t))
    assert got == [
        ("c1", 6, "entity", "Spark", "prose", 0),
        ("c1", 8, "entity", "Kafka", "prose", 1),
        ("c1", 8, "entity", "Spark", "marker", 0),
    ]


def test_prose_inside_marker_not_double_counted(spark):
    t = _df(spark, [("c1", 9, "user", "[[Apache Spark]] rocks", None, TS)])
    got = _collect(extract_mentions(t))
    assert got == [("c1", 9, "entity", "Apache Spark", "marker", 0)]
