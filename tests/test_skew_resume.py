"""Skew-path correctness (turn-block-salted windowed co-occurrence on a
mega-conversation) and crash-resume convergence."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cie_spark import spec
from cie_spark.operators.extract import extract_mentions
from cie_spark.operators.link import link_mentions
from cie_spark.operators.triples import mentioned_with_windowed
from cie_spark.plans.pipeline import KGPipeline
from cie_spark.sources.gen import generate_transcripts


def test_windowed_cooccurrence_matches_bruteforce_on_mega_conv(spark):
    """One 400-turn conversation: the block-salted join must produce exactly
    the pairs a brute-force O(n^2) oracle produces."""
    ents_vocab = ["Postgres", "Iceberg", "Kafka", "Redis", "DuckDB"]
    rows = []
    for i in range(400):
        e = ents_vocab[(i * 7) % len(ents_vocab)]
        rows.append(
            ("mega", i, "user", f"turn about [[{e}]]", None,
             dt.datetime(2026, 1, 1) + dt.timedelta(seconds=i))
        )
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    linked = link_mentions(spark, extract_mentions(t))
    w = spec.WINDOW_TURNS
    got = {
        (r.subj, r.obj, r.weight)
        for r in mentioned_with_windowed(linked, window_turns=w).collect()
    }

    # brute-force oracle in plain python
    per_turn = {}
    canon = {e: "ent:" + {"Postgres": "postgresql", "Iceberg": "apache-iceberg",
                          "Kafka": "apache-kafka", "Redis": "redis",
                          "DuckDB": "duckdb"}[e] for e in ents_vocab}
    for i in range(400):
        per_turn[i] = canon[ents_vocab[(i * 7) % len(ents_vocab)]]
    expected: dict[tuple[str, str], int] = {}
    for i in range(400):
        for j in range(i + 1, min(i + w + 1, 400)):
            a, b = per_turn[i], per_turn[j]
            if a == b:
                continue
            key = (min(a, b), max(a, b))
            expected[key] = expected.get(key, 0) + 1
    exp = {(a, b, n) for (a, b), n in expected.items()}
    assert got == exp


def test_crash_between_merge_and_checkpoint_converges(spark, tmp_path):
    """Simulate a crash after the triples MERGE but before the processed-set
    checkpoint: the next run reprocesses the conversation and the table
    converges to the same state (idempotent keyed MERGE)."""
    wh = str(tmp_path / "wh")
    p = KGPipeline(spark, wh)
    t = generate_transcripts(spark, n_convs=6, avg_turns=6, seed=21).cache()

    # full healthy run for the reference state
    p.run(t)
    healthy = {
        tuple(r) for r in p.triples.read().select("subj", "pred", "obj", "conv_id", "turn_idx").collect()
    }

    # fresh warehouse; crash = merge triples but never update the checkpoint
    wh2 = str(tmp_path / "wh2")
    p2 = KGPipeline(spark, wh2)
    from cie_spark.operators.extract import extract_mentions as em
    from cie_spark.operators.link import link_mentions as lm
    from cie_spark.operators.triples import all_triples

    trips = all_triples(lm(spark, em(t)))
    p2.triples.merge(
        trips, keys=["subj", "pred", "obj", "conv_id", "turn_idx"], partition_by=["pred"]
    )
    # processed_convs is empty -> everything counts as un-processed

    # recovery run: reprocesses all convs, deletes + re-merges idempotently
    r = p2.run(t)
    assert not r.get("skipped")
    recovered = {
        tuple(r_) for r_ in p2.triples.read().select("subj", "pred", "obj", "conv_id", "turn_idx").collect()
    }
    assert recovered == healthy

    # and a subsequent run is a no-op
    assert p2.run(t).get("skipped") is True
    t.unpersist()
