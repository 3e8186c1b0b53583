"""Round-2 pipeline semantics: DQ fail-on-violation, resume policies
(fail_fast / force_reprocess / trust_checkpoint), changed-files-only
incremental (run_from_table), and entity-surface accumulation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import cie_spark.plans.pipeline as pl
from cie_spark.plans.pipeline import KGPipeline
from cie_spark.sources.gen import generate_transcripts
from cie_spark.sources.io_snapshots import SnapshotTable


def _triple_set(p):
    return {
        (r.subj, r.pred, r.obj, r.conv_id, r.turn_idx)
        for r in p.triples.read().select(
            "subj", "pred", "obj", "conv_id", "turn_idx"
        ).collect()
    }


def test_dq_violation_fails_the_run(spark, tmp_path, monkeypatch):
    """Injected bad triple rows (empty subj, unknown pred, negative turn)
    must abort the run before materialize — datalog.go:62-175 semantics."""
    orig = pl.triples.all_triples

    def bad(linked, transcripts=None):
        df = orig(linked, transcripts)
        bad_row = df.sparkSession.createDataFrame(
            [("", "bogus", "x", "conv-bad", -1, None, 1)],
            "subj string, pred string, obj string, conv_id string, "
            "turn_idx int, ts timestamp, weight long",
        )
        return df.unionByName(bad_row)

    monkeypatch.setattr(pl.triples, "all_triples", bad)
    p = KGPipeline(spark, str(tmp_path / "wh"))
    t = generate_transcripts(spark, n_convs=4, avg_turns=5, seed=3)
    with pytest.raises(ValueError, match="data-quality violations"):
        p.run(t)
    # nothing was materialized
    assert p.triples.read() is None
    # the violation counts were recorded in lineage before the abort
    lin = {r.stage: r for r in p.lineage.read().collect()}
    assert lin["triples"].errors >= 3


def test_fail_fast_detects_checkpoint_drift(spark, tmp_path):
    wh = str(tmp_path / "wh")
    p = KGPipeline(spark, wh)
    t = generate_transcripts(spark, n_convs=5, avg_turns=5, seed=4).cache()
    p.run(t)
    # simulate a crash artifact: a conv indexed in triples but evicted from
    # the processed checkpoint
    one = spark.createDataFrame([("conv-000002",)], "conv_id string")
    p.processed.delete_matching(one, keys=["conv_id"])
    with pytest.raises(RuntimeError, match="fail_fast"):
        p.run(t, resume="fail_fast")
    # trust_checkpoint converges silently on the same state
    r = p.run(t, resume="trust_checkpoint")
    assert not r.get("skipped")  # conv-000002 reprocessed
    t.unpersist()


def test_force_reprocess_reemits_everything(spark, tmp_path):
    wh = str(tmp_path / "wh")
    p = KGPipeline(spark, wh)
    t = generate_transcripts(spark, n_convs=5, avg_turns=5, seed=5).cache()
    p.run(t)
    base = _triple_set(p)
    r1 = p.run(t)  # trust_checkpoint: no-op
    assert r1.get("skipped") is True
    r2 = p.run(t, resume="force_reprocess")
    assert not r2.get("skipped")
    assert r2["rows_in"] > 0
    assert _triple_set(p) == base  # idempotent replay
    t.unpersist()

    with pytest.raises(ValueError, match="resume"):
        p.run(t, resume="bogus_policy")


def test_run_from_table_reads_only_changed_files(spark, tmp_path):
    """Snapshot-diff incremental: edit one conversation via an upsert into
    the source table; run_from_table must converge to the same warehouse
    state as a full rebuild, and a further run must be a no-op."""
    src = SnapshotTable(
        spark, str(tmp_path / "src"), bucket_key="conv_id", n_buckets=16
    )
    t = generate_transcripts(spark, n_convs=10, avg_turns=6, seed=9).cache()
    src.overwrite(t)

    p = KGPipeline(spark, str(tmp_path / "wh"))
    full = p.run_from_table(src)
    assert full["triples"] > 0

    edited = (
        src.read()
        .filter((F.col("conv_id") == "conv-000004") & (F.col("turn_idx") == 1))
        .withColumn("text", F.lit("now about [[Grafana]] and [[Terraform]]"))
    )
    src.merge(edited, keys=["conv_id", "turn_idx"])
    incr = p.run_from_table(src)
    assert not incr.get("skipped")
    got = _triple_set(p)

    # oracle: full rebuild of the edited corpus in a fresh warehouse
    p2 = KGPipeline(spark, str(tmp_path / "wh2"))
    p2.run(src.read(), incremental=False)
    assert got == _triple_set(p2)

    # no further changes -> no-op (snapshot diff finds nothing)
    again = p.run_from_table(src)
    assert again.get("skipped") is True
    t.unpersist()


def test_incremental_touch_preserves_entity_surfaces(spark, tmp_path):
    """An incremental run that sees only ONE surface form of an entity must
    not shrink the entity's accumulated surface set (MERGE WHEN MATCHED
    unions, not replaces)."""
    wh = str(tmp_path / "wh")
    p = KGPipeline(spark, wh)
    rows = [
        ("c1", 0, "user", "about [[PostgreSQL]]", None, None),
        ("c1", 1, "user", "also [[Postgres]] and [[pg]]", None, None),
        ("c2", 0, "user", "only [[pg]] here", None, None),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    p.run(t, prose=False)
    before = {
        r.entity_id: set(r.surfaces) for r in p.entities.read().collect()
    }
    assert {"PostgreSQL", "Postgres", "pg"} <= before["ent:postgresql"]

    # touch only c2 (the pg-only conversation)
    t2 = t.withColumn(
        "text",
        F.when(
            (F.col("conv_id") == "c2") & (F.col("turn_idx") == 0),
            F.lit("edited, still [[pg]] only"),
        ).otherwise(F.col("text")),
    )
    p.run(t2, prose=False)
    after = {
        r.entity_id: set(r.surfaces) for r in p.entities.read().collect()
    }
    assert {"PostgreSQL", "Postgres", "pg"} <= after["ent:postgresql"]


def test_incremental_new_tool_writes_vertex(spark, tmp_path):
    """ADVICE r2: an incremental run that introduces a NEW tool but zero new
    entity surfaces must still write the 'tool:' vertex to the entities
    table (tool ids never ride the surface-link dictionary, so the
    no-new-surfaces merge skip must check them separately)."""
    wh = str(tmp_path / "wh")
    p = KGPipeline(spark, wh)
    rows = [
        ("c1", 0, "user", "about [[PostgreSQL]]", None, None),
        ("c1", 1, "tool", "calling tool <bash> ok", "bash", None),
    ]
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    p.run(spark.createDataFrame(rows, schema), prose=False)
    ids0 = {r.entity_id for r in p.entities.read().collect()}
    assert "tool:bash" in ids0

    # second run: a brand-new conversation with a NEW tool and an already-
    # known entity surface -> the surface dictionary does not advance
    rows2 = rows + [
        ("c2", 0, "user", "more [[PostgreSQL]]", None, None),
        ("c2", 1, "tool", "calling tool <notify> done", "notify", None),
    ]
    p.run(spark.createDataFrame(rows2, schema), prose=False)
    ids1 = {r.entity_id for r in p.entities.read().collect()}
    assert "tool:notify" in ids1, "new tool vertex must be merged"
    # and the calls edge agrees with the vertex table
    objs = {
        r.obj for r in p.triples.read().filter("pred = 'calls'").collect()
    }
    assert objs <= ids1


def test_conv_hash_order_independent(spark, tmp_path):
    """The conversation content hash must not depend on row order or
    partitioning (commutative constant-space lanes), and must be sensitive
    to any single-turn edit."""
    p = KGPipeline(spark, str(tmp_path / "wh"))
    t = generate_transcripts(spark, n_convs=6, avg_turns=8, seed=11).cache()
    a = {r.conv_id: (r.conv_hash, r.n_turns) for r in p._conv_hashes(t).collect()}
    shuffled = t.orderBy(F.rand(3)).repartition(7)
    b = {
        r.conv_id: (r.conv_hash, r.n_turns)
        for r in p._conv_hashes(shuffled).collect()
    }
    assert a == b
    t2 = t.withColumn(
        "text",
        F.when(
            (F.col("conv_id") == "conv-000001") & (F.col("turn_idx") == 0),
            F.lit("edited"),
        ).otherwise(F.col("text")),
    )
    c = {r.conv_id: r.conv_hash for r in p._conv_hashes(t2).collect()}
    assert c["conv-000001"] != a["conv-000001"][0]
    assert all(c[k] == a[k][0] for k in c if k != "conv-000001")
    t.unpersist()


def test_small_delta_path_agrees_with_big(spark, tmp_path, monkeypatch):
    """The small-delta fast path (driver-collected delta, literal isin
    scoping, in-process bucket hints, AQE-off conf guard) must produce a
    bit-identical warehouse to the distributed path on the same edit set
    (one changed conv + two brand-new convs), and must restore the session
    confs it touches."""
    src = SnapshotTable(
        spark, str(tmp_path / "src"), bucket_key="conv_id", n_buckets=16
    )
    base = generate_transcripts(spark, n_convs=12, avg_turns=6, seed=21).cache()
    src.overwrite(base)

    p_small = KGPipeline(spark, str(tmp_path / "whs"))
    p_big = KGPipeline(spark, str(tmp_path / "whb"))
    p_small.run_from_table(src)
    p_big.run_from_table(src)

    # two new convs (generator is hash-per-id: ids 0..11 regenerate
    # identically, so the slice >11 is genuinely new rows)...
    extra = generate_transcripts(spark, n_convs=14, avg_turns=6, seed=21).filter(
        F.col("conv_id") > "conv-000011"
    )
    src.merge(extra, keys=["conv_id", "turn_idx"])
    # ...and one edited conv
    edited = (
        src.read()
        .filter((F.col("conv_id") == "conv-000003") & (F.col("turn_idx") == 0))
        .withColumn("text", F.lit("now about [[Grafana]] and [[Vault]]"))
    )
    src.merge(edited, keys=["conv_id", "turn_idx"])

    aqe_before = spark.conf.get("spark.sql.adaptive.enabled")
    shuf_before = spark.conf.get("spark.sql.shuffle.partitions")

    # prove the fast path actually engaged (and the big run stayed off it)
    engaged = []
    orig_guard = KGPipeline._small_run_confs

    def spy(self):
        engaged.append(True)
        return orig_guard(self)

    monkeypatch.setattr(KGPipeline, "_small_run_confs", spy)
    r_small = p_small.run_from_table(src)
    assert engaged, "small-delta fast path did not engage"
    assert not r_small.get("skipped")

    engaged.clear()
    # row-volume cap alone must force the distributed path even when the
    # conv-count cap passes (mega-conversation guard: 10k convs × 10k turns
    # is 10^8 rows — must not run with AQE off on 8 shuffle partitions)
    monkeypatch.setattr(pl, "SMALL_DELTA_ROWS", 0)
    r_big = p_big.run_from_table(src)
    assert not engaged, "row cap=0 must force the distributed path"
    assert not r_big.get("skipped")

    # confs the guard touches are restored
    assert spark.conf.get("spark.sql.adaptive.enabled") == aqe_before
    assert spark.conf.get("spark.sql.shuffle.partitions") == shuf_before

    # identical warehouse state on every table the run commits
    assert r_small["triples"] == r_big["triples"]
    assert _triple_set(p_small) == _triple_set(p_big)
    ents = lambda p: sorted(  # noqa: E731
        (r.entity_id, tuple(sorted(r.surfaces)))
        for r in p.entities.read().select("entity_id", "surfaces").collect()
    )
    assert ents(p_small) == ents(p_big)
    proc = lambda p: sorted(  # noqa: E731
        (r.conv_id, r.conv_hash, r.n_turns)
        for r in p.processed.read().collect()
    )
    assert proc(p_small) == proc(p_big)

    # and both no-op on an unchanged source
    assert p_small.run_from_table(src).get("skipped") is True
    base.unpersist()
