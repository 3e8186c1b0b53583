"""SnapshotTable: atomic commits, merge/upsert, time travel, snapshot diff."""

from __future__ import annotations

from cie_spark.sources.io_snapshots import SnapshotTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v int")


def test_append_and_time_travel(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    assert t.read() is None
    s1 = t.append(_df(spark, [("a", 1)]))
    s2 = t.append(_df(spark, [("b", 2)]))
    assert sorted((r.k, r.v) for r in t.read().collect()) == [("a", 1), ("b", 2)]
    assert [(r.k, r.v) for r in t.read(snapshot_id=s1).collect()] == [("a", 1)]
    assert [s["snapshot_id"] for s in t.snapshots()] == [s1, s2]


def test_merge_upsert_idempotent(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.merge(_df(spark, [("a", 1), ("b", 2)]), keys=["k"])
    t.merge(_df(spark, [("b", 20), ("c", 3)]), keys=["k"])
    got = sorted((r.k, r.v) for r in t.read().collect())
    assert got == [("a", 1), ("b", 20), ("c", 3)]
    # idempotency: merging the same batch again changes nothing
    t.merge(_df(spark, [("b", 20), ("c", 3)]), keys=["k"])
    assert sorted((r.k, r.v) for r in t.read().collect()) == got


def test_delete_where(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [("a", 1), ("b", 2), ("c", 3)]))
    t.delete_where("k = 'b'")
    assert sorted(r.k for r in t.read().collect()) == ["a", "c"]


def test_snapshot_diff(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    s1 = t.append(_df(spark, [("a", 1)]))
    t.append(_df(spark, [("b", 2)]))
    t.append(_df(spark, [("c", 3)]))
    diff = t.diff_filesets(from_snapshot_id=s1)
    assert sorted(r.k for r in diff.collect()) == ["b", "c"]
    assert t.diff_filesets(from_snapshot_id=t.current_snapshot_id()) is None
