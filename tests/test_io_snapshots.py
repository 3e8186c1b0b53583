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


def test_diff_survives_bucketed_merges(spark, tmp_path):
    """ADVICE r2: a bucketed merge commit lists only the fileset it wrote,
    while carried buckets still reference older filesets. A fileset appended
    between the diff base and a later merge must still appear in the diff
    (liveness from the bucket map), or its conversations are silently never
    indexed."""
    t = SnapshotTable(spark, str(tmp_path / "t"), bucket_key="k", n_buckets=8)
    s0 = t.append(_df(spark, [("a", 1)]))
    # new fileset between the base and the merge
    t.append(_df(spark, [("b", 2)]))
    # merge touching only 'a' — 'b' bucket is carried by reference
    t.merge(_df(spark, [("a", 10)]), keys=["k"])
    diff = t.diff_filesets(from_snapshot_id=s0)
    got = sorted(r.k for r in diff.collect())
    # 'b' (appended) and 'a' (rewritten by the merge) must both surface;
    # over-approximation is fine, dropping 'b' is the bug
    assert "b" in got and "a" in got
    # two merges back-to-back: still nothing lost
    s1 = t.current_snapshot_id()
    t.append(_df(spark, [("c", 3)]))
    t.merge(_df(spark, [("a", 11)]), keys=["k"])
    t.merge(_df(spark, [("a", 12)]), keys=["k"])
    got2 = sorted(set(r.k for r in t.diff_filesets(from_snapshot_id=s1).collect()))
    assert "c" in got2
    # table state itself stayed correct throughout
    assert sorted((r.k, r.v) for r in t.read().collect()) == [
        ("a", 12), ("b", 2), ("c", 3)
    ]


def test_concurrent_merges_both_survive(spark, tmp_path):
    """Commit CAS (embedded.go:36-41,393-410 analog): two threads merging
    disjoint keys into ONE table must both land — previously the second
    HEAD rename silently dropped the first commit."""
    import threading
    from concurrent.futures import ThreadPoolExecutor

    t = SnapshotTable(spark, str(tmp_path / "t"), bucket_key="k", n_buckets=8)
    t.overwrite(_df(spark, [("seed", 0)]))
    barrier = threading.Barrier(2)

    def writer(rows):
        barrier.wait()
        t.merge(_df(spark, rows), keys=["k"])

    with ThreadPoolExecutor(2) as ex:
        f1 = ex.submit(writer, [("a", 1)])
        f2 = ex.submit(writer, [("b", 2)])
        f1.result(timeout=300)
        f2.result(timeout=300)
    got = sorted((r.k, r.v) for r in t.read().collect())
    assert got == [("a", 1), ("b", 2), ("seed", 0)]
    # the loser retried: history shows three commits, linear parent chain
    snaps = t.snapshots()
    assert len(snaps) == 3
    parents = {s["snapshot_id"]: s["parent"] for s in snaps}
    ids = [s["snapshot_id"] for s in snaps]
    assert parents[ids[1]] == ids[0] and parents[ids[2]] == ids[1]


def test_commit_conflict_surfaces_without_retry_budget(spark, tmp_path):
    """A stale expected_parent raises CommitConflict at the _commit layer."""
    import pytest

    from cie_spark.sources.io_snapshots import CommitConflict

    t = SnapshotTable(spark, str(tmp_path / "t"))
    s1 = t.append(_df(spark, [("a", 1)]))
    t.append(_df(spark, [("b", 2)]))
    with pytest.raises(CommitConflict):
        t._commit([], "merge", {}, expected_parent=s1)


def test_diff_and_expiry_are_chain_local(spark, tmp_path, monkeypatch):
    """Manifest hygiene: diff_filesets walks the HEAD parent chain — a
    many-commit table resolves a recent diff in O(commits-since) manifest
    reads; expire_snapshots prunes old manifests + dead filesets while the
    retained window keeps working."""
    import pytest

    from cie_spark.sources.io_snapshots import SnapshotTable as ST

    t = SnapshotTable(spark, str(tmp_path / "t"))
    sids = [t.append(_df(spark, [(f"k{i}", i)])) for i in range(12)]

    reads = {"n": 0}
    orig = ST._read_snapshot

    def counting(self, sid):
        reads["n"] += 1
        return orig(self, sid)

    monkeypatch.setattr(ST, "_read_snapshot", counting)
    diff = t.diff_filesets(from_snapshot_id=sids[-4])
    assert sorted(r.k for r in diff.collect()) == ["k10", "k11", "k9"]
    # chain walk: 3 post-base + 1 base manifest, not all 12
    assert reads["n"] <= 5
    monkeypatch.setattr(ST, "_read_snapshot", orig)

    out = t.expire_snapshots(keep_last=5)
    assert out["removed_snapshots"] == 7
    # full table still reads (append chains carry all filesets forward)
    assert sorted(r.v for r in t.read().collect()) == list(range(12))
    # diff within the retained window still works
    d2 = t.diff_filesets(from_snapshot_id=sids[-3])
    assert sorted(r.k for r in d2.collect()) == ["k10", "k11"]
    # diff from an expired snapshot raises instead of silently under-reading
    with pytest.raises(ValueError, match="expired"):
        t.diff_filesets(from_snapshot_id=sids[0])


def test_expiry_removes_dead_merge_filesets(spark, tmp_path):
    """A bucketed merge strands the pre-merge fileset once the merge commit
    leaves the retained window — expire_snapshots must reclaim it."""
    import os

    t = SnapshotTable(spark, str(tmp_path / "t"), bucket_key="k", n_buckets=4)
    t.overwrite(_df(spark, [("a", 1), ("b", 2)]))
    for i in range(4):
        t.merge(_df(spark, [("a", 10 + i), ("b", 20 + i)]), keys=["k"])
    n_before = len(os.listdir(tmp_path / "t" / "data"))
    out = t.expire_snapshots(keep_last=1)
    n_after = len(os.listdir(tmp_path / "t" / "data"))
    assert out["removed_filesets"] > 0 and n_after < n_before
    assert sorted((r.k, r.v) for r in t.read().collect()) == [("a", 13), ("b", 23)]


def test_schema_evolution_additive(spark, tmp_path):
    """Additive schema evolution (Iceberg add-column analog): a write with
    new columns widens the table schema; old files read back as NULL —
    including bucket-pruned reads touching only pre-evolution files; type
    changes are rejected."""
    import pytest

    t = SnapshotTable(spark, str(tmp_path / "t"), bucket_key="k", n_buckets=4)
    t.append(_df(spark, [("a", 1), ("b", 2)]))
    t.append(spark.createDataFrame([("c", 3, "x")], "k string, v int, w string"))
    got = {r.k: (r.v, r.w) for r in t.read().collect()}
    assert got == {"a": (1, None), "b": (2, None), "c": (3, "x")}

    t.merge(
        spark.createDataFrame(
            [("a", 10, "y"), ("d", 4, "z")], "k string, v int, w string"
        ),
        keys=["k"],
    )
    got = {r.k: (r.v, r.w) for r in t.read().collect()}
    assert got == {"a": (10, "y"), "b": (2, None), "c": (3, "x"), "d": (4, "z")}

    # an old-writer frame (no w) still merges; its rows carry w = NULL
    t.merge(_df(spark, [("b", 20)]), keys=["k"])
    assert {r.k: (r.v, r.w) for r in t.read().collect()}["b"] == (20, None)

    # bucket-pruned point lookup of rows written before evolution still
    # surfaces the new column
    one = spark.createDataFrame([("c",)], "k string")
    sub = t.read_matching(one, ["k"])
    assert sub.columns == ["k", "v", "w"]
    assert [(r.k, r.w) for r in sub.collect()] == [("c", "x")]

    with pytest.raises(ValueError, match="not supported"):
        t.append(spark.createDataFrame([("e", "oops")], "k string, v string"))

    # unbucketed table takes the same path
    u = SnapshotTable(spark, str(tmp_path / "u"))
    u.append(_df(spark, [("a", 1)]))
    u.merge(
        spark.createDataFrame([("a", 2, 9.5)], "k string, v int, s double"),
        keys=["k"],
    )
    row = u.read().collect()[0]
    assert (row.k, row.v, row.s) == ("a", 2, 9.5)
