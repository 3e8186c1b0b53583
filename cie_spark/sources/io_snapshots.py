"""SnapshotTable: Iceberg-style table semantics over plain Parquet.

The sandbox image ships no Iceberg/Delta jars, so this module provides the
subset of table semantics the pipeline needs — atomic snapshot commits,
append / copy-on-write MERGE / delete, time-travel reads, snapshot diff —
over parquet files + JSON manifests. The layout mirrors Iceberg's
metadata/data split:

    <root>/
      data/<fileset-uuid>/part-*.parquet     immutable filesets
      snapshots/<seq>-<uuid>.json            manifest: list of live filesets
      HEAD                                   name of current manifest (atomic rename)

Commit protocol: write data files -> write manifest to a temp name ->
os.rename onto HEAD (atomic on POSIX). Readers resolve HEAD once and read a
consistent fileset. On a real deployment this class is swapped for Iceberg
catalog calls (`df.writeTo(tbl).append()` / MERGE INTO) — the pipeline code
only uses this narrow interface.

Analog of the reference's storage layer: idempotent `:put` upserts
(datalog.go:177-199), cascading deletes (embedded.go:336-391), checkpoint =
committed snapshot (checkpoint.go:29-177).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)

    # -- metadata -----------------------------------------------------------

    def _head_path(self) -> str:
        return os.path.join(self.root, "HEAD")

    def current_snapshot(self) -> dict | None:
        try:
            with open(self._head_path()) as f:
                name = f.read().strip()
            with open(os.path.join(self.root, "snapshots", name)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def snapshots(self) -> list[dict]:
        out = []
        snap_dir = os.path.join(self.root, "snapshots")
        for name in sorted(os.listdir(snap_dir)):
            with open(os.path.join(snap_dir, name)) as f:
                out.append(json.load(f))
        return out

    def current_snapshot_id(self) -> str | None:
        s = self.current_snapshot()
        return s["snapshot_id"] if s else None

    def _commit(self, filesets: list[str], op: str, summary: dict) -> str:
        prev = self.current_snapshot()
        seq = (prev["seq"] + 1) if prev else 0
        snap_id = f"{seq:06d}-{uuid.uuid4().hex[:12]}"
        manifest = {
            "snapshot_id": snap_id,
            "seq": seq,
            "parent": prev["snapshot_id"] if prev else None,
            "operation": op,
            "filesets": filesets,
            "summary": summary,
            "committed_at": time.time(),
        }
        name = snap_id + ".json"
        tmp = os.path.join(self.root, "snapshots", "." + name + ".tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, os.path.join(self.root, "snapshots", name))
        head_tmp = self._head_path() + ".tmp"
        with open(head_tmp, "w") as f:
            f.write(name)
        os.rename(head_tmp, self._head_path())
        return snap_id

    # -- data ---------------------------------------------------------------

    def _write_fileset(self, df: DataFrame, partition_by: list[str] | None) -> str:
        fs = "fs-" + uuid.uuid4().hex[:12]
        path = os.path.join(self.root, "data", fs)
        # spread the write across the cluster: AQE may coalesce the final
        # stage to a handful of partitions (right for shuffles, wrong for
        # the I/O-bound encode+write step, which then runs near-serially
        # and caps scaling). Round-robin repartition = every core writes.
        n_part = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        w = df.repartition(n_part).write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        return fs

    def read(self, snapshot_id: str | None = None) -> DataFrame | None:
        if snapshot_id is None:
            snap = self.current_snapshot()
        else:
            snap = next(
                (s for s in self.snapshots() if s["snapshot_id"] == snapshot_id), None
            )
        if snap is None or not snap["filesets"]:
            return None
        paths = [os.path.join(self.root, "data", fs) for fs in snap["filesets"]]
        return self.spark.read.option("mergeSchema", "false").parquet(*paths)

    def append(self, df: DataFrame, partition_by: list[str] | None = None) -> str:
        fs = self._write_fileset(df, partition_by)
        prev = self.current_snapshot()
        filesets = (prev["filesets"] if prev else []) + [fs]
        return self._commit(filesets, "append", {"added_filesets": 1})

    def overwrite(self, df: DataFrame, partition_by: list[str] | None = None) -> str:
        fs = self._write_fileset(df, partition_by)
        return self._commit([fs], "overwrite", {})

    def merge(
        self,
        df: DataFrame,
        keys: list[str],
        partition_by: list[str] | None = None,
    ) -> str:
        """Copy-on-write MERGE: WHEN MATCHED UPDATE, WHEN NOT MATCHED INSERT,
        keyed on `keys`. Existing rows whose key collides are replaced by the
        incoming row — idempotent upsert (reference :put semantics)."""
        cur = self.read()
        if cur is None:
            return self.overwrite(df, partition_by)
        kept = cur.join(df.select(*keys).dropDuplicates(keys), on=keys, how="left_anti")
        merged = kept.select(df.columns).unionByName(df)
        fs = self._write_fileset(merged, partition_by)
        return self._commit([fs], "merge", {"keys": keys})

    def delete_where(self, condition: str) -> str:
        cur = self.read()
        if cur is None:
            return self._commit([], "delete", {"condition": condition})
        remaining = cur.filter(~F.expr(condition))
        fs = self._write_fileset(remaining, None)
        return self._commit([fs], "delete", {"condition": condition})

    def diff_filesets(self, from_snapshot_id: str | None) -> DataFrame | None:
        """Rows in filesets added after `from_snapshot_id` (changelog read —
        the incremental-source analog of an Iceberg snapshot diff). Only
        meaningful across append commits."""
        snaps = self.snapshots()
        seen: set[str] = set()
        found = from_snapshot_id is None
        new_fs: list[str] = []
        for s in snaps:
            if found:
                new_fs.extend(fs for fs in s["filesets"] if fs not in seen)
            seen.update(s["filesets"])
            if s["snapshot_id"] == from_snapshot_id:
                found = True
        live = set(self.current_snapshot()["filesets"]) if self.current_snapshot() else set()
        new_fs = [fs for fs in dict.fromkeys(new_fs) if fs in live]
        if not new_fs:
            return None
        paths = [os.path.join(self.root, "data", fs) for fs in new_fs]
        return self.spark.read.parquet(*paths)
