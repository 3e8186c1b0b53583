"""End-to-end KG construction plan: the analog of LocalPipeline.Run
(reference pkg/ingestion/local_pipeline.go:347-605), Spark-first.

Stages (each records a lineage row with counts + timing + snapshot id):

  1. source      transcripts (full, or incremental delta by conv_id)
  2. extract     mapInPandas mention extraction (operators/extract.py)
  3. link        3-tier entity linking (operators/link.py)
  4. canon       connected-components alias closure (operators/canon.py)
  5. triples     (subj,pred,obj) emission (operators/triples.py)
  6. materialize MERGE into triples/entities snapshot tables, keyed on the
                 stable edge identity -> idempotent re-runs (resume safety)
  7. checkpoint  processed-conversations table update (hash-delta analog)

Incremental semantics (analog of delta.go/hash_delta.go/checkpoint.go):
a conversation is reprocessed iff its content hash changed; stale edges for
reprocessed conversations are deleted before merge (cascading delete analog,
embedded.go:336-391). The committed snapshot *is* the checkpoint: a killed
run leaves the previous snapshot intact, and re-running converges because
every write is an idempotent keyed MERGE.
"""

from __future__ import annotations

import time
import uuid
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cie_spark import schema
from cie_spark.operators import canon, extract, link, triples
from cie_spark.sources.io_snapshots import SnapshotTable


def _now() -> datetime:
    return datetime.now(timezone.utc)


class KGPipeline:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        self.triples = SnapshotTable(spark, f"{warehouse}/triples")
        self.entities = SnapshotTable(spark, f"{warehouse}/entities")
        self.lineage = SnapshotTable(spark, f"{warehouse}/lineage")
        self.processed = SnapshotTable(spark, f"{warehouse}/processed_convs")

    # -- lineage --------------------------------------------------------

    def _record(self, run_id: str, rows: list[dict]) -> None:
        df = self.spark.createDataFrame(
            [
                (
                    run_id,
                    r["stage"],
                    r.get("partition_key"),
                    r.get("rows_in"),
                    r.get("rows_out"),
                    r.get("errors", 0),
                    r.get("started"),
                    r.get("finished"),
                    r.get("snapshot_id"),
                )
                for r in rows
            ],
            schema.LINEAGE,
        )
        self.lineage.append(df)

    # -- delta ----------------------------------------------------------

    def _conv_hashes(self, transcripts: DataFrame) -> DataFrame:
        """Per-conversation content hash: order-independent aggregate of
        per-turn row hashes (hash-delta analog, hash_delta.go:48-157)."""
        row_h = F.sha2(
            F.concat_ws(
                "\x1f",
                F.col("turn_idx").cast("string"),
                F.coalesce(F.col("role"), F.lit("")),
                F.coalesce(F.col("text"), F.lit("")),
                F.coalesce(F.col("tool"), F.lit("")),
            ),
            256,
        )
        return transcripts.groupBy("conv_id").agg(
            F.sha2(F.concat_ws("", F.sort_array(F.collect_list(row_h))), 256).alias(
                "conv_hash"
            ),
            F.count("*").cast("long").alias("n_turns"),
        )

    def delta_convs(self, transcripts: DataFrame) -> DataFrame:
        """conv_ids that are new or changed vs the processed checkpoint
        (full-outer-join delta, exactly the reference's hash_delta shape)."""
        current = self._conv_hashes(transcripts)
        prev = self.processed.read()
        if prev is None:
            return current
        j = current.alias("c").join(
            prev.alias("p"), on="conv_id", how="left"
        )
        return j.filter(
            F.col("p.conv_hash").isNull()
            | (F.col("c.conv_hash") != F.col("p.conv_hash"))
        ).select("conv_id", F.col("c.conv_hash").alias("conv_hash"), F.col("c.n_turns").alias("n_turns"))

    # -- run --------------------------------------------------------------

    def run(
        self,
        transcripts: DataFrame,
        *,
        incremental: bool = True,
        prose: bool = True,
        run_id: str | None = None,
    ) -> dict:
        run_id = run_id or f"run-{uuid.uuid4().hex[:12]}"
        lineage_rows: list[dict] = []
        t0 = time.time()

        # 1. source / delta. NB: the transcript frame (with its fat `text`
        # column) is deliberately NOT cached — it is scanned exactly twice
        # (conv-hash delta + extraction); caching ~100 TB of text trades two
        # columnar scans for GC/storage pressure that caps throughput.
        started = _now()
        if incremental:
            delta = self.delta_convs(transcripts).cache()
        else:
            delta = self._conv_hashes(transcripts).cache()
        # one action: delta count + affected-turn total together
        n_delta, rows_in = delta.agg(
            F.count("*"), F.coalesce(F.sum("n_turns"), F.lit(0))
        ).first()
        n_delta, rows_in = int(n_delta), int(rows_in)
        if incremental:
            scoped = transcripts.join(
                delta.select("conv_id").hint("broadcast")
                if n_delta < 100_000
                else delta.select("conv_id"),
                on="conv_id",
                how="left_semi",
            )
        else:
            scoped = transcripts
        lineage_rows.append(
            dict(stage="source", rows_in=rows_in, rows_out=rows_in,
                 partition_key=f"convs={n_delta}", started=started, finished=_now())
        )
        if rows_in == 0:
            delta.unpersist(); scoped.unpersist()
            self._record(run_id, lineage_rows)
            return {"run_id": run_id, "rows_in": 0, "triples": 0,
                    "seconds": time.time() - t0, "skipped": True}

        # 2. extract (no separate count: the first linking action
        # materializes this cache, and n_mentions == n_linked by
        # construction — linking is row-preserving)
        started = _now()
        mentions = extract.extract_mentions(scoped, prose=prose).cache()
        extract_started = started

        # 3. link (+ 4. canon on the small distinct-surface link map)
        started = _now()
        ents = mentions.filter(F.col("kind") == "entity")
        # cache the raw linkmap before canonicalization: the alias-closure
        # check self-joins it, and re-deriving the fuzzy-tier DAG (heavy
        # codegen) twice is pure fixed cost
        linkmap = link.link_surfaces(self.spark, ents.select("surface")).cache()
        linkmap = canon.canonicalize_linkmap(linkmap).cache()
        n_surfaces = linkmap.count()
        linked_ents = ents.join(
            F.broadcast(linkmap.select("surface", "entity_id", "link_tier")),
            on="surface", how="left",
        )
        tool_rows = mentions.filter(F.col("kind") == "tool").select(
            *mentions.columns,
            F.concat(F.lit("tool:"), link.CF.norm_col("surface")).alias("entity_id"),
            F.lit("dict").alias("link_tier"),
        )
        linked = linked_ents.select(*tool_rows.columns).unionByName(tool_rows).cache()
        n_linked = linked.count()
        n_mentions = n_linked  # linking is row-preserving
        lineage_rows.append(
            dict(stage="extract", rows_in=rows_in, rows_out=n_mentions,
                 started=extract_started, finished=started)
        )
        lineage_rows.append(
            dict(stage="link+canon", rows_in=n_mentions, rows_out=n_linked,
                 partition_key=f"surfaces={n_surfaces}",
                 started=started, finished=_now())
        )

        # 5. triples
        started = _now()
        trips = triples.all_triples(linked, scoped).cache()
        n_triples = trips.count()
        lineage_rows.append(
            dict(stage="triples", rows_in=n_linked, rows_out=n_triples,
                 started=started, finished=_now())
        )

        # 6. materialize (delete stale convs, then idempotent keyed MERGE)
        started = _now()
        if incremental and self.triples.read() is not None:
            convs = [r["conv_id"] for r in delta.select("conv_id").collect()]
            if convs:
                in_list = ",".join(f"'{c}'" for c in convs)
                self.triples.delete_where(f"conv_id IN ({in_list})")
        snap_id = self.triples.merge(
            trips, keys=["subj", "pred", "obj", "conv_id", "turn_idx"],
            partition_by=["pred"],
        )
        from cie_spark.functions import mock_embedding

        ent_df = (
            linked.groupBy("entity_id")
            .agg(
                F.min("kind").alias("kind"),
                F.collect_set("surface").alias("surfaces"),
            )
            .select(
                "entity_id",
                "kind",
                F.regexp_replace("entity_id", "^(ent:|tool:)", "").alias(
                    "canonical_name"
                ),
                "surfaces",
                # A19 analog: vectorized (deterministic) embedding enrich of
                # the vertex table — swap mock_embedding for a real provider
                # UDF in production; the dataflow is identical
                mock_embedding(
                    F.regexp_replace("entity_id", "^(ent:|tool:)", "")
                ).alias("embedding"),
            )
        )
        self.entities.merge(ent_df, keys=["entity_id"])
        lineage_rows.append(
            dict(stage="materialize", rows_in=n_triples, rows_out=n_triples,
                 started=started, finished=_now(), snapshot_id=snap_id)
        )

        # 7. checkpoint processed conversations
        started = _now()
        self.processed.merge(delta.select("conv_id", "conv_hash", "n_turns"), keys=["conv_id"])
        lineage_rows.append(
            dict(stage="checkpoint", rows_in=n_delta, rows_out=n_delta,
                 started=started, finished=_now())
        )

        self._record(run_id, lineage_rows)
        secs = time.time() - t0
        for df in (delta, scoped, mentions, linkmap, linked, trips):
            df.unpersist()
        return {
            "run_id": run_id,
            "rows_in": rows_in,
            "mentions": n_mentions,
            "triples": n_triples,
            "seconds": secs,
            "triples_per_sec": n_triples / secs if secs > 0 else 0.0,
            "snapshot_id": snap_id,
        }
