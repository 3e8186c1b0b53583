"""Watch mode: incremental reindex as a Structured Streaming job.

Analog of the reference's fsnotify watcher + debounce + single-flight
incremental reindex (cmd/cie/watch.go:28-127). Spark-first shape:

- `readStream` over the transcripts directory (file-source picks up newly
  landed parquet files — the fsnotify analog),
- each micro-batch is first UPSERTED into a bronze `turns` snapshot table
  keyed on (conv_id, turn_idx); the affected conversations are then read
  back IN FULL (bucket-pruned point lookup) and fed to the SAME incremental
  pipeline used in batch mode. This makes cross-batch conversations correct:
  a conversation whose turns arrive across multiple files/batches is always
  re-indexed from its complete accumulated turn set, never from a partial
  batch (which would silently drop earlier turns' edges and checkpoint a
  partial hash).
- `Trigger.AvailableNow` = drain-everything-then-stop (cron-style catch-up);
  a processingTime trigger gives the continuous watch with the trigger
  interval playing the debounce role.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from cie_spark import schema
from cie_spark.plans.pipeline import SMALL_DELTA_CONVS, KGPipeline
from cie_spark.sources.io_snapshots import SnapshotTable


def watch(
    spark: SparkSession,
    transcripts_dir: str,
    warehouse: str,
    *,
    checkpoint_dir: str,
    available_now: bool = True,
    trigger_seconds: int = 10,
    prose: bool = True,
) -> StreamingQuery:
    """Start the streaming incremental indexer; returns the query handle.

    With available_now=True the query drains all currently-available input
    and stops (use q.awaitTermination()); otherwise it keeps watching with a
    processing-time trigger (the 2s-debounce analog).
    """
    pipe = KGPipeline(spark, warehouse)
    turns = SnapshotTable(
        spark, f"{warehouse}/turns", bucket_key="conv_id", n_buckets=128
    )
    stream = (
        spark.readStream.schema(schema.TRANSCRIPTS)
        .option("maxFilesPerTrigger", 64)
        .parquet(transcripts_dir)
    )

    def _batch(df, epoch_id: int) -> None:
        # single-flight by construction: foreachBatch is serialized per query
        batch = df.localCheckpoint(eager=True)  # pin: stream frames are one-pass
        # one bounded collect decides empty AND small in a single job round
        # (replaces the former isEmpty probe): a micro-batch is latency-
        # critical, and at maxFilesPerTrigger=64 its conversation set is
        # nearly always driver-trivial. ids may contain None (a null
        # conv_id in a landed file): buckets_for_keys covers the null
        # bucket, read_keys drops the null rows from indexing — the same
        # outcome the left-semi join gave them.
        ids = [
            r[0]
            for r in batch.select("conv_id")
            .dropDuplicates(["conv_id"])
            .limit(SMALL_DELTA_CONVS + 1)
            .collect()
        ]
        if not ids:
            return
        if len(ids) <= SMALL_DELTA_CONVS:
            # small-batch fast path, same shape as the pipeline's: buckets
            # hashed in-process (no discovery job on the merge), affected
            # conversations re-read via a bucket-pruned literal lookup (no
            # join). pipe.run() then takes its own small-delta path for the
            # same ids.
            # 1. accumulate the batch into the bronze turns table (idempotent
            #    upsert keyed on (conv_id, turn_idx) — replays are safe)
            turns.merge(
                batch, keys=["conv_id", "turn_idx"],
                aff_hint=turns.buckets_for_keys(ids),
            )
            # 2. re-read the FULL turn set of every affected conversation
            full = turns.read_keys(ids)
            if full is None:  # only-null conv_ids: bronze updated, no index
                return
        else:
            turns.merge(batch, keys=["conv_id", "turn_idx"])
            convs = batch.select("conv_id").dropDuplicates(["conv_id"])
            full = turns.read_matching(convs, ["conv_id"])
        # 3. same incremental pipeline as batch mode (hash delta + purge +
        #    idempotent MERGE)
        pipe.run(full, incremental=True, prose=prose, run_id=f"stream-{epoch_id}")

    writer = stream.writeStream.foreachBatch(_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
