"""Watch mode: incremental reindex as a Structured Streaming job.

Analog of the reference's fsnotify watcher + debounce + single-flight
incremental reindex (cmd/cie/watch.go:28-127). Spark-first shape:

- `readStream` over the transcripts directory (file-source picks up newly
  landed parquet files — the fsnotify analog),
- `foreachBatch` runs the SAME incremental pipeline used in batch mode
  (per-conversation hash delta + idempotent MERGE), so streaming and batch
  share one code path,
- `Trigger.AvailableNow` = drain-everything-then-stop (cron-style catch-up);
  a processingTime trigger gives the continuous watch with the trigger
  interval playing the debounce role.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from cie_spark import schema
from cie_spark.plans.pipeline import KGPipeline


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
    stream = (
        spark.readStream.schema(schema.TRANSCRIPTS)
        .option("maxFilesPerTrigger", 64)
        .parquet(transcripts_dir)
    )

    def _batch(df, epoch_id: int) -> None:
        # single-flight by construction: foreachBatch is serialized per query
        pipe.run(df, incremental=True, prose=prose, run_id=f"stream-{epoch_id}")

    writer = stream.writeStream.foreachBatch(_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
