"""SparkSession factory tuned for the KG-construction workload.

Scale posture (set once, here, so every entrypoint inherits it):

- AQE on (runtime re-plan, skew-join splitting, partition coalescing) — the
  local analog of what saves a 1000-executor run from a bad static plan.
- Arrow on — every pandas UDF crosses the JVM/Python boundary in columnar
  batches, never row-at-a-time.
- shuffle partitions sized to cores locally; on a real cluster this is set
  proportional to total executor cores by the submitter (see bench.py).
- UTC session timezone so results compare bit-exactly against DuckDB oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app: str = "cie_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config."""
    cpus = DEFAULT_CPUS
    if master is None:
        master = f"local[{cpus}]"
    elif master.startswith("local[") and master != "local[*]":
        try:
            cpus = int(master[len("local[") : -1])
        except ValueError:
            pass
    if shuffle_partitions is None:
        # proportional to parallelism: keeps per-partition work constant as
        # cores scale (the N vs 4N scaling-efficiency criterion depends on it)
        shuffle_partitions = max(cpus, 8)

    b = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        # coalescing ON: repeated pinned scaling runs on the 10M-turn corpus
        # measured better wall time AND better N->4N efficiency with it on
        # (0.78 vs 0.71 — a single A/B probe suggesting otherwise was run
        # variance); partition counts here are already sized to cores, so
        # coalescing rarely triggers, and when it does it is right.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # NB: spark.sql.limit.initialNumPartitions is deliberately NOT set
        # here any more — session-wide it de-short-circuits every
        # limit/first/isEmpty probe (CLI row caps, consistency checks, the
        # local-tier size probes). The one caller that wants all-partitions-
        # in-one-round semantics (the vocabulary-bounded surface collect)
        # scopes it locally: link.py::_collect_and_link_local.
        # TIMESTAMP_MICROS, not the INT96 default: INT96 parquet columns
        # carry no footer min/max statistics (pyarrow: has_min_max=False),
        # which silently disabled the manifest ts-bounds harvesting that
        # time-range scan pruning depends on (ADVICE r4 medium) — and INT96
        # is deprecated in the parquet spec anyway
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # local mode: shuffle/spill to tmpfs when available — with 32 task
    # threads in one JVM, disk-backed shuffle files serialize on I/O and
    # cap scaling; a real cluster gets this from NVMe-local scratch
    if os.path.isdir("/dev/shm"):
        shm = "/dev/shm/spark-local"
        os.makedirs(shm, exist_ok=True)
        b = b.config("spark.local.dir", shm)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
