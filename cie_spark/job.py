"""spark-submit entrypoint for the KG construction pipeline.

Run (local or cluster — only --master changes):

    spark-submit --py-files cie_spark.zip cie_spark/job.py \
        --events /root/testdata/sf0.01/events.parquet \
        --warehouse /tmp/kg_wh --master local[32] --shuffle-partitions 32

or with a synthetic corpus:

    spark-submit ... cie_spark/job.py --synthetic-convs 2000 --avg-turns 30

Prints one JSON line of run metrics (rows in, triples out, triples/sec) —
the measurement unit for the N-vs-4N scaling benchmark (BENCH/BASELINE.md).
Analog of the reference CLI `cie index` (cmd/cie/index.go:62-204).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="cie_spark KG construction job")
    ap.add_argument("--events", help="events parquet to derive transcripts from")
    ap.add_argument("--transcripts", help="transcripts parquet to ingest directly")
    ap.add_argument("--synthetic-convs", type=int, help="generate N synthetic conversations")
    ap.add_argument("--avg-turns", type=int, default=20)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--full", action="store_true", help="disable incremental delta")
    ap.add_argument("--no-prose", action="store_true", help="marker tiers only")
    ap.add_argument(
        "--resume", default="trust_checkpoint",
        choices=("trust_checkpoint", "force_reprocess", "fail_fast"),
        help="recovery policy after an interrupted run: trust_checkpoint "
             "converges via the hash delta + idempotent merges (default); "
             "force_reprocess replays everything; fail_fast verifies "
             "warehouse/checkpoint consistency and raises on divergence",
    )
    ap.add_argument(
        "--buckets", type=int, default=128,
        help="warehouse hash-bucket count (Iceberg practice: size to the "
             "TABLE — enough that an incremental rewrite touches a thin "
             "slice and a full write keeps every core busy, but not so many "
             "that commits schedule hundreds of near-empty file tasks)",
    )
    args = ap.parse_args(argv)

    from cie_spark.plans.pipeline import KGPipeline
    from cie_spark.session import get_spark
    from cie_spark.sources import gen

    spark = get_spark(
        app="cie_spark_job",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("WARN")

    if args.synthetic_convs:
        transcripts = gen.generate_transcripts(
            spark, n_convs=args.synthetic_convs, avg_turns=args.avg_turns, seed=args.seed
        )
    elif args.transcripts:
        transcripts = spark.read.parquet(args.transcripts)
    elif args.events:
        spark.read.parquet(args.events).createOrReplaceTempView("events")
        from cie_spark import spec

        transcripts = spark.sql(spec.TRANSCRIPTS_FROM_EVENTS_SQL)
    else:
        ap.error("one of --events / --transcripts / --synthetic-convs required")
        return 2

    # warm up executor python workers + Arrow path before the measured run
    # (a long-lived cluster amortizes this across jobs; a cold local JVM
    # would otherwise charge worker-import time to the first stage)
    import pandas as pd  # noqa: F401

    def _noop(batches):
        for b in batches:
            yield b

    spark.range(spark.sparkContext.defaultParallelism * 2).mapInPandas(
        _noop, "id long"
    ).count()

    pipe = KGPipeline(spark, args.warehouse, n_buckets=args.buckets)
    metrics = pipe.run(
        transcripts, incremental=not args.full, prose=not args.no_prose,
        resume=args.resume,
    )
    print(json.dumps(metrics))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
