"""Incremental-reindex benchmark: the analog of the reference's
'incremental indexing, 10 changed files: ~3-5 s vs ~2 min full (≈40×)'
(reference docs/architecture.md:419-421).

Shape matches the reference's file-delta path: transcripts live in a
bucketed snapshot table (the Iceberg analog); the full run indexes the whole
table; the "edit" upserts K conversations' turns (a new snapshot); the
incremental run uses the snapshot diff to read ONLY changed files + the
affected conversations' buckets — unchanged data is never opened. Usage:

    python BENCH/run_incremental.py [--convs 20000] [--changed 10] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=20000)
    ap.add_argument("--avg-turns", type=int, default=40)
    ap.add_argument("--changed", type=int, default=10)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument(
        "--buckets", type=int, default=128,
        help="hash buckets for source + warehouse tables (Iceberg practice: "
             "scale with table size so a delta rewrite touches a small slice)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cie_spark.plans.pipeline import KGPipeline
    from cie_spark.session import get_spark
    from cie_spark.sources.gen import generate_transcripts
    from cie_spark.sources.io_snapshots import SnapshotTable

    spark = get_spark(
        app="cie_incremental_bench",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.cores,
    )
    spark.sparkContext.setLogLevel("ERROR")
    wh = tempfile.mkdtemp(prefix="cie_incr_")
    src = tempfile.mkdtemp(prefix="cie_src_")
    try:
        # setup (untimed): land the corpus in the source table
        t = generate_transcripts(spark, n_convs=args.convs, avg_turns=args.avg_turns)
        turns = SnapshotTable(
            spark, src, bucket_key="conv_id", n_buckets=args.buckets
        )
        turns.overwrite(t)

        pipe = KGPipeline(spark, wh, n_buckets=args.buckets)
        # wall-clock around run_from_table, not run()'s self-report: the
        # snapshot-diff hash pass (changed filesets + bucket-pruned
        # processed read) runs BEFORE run() starts its timer, so the
        # self-report undercounts the incremental leg
        t0 = time.monotonic()
        full = pipe.run_from_table(turns)
        full_wall = time.monotonic() - t0

        # the "edit" (untimed ingestion): upsert turn 1 of K conversations
        changed_ids = [f"conv-{i:06d}" for i in range(args.changed)]
        edited = (
            turns.read()
            .filter(F.col("conv_id").isin(changed_ids) & (F.col("turn_idx") == 1))
            .withColumn(
                "text", F.lit("edited: now about [[Terraform]] and [[Grafana]]")
            )
        )
        turns.merge(edited, keys=["conv_id", "turn_idx"])

        t0 = time.monotonic()
        incr = pipe.run_from_table(turns)
        incr_wall = time.monotonic() - t0

        out = {
            "convs": args.convs,
            "buckets": args.buckets,
            "changed": args.changed,
            "full_seconds": round(full_wall, 2),
            "full_triples": full["triples"],
            "incremental_seconds": round(incr_wall, 2),
            "incremental_triples": incr["triples"],
            "speedup": round(full_wall / incr_wall, 1) if incr_wall else None,
        }
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(wh, ignore_errors=True)
        shutil.rmtree(src, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
