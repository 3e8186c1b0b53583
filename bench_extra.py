"""Round-6 measurement harness (bench.py is FROZEN — extra numbers live here).

Per-query isolation of the bench.py workload: same data, same functions, same
count()-based timing methodology, but each query selectable from argv so one
operator can be measured without paying for the rest, plans can be captured
to plans/r06/, and jobs are labelled for the UI (guide §1.5).

Usage:
  python bench_extra.py [query ...]            # default: all bench queries
  BENCH_REPS=3 SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py
  PLAN_OUT=plans/r06 PLAN_TAG=before python bench_extra.py emb_near_dup

Prints one JSON line per query: {"query": name, "samples": [...], "median": s}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from cie_spark import spec  # noqa: E402
from cie_spark.operators import dedup, extract, link, simsearch, triples  # noqa: E402
from cie_spark.session import get_spark  # noqa: E402

REPS = int(os.environ.get("BENCH_REPS", "3"))
PLAN_OUT = os.environ.get("PLAN_OUT")  # e.g. plans/r06
PLAN_TAG = os.environ.get("PLAN_TAG", "plan")  # e.g. before / after


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app="cie_spark_bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    wanted = set(sys.argv[1:])

    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView("events")
    transcripts = spark.sql(spec.TRANSCRIPTS_FROM_EVENTS_SQL)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    state: dict = {}

    def _linked():
        # mirror of bench.py's e2e body: cache linked, count triples
        linked = link.link_mentions(
            spark, extract.extract_mentions(transcripts)
        ).cache()
        n = triples.all_triples(linked).count()
        if "linked" in state:
            state["linked"].unpersist()
        state["linked"], state["n_triples"] = linked, n
        return linked

    def _ensure_linked():
        if "linked" not in state:
            _linked()
        return state["linked"]

    def _qvec():
        row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
        return list(row[0])

    queries = {
        "kg_end_to_end": lambda: _linked(),
        "kg_calls_agg": lambda: triples.calls_triples(_ensure_linked())
        .groupBy("subj", "obj")
        .count()
        .count(),
        "kg_mentioned_with": lambda: triples.mentioned_with_triples(
            _ensure_linked()
        ).count(),
        "kg_cooccur_window": lambda: triples.mentioned_with_windowed(
            _ensure_linked()
        ).count(),
        "doc_dedup_exact": lambda: dedup.exact_groups(docs).count(),
        "doc_minhash_pairs": lambda: dedup.ngram_jaccard_pairs(
            docs, threshold=0.8
        ).count(),
        "doc_simhash_pairs": lambda: dedup.simhash_pairs(docs).count(),
        "ann_topk_bruteforce": lambda: simsearch.topk_bruteforce(
            emb, state["qvec"], 10
        ).count(),
        "ann_topk_lsh": lambda: simsearch.topk_lsh(emb, state["qvec"], 10).count(),
        "emb_near_dup": lambda: simsearch.cosine_near_dup_pairs(
            emb, threshold=0.9
        ).count(),
    }
    plan_fns = {
        "kg_end_to_end": lambda: triples.all_triples(
            link.link_mentions(spark, extract.extract_mentions(transcripts))
        ),
        "kg_cooccur_window": lambda: triples.mentioned_with_windowed(
            _ensure_linked()
        ),
        "kg_mentioned_with": lambda: triples.mentioned_with_triples(
            _ensure_linked()
        ),
        "doc_minhash_pairs": lambda: dedup.ngram_jaccard_pairs(docs, threshold=0.8),
        "doc_simhash_pairs": lambda: dedup.simhash_pairs(docs),
        "emb_near_dup": lambda: simsearch.cosine_near_dup_pairs(emb, threshold=0.9),
        "ann_topk_bruteforce": lambda: simsearch.topk_bruteforce(
            emb, state["qvec"], 10
        ),
        "ann_topk_lsh": lambda: simsearch.topk_lsh(emb, state["qvec"], 10),
        "doc_dedup_exact": lambda: dedup.exact_groups(docs),
    }

    names = [q for q in queries if not wanted or q in wanted]
    if any(n.startswith("ann") or n == "emb_near_dup" for n in names):
        state["qvec"] = _qvec()

    for name in names:
        fn = queries[name]
        samples = []
        for i in range(REPS):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.time()
            fn()
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(
            json.dumps(
                {
                    "query": name,
                    "samples": samples,
                    "median": round(statistics.median(samples), 3),
                    "sf": sf_dir,
                }
            ),
            flush=True,
        )
        if PLAN_OUT and name in plan_fns:
            os.makedirs(PLAN_OUT, exist_ok=True)
            df = plan_fns[name]()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"{PLAN_OUT}/{name}_{PLAN_TAG}.txt", "w") as fh:
                fh.write(plan)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
