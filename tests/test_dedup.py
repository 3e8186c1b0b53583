"""Dedup tiers: exact, minhash-LSH candidates + Jaccard verify, simhash."""

from __future__ import annotations

from cie_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark):
    d = _docs(
        spark,
        [
            (1, "hello  world"),
            (2, "Hello world"),  # same after normalization
            (3, "different doc"),
            (4, None),
            (5, ""),
        ],
    )
    groups = {r.keep_id: r.n_dups for r in dedup.exact_groups(d).collect()}
    assert groups[1] == 2  # docs 1+2 collapse
    assert groups[3] == 1
    assert groups[4] == 2  # None and '' normalize identically
    survivors = sorted(r.doc_id for r in dedup.exact_dedup(d).collect())
    assert survivors == [1, 3, 4]


def test_ngram_jaccard_near_dup(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    d = _docs(
        spark,
        [
            (1, base),
            (2, base.replace("today", "tomorrow")),  # near dup
            (3, "completely unrelated text about databases and sparks"),
        ],
    )
    pairs = {(r.doc_a, r.doc_b) for r in dedup.ngram_jaccard_pairs(d, threshold=0.5).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_simhash_near_dup(spark):
    base = " ".join(f"word{i}" for i in range(60))
    d = _docs(
        spark,
        [
            (1, base),
            (2, base + " extra"),  # tiny perturbation -> small hamming
            (3, " ".join(f"other{i}" for i in range(60))),
        ],
    )
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in dedup.simhash_pairs(d, max_hamming=6).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_deterministic(spark):
    d = _docs(spark, [(1, "alpha beta gamma"), (2, "alpha beta gamma")])
    from cie_spark.operators.dedup import simhash_col
    from pyspark.sql import functions as F

    vals = [r.sh for r in d.select(simhash_col(F.col("text")).alias("sh")).collect()]
    assert vals[0] == vals[1]
