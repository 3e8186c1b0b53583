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


def test_jaccard_exact_complete(spark):
    """Exact inverted-index Jaccard finds every pair >= threshold (including
    ones LSH might miss) and agrees with a python oracle."""
    docs = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g x"),
        (3, "p q r s t u v w"),
        (4, "a b c d e f g h"),  # exact dup of 1
    ]
    d = _docs(spark, docs)
    got = {(r.doc_a, r.doc_b): r.jaccard for r in dedup.jaccard_pairs_exact(d, threshold=0.3).collect()}

    def sh(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    expected = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = sh(docs[i][1]), sh(docs[j][1])
            jac = len(a & b) / len(a | b)
            if jac >= 0.3:
                expected[(docs[i][0], docs[j][0])] = round(jac, 4)
    assert got == expected
    assert got[(1, 4)] == 1.0


def test_cosine_near_dup_exact(spark):
    from cie_spark.operators import simsearch

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.99, 0.1, 0.0]),
            (3, [0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    got = {(r.id_a, r.id_b) for r in simsearch.cosine_near_dup_exact(emb, threshold=0.9).collect()}
    assert got == {(1, 2)}


def test_simhash_deterministic(spark):
    d = _docs(spark, [(1, "alpha beta gamma"), (2, "alpha beta gamma")])
    from cie_spark.operators.dedup import simhash_col
    from pyspark.sql import functions as F

    vals = [r.sh for r in d.select(simhash_col(F.col("text")).alias("sh")).collect()]
    assert vals[0] == vals[1]


def test_minhash_bands_udf_matches_expression(spark):
    """The numpy xxhash64 banding UDF must be BIT-IDENTICAL to the
    F.xxhash64 expression formulation for every (band_idx, band_sig) —
    including empty/None texts (zero-min chain) and short texts (< k
    words). Any drift silently changes the candidate set."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),
        (3, "some other words entirely here now then"),
        (4, ""),
        (5, None),
        (6, "ab"),  # single-word -> short-shingle path
        (7, "x " * 200),  # repeated token
    ] + [(100 + i, f"doc {i} shared prefix words tail{i % 7}") for i in range(50)]
    d = _docs(spark, rows)
    got = sorted(
        (r.doc_id, r.band_idx, r.band_sig)
        for r in dedup.minhash_signatures(d, bands=16, rows=4).collect()
    )
    ref = sorted(
        (r.doc_id, r.band_idx, r.band_sig)
        for r in dedup.minhash_signatures(d, bands=16, rows=4, expr=True).collect()
    )
    assert got == ref
    # and at the other operating point (the default rows=2)
    got2 = sorted(
        (r.doc_id, r.band_idx, r.band_sig)
        for r in dedup.minhash_signatures(d).collect()
    )
    ref2 = sorted(
        (r.doc_id, r.band_idx, r.band_sig)
        for r in dedup.minhash_signatures(d, expr=True).collect()
    )
    assert got2 == ref2


def test_xxh64_bytes_matches_spark(spark):
    """The vectorized numpy xxHash64 must agree with Spark's XxHash64
    expression byte-for-byte across every length class (empty, <4, <8,
    8..31 with 4-byte and byte tails, >= 32 stripe path)."""
    import random

    import numpy as np
    from pyspark.sql import functions as F

    from cie_spark.functions import xxh64_bytes_array

    random.seed(3)
    strs = ["", " ", "a", "abc", "abcd", "abcdefg", "abcdefgh", "x" * 31,
            "y" * 32, "z" * 33, "w" * 64, "v" * 100]
    strs += [
        "".join(random.choice("abc XYZ01_") for _ in range(random.randrange(0, 80)))
        for _ in range(500)
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strs)], "i long, s string"
    )
    ref = {r.i: r.h for r in df.select("i", F.xxhash64("s").alias("h")).collect()}
    got = xxh64_bytes_array([s.encode() for s in strs]).view(np.int64)
    assert all(ref[i] == int(got[i]) for i in range(len(strs)))


def test_shingle_base_udf_matches_expression(spark):
    """The words->shingle->hash UDF must return the identical hs arrays
    (values AND first-occurrence order) as the all-JVM expression twin."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "a b"),          # short-text path (< k words -> one shingle)
        (3, ""),
        (4, None),
        (5, "  padded   whitespace\ttabs\nnewlines  "),
        (6, "Dup dup DUP dup dup dup"),  # repeated shingles -> distinct
    ] + [(10 + i, f"words {i} more shared tail {i % 5} end") for i in range(40)]
    d = _docs(spark, rows)
    got = {
        r.doc_id: list(r.hs)
        for r in dedup.hashed_shingle_base(d).collect()
    }
    ref = {
        r.doc_id: list(r.hs)
        for r in dedup.hashed_shingle_base(d, expr=True).collect()
    }
    assert got == ref


def test_jaccard_local_verify_agrees_with_join(spark, monkeypatch):
    """The driver-local verify tier (bounded pair/byte caps) must return
    the identical pair set and identical rounded jaccard values as the
    distributed join verify, including empty-result and None-text cases."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),
        (3, "the quick brown fox jumps over the lazy cat today"),
        (4, "completely different text with no overlap at all here"),
        (5, None),
        (6, ""),
    ] + [(100 + i, f"shared prefix words alpha beta gamma {i % 3} tail") for i in range(30)]
    d = _docs(spark, rows)
    fast = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(d, threshold=0.5).collect()
    )
    monkeypatch.setattr(dedup, "LOCAL_VERIFY_MAX_PAIRS", 0)
    slow = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(d, threshold=0.5).collect()
    )
    assert fast, "agreement test must compare non-empty results"
    assert fast == slow
    # empty-candidate case: schema and zero rows, no failure
    empty = dedup.ngram_jaccard_pairs(
        _docs(spark, [(1, "aa bb cc dd"), (2, "ee ff gg hh")]), threshold=0.9
    )
    assert empty.columns == ["doc_a", "doc_b", "jaccard"]
    assert empty.count() == 0
