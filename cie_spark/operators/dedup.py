"""Deduplication operators over document tables.

Five tiers, cheap to expensive, all shuffle-conscious:

- exact          hash-groupBy on normalized-text digest (one shuffle)
- ngram_jaccard  word-shingle Jaccard >= threshold within LSH buckets
- minhash_lsh    MinHash band signatures -> bucket join -> verify
- simhash        64-bit simhash, hamming-distance candidate pairs by
                 band-rotation blocking
- embedding      cosine near-dup over an embedding column (see simsearch)

The scale story for every near-dup tier is the same: NEVER all-pairs.
Candidates come from an equi-join on a blocking key (band signature /
simhash band), so the shuffle is keyed and skew is bounded by bucket size;
verification runs only on candidates. Dedup resolution is deterministic:
keep the minimum doc_id per duplicate group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _norm_text():
    return F.regexp_replace(
        F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))), r"\s+", " "
    )


def exact_groups(docs: DataFrame) -> DataFrame:
    """Exact-dup groups by md5(norm text): (fingerprint, n_dups, keep_id)."""
    return (
        docs.select("doc_id", F.md5(_norm_text()).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_id"))
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Keep one doc (min doc_id) per exact-dup group — returns survivors."""
    keep = exact_groups(docs).select(F.col("keep_id").alias("doc_id"))
    return docs.join(keep, on="doc_id", how="left_semi")


def _word_shingles(text_col, k: int = 3):
    """Array of k-word shingles of the normalized text."""
    words = F.split(
        F.regexp_replace(F.trim(F.lower(text_col)), r"\s+", " "), " "
    )
    n = F.size(words)
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), n - k),
                lambda i: F.concat_ws(
                    " ", F.slice(words, i + 1, k)
                ),
            )
        ),
    ).otherwise(F.array(F.concat_ws(" ", words)))


def minhash_signatures(
    docs: DataFrame, *, bands: int = 16, rows: int = 2, shingle_words: int = 3
) -> DataFrame:
    """(doc_id, band_idx, band_sig) — LSH banding of word-shingle minhashes.

    All built-ins: shingles via transform/slice, minhash via
    array_min(transform(xxhash64)), band sig via xxhash64 of the row mins.
    """
    sh = _word_shingles(F.coalesce(F.col("text"), F.lit("")), shingle_words)

    def salted_hash(h: int):
        return lambda x: F.xxhash64(F.lit(h), x)

    band_cols = []
    for b in range(bands):
        mins = [
            F.array_min(F.transform(sh, salted_hash(b * rows + r)))
            for r in range(rows)
        ]
        band_cols.append(F.xxhash64(F.lit(b), *mins))
    return docs.select(
        "doc_id", F.posexplode(F.array(*band_cols)).alias("band_idx", "band_sig")
    )


def minhash_candidates(docs: DataFrame, **kw) -> DataFrame:
    """Candidate near-dup pairs (a < b) sharing >= 1 LSH band."""
    sig = minhash_signatures(docs, **kw)
    return (
        sig.alias("x")
        .join(sig.alias("y"), on=["band_idx", "band_sig"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )


def ngram_jaccard_pairs(
    docs: DataFrame, *, threshold: float = 0.8, shingle_words: int = 3, **kw
) -> DataFrame:
    """Near-dup pairs with exact word-shingle Jaccard >= threshold, verified
    on LSH candidates only (blocking-then-verify)."""
    cands = minhash_candidates(docs, shingle_words=shingle_words, **kw)
    sh = docs.select(
        "doc_id",
        _word_shingles(F.coalesce(F.col("text"), F.lit("")), shingle_words).alias("sh"),
    )
    j = (
        cands.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), on="doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), on="doc_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        j.withColumn("jaccard", F.when(union > 0, inter / union).otherwise(F.lit(0.0)))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash_col(text_col, bits: int = 64):
    """64-bit simhash over word tokens — pure expressions.

    Classic simhash sums +1/-1 per bit weighted by token hash; here, for
    each bit position we count tokens whose xxhash64 has that bit set and
    compare against half the token count. Deterministic, vectorized.
    """
    words = F.filter(
        F.split(F.regexp_replace(F.trim(F.lower(text_col)), r"\s+", " "), " "),
        lambda w: F.length(w) > 0,
    )
    hashes = F.transform(words, lambda w: F.xxhash64(w))
    n = F.size(hashes)
    def mask(b: int) -> int:
        """Signed-64 literal with bit b set (bit 63 = long min value)."""
        return (1 << b) if b < 63 else -(1 << 63)

    def has_bit(m: int):
        # NB: F.filter treats a 2-arg lambda as (element, index) — keep 1-arg
        return lambda h: h.bitwiseAND(F.lit(m)) != 0

    bit_exprs = []
    for b in range(bits):
        ones = F.size(F.filter(hashes, has_bit(mask(b))))
        bit_exprs.append(
            F.when(ones * 2 >= n, F.lit(mask(b))).otherwise(F.lit(0).cast("long"))
        )
    total = bit_exprs[0]
    for e in bit_exprs[1:]:
        total = total.bitwiseOR(e)
    return F.when(n > 0, total).otherwise(F.lit(0).cast("long"))


def simhash_pairs(docs: DataFrame, *, max_hamming: int = 3, bands: int = 4) -> DataFrame:
    """Near-dup pairs by simhash hamming distance <= max_hamming.

    Blocking: split the 64-bit simhash into `bands` 16-bit bands; by
    pigeonhole, any pair within hamming distance < bands shares at least one
    exact band -> equi-join per band, verify with bit_count(xor)."""
    sh = docs.select("doc_id", simhash_col(F.col("text")).alias("sh"))
    parts = sh.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sh"), 16 * b).bitwiseAND(F.lit(0xFFFF))
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    cand = (
        parts.alias("x")
        .join(parts.alias("y"), on=["band_idx", "band_val"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.sh").alias("sh_a"),
            F.col("y.sh").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", ham).filter(
        F.col("hamming") <= max_hamming
    ).select("doc_a", "doc_b", "hamming")
