"""Text analysis over document tables: token counts, quality metrics,
language ID heuristic, fingerprinting.

The training-data-pipeline companion to the KG extractor. Everything here is
built-in Column expressions (JVM, whole-stage codegen) — no Python in the
hot path. Analog query shapes: the reference's grep/search text operators
(tools/grep.go, tools/search.go) and code-text truncation (A11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "que", "de", "los"],
    "fr": ["le", "la", "les", "des", "est"],
    "de": ["der", "die", "das", "und", "ist"],
}

STOPWORDS_EN = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for", "on",
]


def token_count_col(text="text"):
    """Whitespace token count; empty/blank -> 0. Shared definition with the
    SQL oracles (see __spark_entry__)."""
    t = F.trim(F.coalesce(F.col(text) if isinstance(text, str) else text, F.lit("")))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def doc_token_stats(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        token_count_col("text").alias("n_tokens"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("n_chars"),
    )


def doc_quality(docs: DataFrame) -> DataFrame:
    """Integer quality signals: char/alpha/digit/punct counts, stopword hits,
    mean-word-length proxy. Integer-valued on purpose so results are
    bit-comparable across engines."""
    text = F.coalesce(F.col("text"), F.lit(""))
    lower = F.lower(text)
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(lower, "[^a-z]", ""))
    n_digit = F.length(F.regexp_replace(text, "[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    n_tokens = token_count_col(text)
    stop_hits = sum(
        (
            F.size(F.split(F.concat(F.lit(" "), lower, F.lit(" ")), f" {w} ")) - 1
            for w in STOPWORDS_EN
        ),
        F.lit(0),
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_alpha.alias("n_alpha"),
        n_digit.alias("n_digit"),
        n_punct.alias("n_punct"),
        n_tokens.alias("n_tokens"),
        stop_hits.cast("int").alias("n_stopword_hits"),
        (n_chars >= 100).cast("int").alias("len_ok"),
    )


def doc_lang_guess(docs: DataFrame) -> DataFrame:
    """Stopword-marker language ID: score = marker-word hits per language,
    argmax with deterministic tie-break by language code."""
    lower = F.concat(F.lit(" "), F.lower(F.coalesce(F.col("text"), F.lit(""))), F.lit(" "))
    scores = []
    for lang, words in sorted(LANG_MARKERS.items()):
        s = sum(
            (F.size(F.split(lower, f" {w} ")) - 1 for w in words), F.lit(0)
        )
        scores.append(F.struct(s.cast("long").alias("score"), F.lit(lang).alias("lang")))
    # argmax: sort structs -> max is (highest score, lexicographically LAST
    # lang); to tie-break by FIRST lang we invert below
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    sc["score"].alias("score"),
                    # invert lang ordering for deterministic first-code wins
                    F.lit(-i).cast("int").alias("inv"),
                    sc["lang"].alias("lang"),
                )
                for i, sc in enumerate(scores)
            ]
        )
    )
    return docs.select(
        "doc_id",
        best["lang"].alias("lang_guess"),
        best["score"].alias("lang_score"),
    )


def truncate_texts(
    df: DataFrame, *, max_chars: int = 3000, text_col: str = "text"
):
    """A11 code-text truncation: cap `text_col` at max_chars, flag truncated
    rows, and count them with an Observation (the truncation-counter metric
    rides the caller's next action for free — no extra pass). Returns
    (df, Observation with {rows, truncated}).

    Analog of the reference's extractor text cap + truncation counter
    (parser code truncates long function bodies and reports how many)."""
    from pyspark.sql import Observation

    obs = Observation("truncation")
    truncated = F.length(F.coalesce(F.col(text_col), F.lit(""))) > max_chars
    out = df.withColumn("truncated", truncated).withColumn(
        text_col, F.substring(F.col(text_col), 1, max_chars)
    )
    out = out.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("truncated").cast("long")).alias("truncated"),
    )
    return out, obs


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text —
    the exact-dup key (rolling/simhash variants live in dedup.py)."""
    normtext = F.regexp_replace(
        F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))), r"\s+", " "
    )
    return docs.select(
        "doc_id", F.md5(normtext).alias("fingerprint"),
        F.length(normtext).alias("norm_len"),
    )
