"""Vectorized mock embedding: parity vs a straightforward per-token
reference, plus the provider seam (classified retry/backoff)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cie_spark.functions import (
    EMBED_DIM,
    fnv1a_array,
    hash_str,
    mock_embedding_matrix,
)
from cie_spark.functions.embedding_provider import (
    MockEmbeddingProvider,
    RetryableError,
    RetryingProvider,
    embedding_udf,
)


def _reference_embedding(texts, dim=EMBED_DIM):
    """The round-1 row-at-a-time implementation, kept as the parity oracle."""
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        if not t:
            continue
        for tok in str(t).lower().split():
            h = np.uint64(hash_str(tok))
            out[i, int(h % np.uint64(dim))] += (
                1.0 if (h >> np.uint64(32)) % np.uint64(2) else -1.0
            )
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return out / norms


TEXTS = [
    "postgresql",
    "ent:postgresql",
    "postgresql database",
    "The QUICK brown fox   jumps",
    "",
    None,
    "café au lait",  # multi-byte utf-8
    "a b a b a",  # repeated tokens accumulate
    "tool:bash",
]


def test_fnv1a_array_matches_scalar():
    toks = np.array(["a", "postgresql", "x-y-z", "café"], dtype=object)
    got = fnv1a_array(toks)
    exp = np.array([hash_str(t) for t in toks], dtype=np.uint64)
    assert (got == exp).all()


def test_vectorized_embedding_parity():
    got = mock_embedding_matrix(pd.Series(TEXTS))
    exp = _reference_embedding(TEXTS)
    np.testing.assert_allclose(got, exp, rtol=0, atol=1e-6)


def test_embedding_udf_matches_matrix(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS if t], "text string")
    udf = embedding_udf(MockEmbeddingProvider())
    rows = {r.text: r.emb for r in df.select("text", udf("text").alias("emb")).collect()}
    exp = mock_embedding_matrix(pd.Series(sorted(rows)))
    for t, e in zip(sorted(rows), exp):
        np.testing.assert_allclose(np.array(rows[t]), e, atol=1e-6)


class _Flaky:
    dim = EMBED_DIM

    def __init__(self, fail_times, exc):
        self.fail_times = fail_times
        self.exc = exc
        self.calls = 0

    def embed_batch(self, texts):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise self.exc
        return mock_embedding_matrix(texts)


def test_retry_recovers_from_transient():
    flaky = _Flaky(2, RetryableError("throttled"))
    p = RetryingProvider(flaky, max_retries=3, base_backoff=0.001)
    out = p.embed_batch(pd.Series(["postgresql"]))
    assert out.shape == (1, EMBED_DIM)
    assert flaky.calls == 3


def test_retry_exhaustion_raises():
    flaky = _Flaky(10, RetryableError("throttled"))
    p = RetryingProvider(flaky, max_retries=2, base_backoff=0.001)
    with pytest.raises(RetryableError):
        p.embed_batch(pd.Series(["x"]))
    assert flaky.calls == 3  # 1 try + 2 retries


def test_permanent_error_not_retried():
    flaky = _Flaky(10, ValueError("bad auth"))
    p = RetryingProvider(flaky, max_retries=5, base_backoff=0.001)
    with pytest.raises(ValueError):
        p.embed_batch(pd.Series(["x"]))
    assert flaky.calls == 1
