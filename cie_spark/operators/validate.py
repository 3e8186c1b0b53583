"""Data-quality validation: the analog of ValidateEntities
(reference pkg/ingestion/datalog.go:62-175 — non-empty IDs, sane ranges,
NaN/dimension checks on embeddings).

Spark-first: violations are counted with `observe()` (one pass, no extra
action) and the caller decides whether to fail the job — matching the
reference's fail-on-violation behavior while keeping the plan lazy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def validate_triples(triples: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach an Observation counting violations; returns (df, obs).

    After an action on the returned df, `obs.get` yields the counts:
    empty_ids, bad_pred, negative_turn, null_weight.
    """
    obs = Observation("triple_dq")
    checked = triples.observe(
        obs,
        F.sum(
            ((F.col("subj") == "") | F.col("subj").isNull()).cast("long")
            + ((F.col("obj") == "") | F.col("obj").isNull()).cast("long")
        ).alias("empty_ids"),
        F.sum(
            (~F.col("pred").isin("calls", "contains", "mentioned_with", "mentioned_with_w")).cast("long")
        ).alias("bad_pred"),
        F.sum((F.col("turn_idx") < 0).cast("long")).alias("negative_turn"),
        F.sum(F.col("weight").isNull().cast("long")).alias("null_weight"),
        F.count(F.lit(1)).alias("rows"),
    )
    return checked, obs


def validate_embeddings(df: DataFrame, vec_col: str = "embedding",
                        dim: int | None = None) -> tuple[DataFrame, Observation]:
    """NaN / dimension-consistency checks on an embedding column."""
    obs = Observation("embedding_dq")
    has_nan = F.exists(F.col(vec_col), lambda x: F.isnan(x))
    checks = [
        F.sum(F.col(vec_col).isNull().cast("long")).alias("null_vec"),
        F.sum(has_nan.cast("long")).alias("nan_vec"),
        F.count(F.lit(1)).alias("rows"),
    ]
    if dim is not None:
        checks.append(
            F.sum((F.size(F.col(vec_col)) != dim).cast("long")).alias("wrong_dim")
        )
    else:
        checks.append(
            (F.countDistinct(F.size(F.col(vec_col))) - 1).alias("wrong_dim")
        )
    return df.observe(obs, *checks), obs


def assert_clean(obs_values: dict) -> None:
    """Raise if any violation counter is nonzero (rows excluded)."""
    bad = {k: v for k, v in obs_values.items() if k != "rows" and v and v > 0}
    if bad:
        raise ValueError(f"data-quality violations: {bad}")
