"""Data-quality expectation checks — the gate a training-data pipeline runs
before promoting a capture (null ratios, key uniqueness, referential
containment, range bounds). Each check is a DataFrame aggregate; the suite
runs as ONE job over a single pass (checks are combined into one agg where
possible) and returns a violations frame — empty means the contract holds.

The reference has no data-quality layer (its only validation is the decode
fallback, pulsar_backup_restore.py:118-124); this is engine infrastructure
the 100 TB pipeline cannot live without: a bad capture partition must fail
the gate, not poison downstream dedup/training.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_suite(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Run named boolean-violation expressions in one aggregate pass.
    Each ``checks[name]`` is a row-level predicate that is TRUE when the row
    VIOLATES the expectation. Returns (check, n_violations) rows where
    n_violations > 0."""
    aggs = [
        F.count(F.when(pred, 1)).cast("bigint").alias(name)
        for name, pred in checks.items()
    ]
    row = df.agg(*aggs)
    stacked = row.unpivot([], list(checks), "check", "n_violations")
    return stacked.filter(F.col("n_violations") > 0)


def unique_key_violations(df: DataFrame, keys: list[str]) -> DataFrame:
    """Key groups appearing more than once (needs its own shuffle — cannot
    fold into the single-pass suite)."""
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )


def referential_violations(child: DataFrame, parent: DataFrame, fk: str, pk: str) -> DataFrame:
    """Child rows whose foreign key has no parent (left-anti join)."""
    return child.join(parent, child[fk] == parent[pk], "left_anti")


def repetition_signals(docs: DataFrame) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    "Scaling Language Models" §A1.1 data-quality filters): fraction of
    repeated tokens, fraction of repeated 2-grams, and the most-frequent
    token's share. Pure map — no shuffle, no Python; every signal is a
    higher-order-function expression over the token array, so the pass is
    embarrassingly parallel at any corpus size.

    Returns one row per doc:
    (doc_id, source, n_tokens, dup_token_ratio, dup_bigram_ratio,
    top_token_ratio)."""
    from pulsar_replay_spark.functions.text import (
        bigrams,
        tokens,
        top_token_count,
    )

    text = F.col("text")
    t = tokens(text)
    bg = bigrams(text)
    n_tok = F.size(t)
    n_bg = F.size(bg)
    return docs.select(
        "doc_id",
        "source",
        n_tok.alias("n_tokens"),
        F.round(1 - F.size(F.array_distinct(t)) / n_tok, 4).alias(
            "dup_token_ratio"
        ),
        F.when(
            n_bg > 0, F.round(1 - F.size(F.array_distinct(bg)) / n_bg, 4)
        ).alias("dup_bigram_ratio"),
        F.round(top_token_count(text) / n_tok, 4).alias("top_token_ratio"),
    )
