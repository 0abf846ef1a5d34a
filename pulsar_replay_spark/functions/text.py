"""Text-analysis scalar layer for the LLM-pipeline operators.

All pure built-in expressions (whole-stage codegen) — tokenization, shingling,
stopword stats, language heuristic, content hashing. Python-free hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ["a", "the"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization (matches oracle string_split semantics)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def unique_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def stopword_count(text: Column) -> Column:
    in_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return F.size(F.filter(tokens(text), lambda t: t.isin(STOPWORDS)))


def shingles(toks: Column, k: int = 3) -> Column:
    """Word k-shingles as space-joined strings; empty array when the doc has
    fewer than k tokens. 0-based subscript arithmetic mirrors the oracle's
    1-based list indexing."""
    assert k == 3, "oracle SQL is written for k=3"
    return F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.concat_ws(" ", toks[i], toks[i + 1], toks[i + 2]),
        ),
    ).otherwise(F.array().cast("array<string>"))


def token_hash60(tok: Column) -> Column:
    """Deterministic 60-bit integer hash of a token: first 15 hex chars of
    md5, parsed base-16. Reproducible in DuckDB as
    ``('0x' || substr(md5(t), 1, 15))::BIGINT`` — the cross-engine contract
    the dedup/fingerprint operators rely on."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")
