"""Query registry: the single source for ``__spark_entry__.queries()`` /
``oracle_sql()``.

Each registered query is a callable ``(spark, sf_dir) -> DataFrame`` plus an
optional DuckDB oracle SQL string computing the same result on the same
parquet tables. Column names are aliased identically on both sides (the
driver sorts columns by name before hashing values).

Conventions that keep the oracle comparison exact:
- timestamps are emitted as epoch-millis BIGINT (``unix_millis`` /
  ``epoch_ms``) — events.ts has shipped as both parquet TIMESTAMP(NANOS)
  and TIMESTAMP(MICROS); ``session.load_events`` normalizes either to
  TimestampType, and millis is the common oracle granularity;
- floating aggregates are ``round(x, 2..6)`` on both sides (summation order
  differs between engines in the last bits);
- DuckDB ``SUM(integer)`` returns HUGEINT → always cast to BIGINT;
- every top-k / limit has a total deterministic ordering (unique tie-break).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query-defining module (idempotent)."""
    from pulsar_replay_spark import (  # noqa: F401
        queries_functions,
        queries_llm,
        queries_reference,
        queries_relational,
        queries_temporal,
    )
