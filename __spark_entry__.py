"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship capture-pipeline query on sf0.001 (SURVEY §3.1).
queries()    — every implemented operator from SURVEY §2 + LLM extensions,
               defined in pulsar_replay_spark/queries_*.py via the registry.
oracle_sql() — matching DuckDB SQL per query (same column names/types).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pulsar_replay_spark.operators.capture import capture_pipeline
    from pulsar_replay_spark.session import load_events

    return capture_pipeline(load_events(spark, "/root/testdata/sf0.001"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pulsar_replay_spark import registry

    registry.load_all()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    from pulsar_replay_spark import registry

    registry.load_all()
    return dict(registry.ORACLES)
