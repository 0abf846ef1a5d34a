"""Bucketed-table layout: pre-shuffled storage for repeat-join workloads.

At 100 TB the dominant cost of fact⋈fact joins (lineitem⋈orders,
messages⋈messages across capture generations) is the shuffle. Bucketing pays
that shuffle ONCE at write time: both tables hash-clustered on the join key
into the same bucket count sort the join into a zero-exchange sort-merge —
every subsequent join, agg, or dedup on that key reads co-located buckets.

The reference stores captures as per-topic JSON arrays
(pulsar_backup_restore.py:142-143) — the engine's internal format is bucketed
Parquet instead; the JSON sink remains for fidelity export (sources/jsonio).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 32, path: str | None = None
) -> None:
    """Persist ``df`` hash-bucketed (and sorted) by ``key``. Bucket count is
    a layout contract: joins between tables bucketed with the SAME count on
    the same key need no exchange; mismatched counts fall back to a shuffle
    of the smaller side."""
    w = df.write.bucketBy(n_buckets, key).sortBy(key).mode("overwrite")
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — planned as a
    zero-exchange sort-merge join (asserted in tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), key)


def write_range_clustered(
    df: DataFrame, path: str, key: str, n_files: int = 8
) -> None:
    """Range-partition on ``key`` and sort within partitions before writing —
    produces files with DISJOINT key ranges so parquet row-group min/max
    stats prune whole files on key-range predicates (the time-series layout:
    cluster by timestamp, prune by time window). Verified against actual
    parquet footers in tests/test_bucketing.py."""
    (
        df.repartitionByRange(n_files, key)
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(path)
    )
