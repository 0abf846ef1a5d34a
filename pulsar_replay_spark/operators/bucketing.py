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
from pyspark.sql import functions as F


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


def zorder_value(a, b, bits: int = 16) -> "F.Column":
    """Interleave the low ``bits`` bits of two non-negative integer columns
    into one Morton (Z-order) key — pure shift/mask expressions, whole-stage
    codegen. Locality in the Z-value implies locality in BOTH inputs, which
    is what makes one sort prune two dimensions."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    a = a.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    b = b.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        bit = F.lit(1 << i)
        z = (
            z
            + F.shiftleft(a.bitwiseAND(bit), i)  # bit i of a → position 2i
            + F.shiftleft(b.bitwiseAND(bit), i + 1)  # bit i of b → 2i+1
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Z-order clustering (the Delta/Iceberg `OPTIMIZE ZORDER BY` shape,
    expressed with plain Spark): range-partition + sort on the interleaved
    Morton key of TWO columns, so parquet row-group min/max stats prune
    files for predicates on EITHER column — the multi-dimensional
    generalization of ``write_range_clustered``. Both columns are first
    min/max-normalized onto the full ``bits``-bit scale (two scalar aggs →
    driver literals): WITHOUT this, a narrow dimension (15 user ids next
    to 60k hour buckets) only occupies low-order interleave bits and the
    sort degenerates to 1-D — the classic Z-order pitfall. The Z key is a
    pure deterministic expression of the data, so the layout is
    rerun/retry-stable like every layout in this module."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    top = (1 << bits) - 1

    def norm(c, lo, hi):
        span = max(int(hi) - int(lo), 1)
        return F.floor(
            (F.col(c).cast("bigint") - F.lit(int(lo))) * top / F.lit(span)
        ).cast("bigint")

    zdf = df.withColumn(
        "_z", zorder_value(norm(col_a, lo_a, hi_a), norm(col_b, lo_b, hi_b), bits)
    )
    (
        zdf.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
