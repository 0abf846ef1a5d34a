"""Bucketed-layout gates: co-bucketed joins and aggregations must plan with
ZERO exchanges — the pay-the-shuffle-once-at-write-time contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pulsar_replay_spark.operators.bucketing import bucketed_join, write_bucketed
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucketed")
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    write_bucketed(li, "li_b", "l_orderkey", 8, path=str(wh / "li"))
    write_bucketed(orders, "ord_b", "l_orderkey", 8, path=str(wh / "ord"))
    yield "li_b", "ord_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cobucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "l_orderkey")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan[:3000]
        assert "SortMergeJoin" in plan
        # and it computes the right thing
        expect = (
            spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
            .join(
                spark.read.parquet(f"{SF_SMOKE}/orders.parquet"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = _plan(agg)
    assert "Exchange" not in plan, plan[:3000]


def test_range_clustered_files_have_disjoint_key_ranges(spark, tmp_path):
    """The written files' parquet footer stats must carve the key space into
    non-overlapping ranges — the physical property row-group skipping needs."""
    import glob

    import pyarrow.parquet as pq

    from pulsar_replay_spark.operators.bucketing import write_range_clustered
    from pulsar_replay_spark.session import load_events
    from tests.conftest import SF_SMOKE

    path = str(tmp_path / "clustered")
    ev = load_events(spark, SF_SMOKE).withColumn("ts_ms", F.unix_millis("ts"))
    write_range_clustered(ev.select("ts_ms", "user_id", "value"), path, "ts_ms")

    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["ts_ms"]
        lo = min(md.row_group(r).column(idx).statistics.min for r in range(md.num_row_groups))
        hi = max(md.row_group(r).column(idx).statistics.max for r in range(md.num_row_groups))
        spans.append((lo, hi))
    spans.sort()
    assert len(spans) >= 4
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next, f"overlapping file ranges: {spans}"
    # and nothing was lost
    assert spark.read.parquet(path).count() == ev.count()
