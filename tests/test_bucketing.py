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
