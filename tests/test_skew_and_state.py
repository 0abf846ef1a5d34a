"""Salted-aggregation/join equivalence + stateful streaming operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pulsar_replay_spark.operators import skew
from pulsar_replay_spark.streaming import pipelines
from tests.conftest import SF_SMOKE


def test_salted_count_sum_matches_plain(spark, events):
    plain = {
        r["event_type"]: (r["n"], round(r["s"], 2))
        for r in events.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    salted = {
        r["event_type"]: (r["n"], round(r["sum_value"], 2))
        for r in skew.salted_count_sum(events, "event_type", "value").collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = orders.join(cust, "o_custkey").groupBy("c_mktsegment").count().collect()
    salted = (
        skew.salted_join(orders, cust, "o_custkey")
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_stateful_running_counts(spark, tmp_path_factory):
    """applyInPandasWithState totals must equal the batch groupBy after the
    stream drains (update mode → last row per user is the final state)."""
    from pulsar_replay_spark.session import load_events

    src = str(tmp_path_factory.mktemp("state_src"))
    load_events(spark, SF_SMOKE).repartition(3).write.mode("overwrite").parquet(src)

    stream = pipelines.running_counts_stateful(pipelines.events_stream(spark, src))
    name = "stateful_counts"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path_factory.mktemp("ckpt")))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # update mode emits one row per user per batch; the max n_events row is
    # the final state for that user
    got = (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .collect()
    )
    expect = {
        r["user_id"]: r["n"]
        for r in spark.read.parquet(src).groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert {r["user_id"]: r["n_events"] for r in got} == expect


def test_foreach_batch_sink(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("fb_src"))
    from pulsar_replay_spark.session import load_events

    load_events(spark, SF_SMOKE).repartition(3).write.mode("overwrite").parquet(src)
    out = str(tmp_path_factory.mktemp("fb_out"))
    q = pipelines.foreach_batch_to_parquet(
        pipelines.events_stream(spark, src), out, str(tmp_path_factory.mktemp("ckpt"))
    )
    q.awaitTermination()
    written = spark.read.parquet(out)
    assert written.count() == spark.read.parquet(src).count()
    assert written.select("batch_id").distinct().count() >= 2  # real micro-batches


def test_key_skew_report_matches_duckdb(spark, events):
    """The diagnosis report must equal the exact DuckDB formulation
    (per-key counts, shares, uniform-multiple) on the events key that IS
    the engine's canonical skew case (event_type)."""
    import duckdb

    got = sorted(
        map(tuple, skew.key_skew_report(events, "event_type", top_n=5).collect())
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMOKE}/events.parquet'"
    )
    sql = """
WITH c AS (SELECT event_type AS key, COUNT(*) AS n_rows FROM events GROUP BY 1),
t AS (SELECT CAST(SUM(n_rows) AS DOUBLE) AS total, COUNT(*) AS n_keys FROM c)
SELECT key, n_rows, n_rows / total AS share,
       n_rows / (total / n_keys) AS skew_x
FROM c CROSS JOIN t ORDER BY n_rows DESC, key LIMIT 5
"""
    expect = sorted(map(tuple, con.execute(sql).fetchall()))
    assert len(got) == len(expect)
    for g, e in zip(got, expect):
        assert g[0] == e[0] and g[1] == e[1], (g, e)
        assert abs(g[2] - e[2]) < 1e-12 and abs(g[3] - e[3]) < 1e-12, (g, e)


def test_key_skew_report_flags_planted_hot_key(spark):
    rows = [(i, "hot" if i % 10 else "cold%d" % i) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, k string")
    rep = {r.key: r for r in skew.key_skew_report(df, "k", top_n=3).collect()}
    assert rep["hot"].skew_x > 50  # 900 rows over ~101 keys ≈ 91x uniform
    assert abs(rep["hot"].share - 0.9) < 0.01
