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


def _file_spans(path, col):
    import glob

    import pyarrow.parquet as pq

    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        lo = min(md.row_group(r).column(idx).statistics.min for r in range(md.num_row_groups))
        hi = max(md.row_group(r).column(idx).statistics.max for r in range(md.num_row_groups))
        spans.append((lo, hi))
    return spans


def test_zorder_value_matches_python_mirror(spark):
    from pulsar_replay_spark.operators.bucketing import zorder_value

    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 5, 255, 65535) for b in (0, 2, 7, 1000)],
        "a long, b long",
    )
    got = {(r["a"], r["b"]): r["z"] for r in df.select("a", "b", zorder_value("a", "b").alias("z")).collect()}

    def mirror(a, b, bits=16):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for (a, b), z in got.items():
        assert z == mirror(a, b), (a, b)


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """Z-ordered files must carve BOTH dimensions: each file's footer span
    covers a small fraction of each column's global range — versus the
    single-column range layout, whose second column spans ~everything in
    every file."""
    from pulsar_replay_spark.operators.bucketing import (
        write_range_clustered,
        write_zordered,
    )
    from pulsar_replay_spark.session import load_events
    from tests.conftest import SF_SMOKE

    ev = (
        load_events(spark, SF_SMOKE)
        .withColumn("hour_n", (F.unix_timestamp("ts") / 3600).cast("bigint"))
        .select(
            (F.col("hour_n") - F.min("hour_n").over(__import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy(F.lit(1)))).alias("h"),
            "user_id",
            "value",
        )
    )
    zpath = str(tmp_path / "z")
    rpath = str(tmp_path / "r")
    write_zordered(ev, zpath, "h", "user_id", n_files=8)
    write_range_clustered(ev, rpath, "h", n_files=8)

    def avg_frac(path, col):
        spans = _file_spans(path, col)
        glo = min(s[0] for s in spans)
        ghi = max(s[1] for s in spans)
        width = max(ghi - glo, 1)
        return sum((hi - lo) / width for lo, hi in spans) / len(spans)

    # both dims carved by the z layout…
    assert avg_frac(zpath, "h") < 0.6
    assert avg_frac(zpath, "user_id") < 0.6
    # …while the 1-D layout leaves the second dimension unpruned
    assert avg_frac(rpath, "user_id") > 0.9
    # and the z layout still loses nothing: same rows round-trip
    assert (
        spark.read.parquet(zpath).count()
        == spark.read.parquet(rpath).count()
        == ev.count()
    )
