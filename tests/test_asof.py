"""As-of join operator: semantics pinned against a hand-computed frame and a
naive (explode-then-prune) formulation; plan pinned join-free."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pulsar_replay_spark.operators.asof import asof_join, latest_per


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01T10:00")),
            (2, "k1", _ts("2024-01-01T12:00")),
            (3, "k1", _ts("2024-01-02T00:00")),
            (4, "k2", _ts("2024-01-01T10:00")),  # key with no right rows
            (5, "k3", _ts("2024-01-01T09:00")),  # before every right row
        ],
        "id long, key string, t timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-01T10:00"), 100.0),  # exactly at left id=1
            ("k1", _ts("2024-01-01T11:30"), 110.0),
            ("k3", _ts("2024-01-01T09:30"), 300.0),
        ],
        "key string, rt timestamp, px double",
    )
    return left, right


def test_backward_inclusive(frames):
    left, right = frames
    got = {
        r["id"]: r["px"]
        for r in asof_join(left, right, "key", "t", "rt", ["px"]).collect()
    }
    # id=1: boundary — right row at the same instant matches (inclusive);
    # id=2/3 take the 11:30 row; k2 unmatched; k3's event precedes all rows.
    assert got == {1: 100.0, 2: 110.0, 3: 110.0, 4: None, 5: None}


def test_forward(frames):
    left, right = frames
    got = {
        r["id"]: r["px"]
        for r in asof_join(
            left, right, "key", "t", "rt", ["px"], direction="forward"
        ).collect()
    }
    assert got == {1: 100.0, 2: None, 3: None, 4: None, 5: 300.0}


def test_matches_naive_formulation_on_fixture(spark):
    """The one-shuffle union+window plan must equal the naive
    join-explode-prune plan on real data (sf0.001 events × orders)."""
    from pulsar_replay_spark.session import load_events
    from tests.conftest import SF_SMOKE

    ev = load_events(spark, SF_SMOKE).select("event_id", "user_id", "ts")
    od = latest_per(
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet").withColumnRenamed(
            "o_custkey", "user_id"
        ),
        ["user_id", "o_orderdate"],
        "o_orderkey",
    )
    fast = asof_join(ev, od, "user_id", "ts", "o_orderdate", ["o_orderkey"])

    naive = (
        ev.join(od, (ev.user_id == od.user_id) & (od.o_orderdate <= ev.ts))
        .select("event_id", od.o_orderkey, "o_orderdate")
    )
    w = F.row_number().over(
        Window.partitionBy("event_id").orderBy(
            F.desc("o_orderdate"), F.desc("o_orderkey")
        )
    )
    naive = naive.withColumn("rn", w).filter("rn = 1").select("event_id", "o_orderkey")

    f = {r["event_id"]: r["o_orderkey"] for r in fast.collect()}
    n = {r["event_id"]: r["o_orderkey"] for r in naive.collect()}
    # naive is an inner join: compare on its domain, and every event missing
    # from it must be null in the as-of result
    assert all(f[k] == v for k, v in n.items())
    assert all(v is None for k, v in f.items() if k not in n)
    assert len(f) == ev.count()


def test_plan_has_no_join(frames):
    left, right = frames
    plan = asof_join(left, right, "key", "t", "rt", ["px"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "Window" in plan


def test_bad_direction_raises(frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(left, right, "key", "t", "rt", ["px"], direction="nearest")


def test_matched_right_row_is_atomic(spark):
    """A right row whose payload field is legitimately NULL must win as-is:
    fields from older right rows must never be stitched in per-column."""
    from pulsar_replay_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 10)], "key string, t long")
    right = spark.createDataFrame(
        [("k", 1, 99, "old"), ("k", 5, None, "new")],
        "key string, rt long, px int, tag string",
    )
    row = asof_join(left, right, "key", "t", "rt", ["px", "tag"]).collect()[0]
    assert row["tag"] == "new"
    assert row["px"] is None  # NOT back-filled from the older row


def test_scd2_lookup_matches_duckdb(spark):
    """SCD2 enrichment vs the interval-join oracle: versioned user segments
    (two closed versions + a gap + an open current version) attach to
    events exactly where the validity interval covers ts."""
    import duckdb

    from pulsar_replay_spark.operators.asof import scd2_lookup
    from pulsar_replay_spark.session import load_events
    from tests.conftest import SF_SMOKE

    ev = load_events(spark, SF_SMOKE).select("event_id", "user_id", "ts")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    import datetime as dt

    third = (hi - lo) / 3
    t1, t2, t3 = lo + third, lo + 2 * third, lo + 2 * third + dt.timedelta(days=1)
    dim_rows = []
    for uid in range(0, 20):
        dim_rows.append((uid, lo, t1, f"seg-a-{uid % 3}"))
        # gap between t1 and t2: no valid version
        dim_rows.append((uid, t2, t3, f"seg-b-{uid % 3}"))
        dim_rows.append((uid, t3, None, f"seg-c-{uid % 3}"))
    dim = spark.createDataFrame(
        dim_rows, "user_id long, valid_from timestamp, valid_to timestamp, segment string"
    )

    got = scd2_lookup(ev, dim, "user_id", "ts").toPandas()

    ev.createOrReplaceTempView("_ev_scd")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_SMOKE}/events.parquet')"
    )
    con.register("dim", dim.toPandas())
    expect = con.execute(
        """
        SELECT e.event_id, e.user_id, e.ts, d.segment
        FROM (SELECT event_id, user_id, ts FROM events) e
        LEFT JOIN dim d
          ON e.user_id = d.user_id
         AND e.ts >= d.valid_from
         AND (d.valid_to IS NULL OR e.ts < d.valid_to)
        """
    ).df()
    from tools.parity import compare

    problems = compare(got, expect)
    assert not problems, problems
    # the gap really exercises the null-out path
    assert got["segment"].isna().any() and got["segment"].notna().any()
