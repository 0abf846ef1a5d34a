"""Fixture-schema canary: fail LOUDLY (naming the observed physical type)
when the driver-generated parquet fixtures shift schema between rounds.

Round-2 lesson: `events.ts` silently moved from parquet TIMESTAMP(NANOS) to
TIMESTAMP(MICROS) with the pyspark 4.1 upgrade, and a loader that assumed one
era zeroed 16/50 correctness rows, 42 tests, and the whole bench. These tests
pin (a) the logical types `load_tables` must yield on today's fixtures and
(b) that `load_events` normalizes BOTH eras — nanos-as-long and native
timestamp — synthesized side by side in tmp_path.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pulsar_replay_spark.session import TABLES, load_events, load_tables

SF_SMOKE = "/root/testdata/sf0.001"

# Logical dtypes the engine's queries are written against. Physical parquet
# types may drift (int32 vs int64 widths, nanos vs micros timestamps); what
# must hold is the *Spark-side* type after load_tables normalization.
EXPECTED = {
    "region": {"r_regionkey": {"int", "bigint"}, "r_name": {"string"}},
    "nation": {"n_nationkey": {"int", "bigint"}, "n_name": {"string"}},
    "customer": {"c_custkey": {"int", "bigint"}, "c_acctbal": {"double"}},
    "supplier": {"s_suppkey": {"int", "bigint"}, "s_acctbal": {"double"}},
    "part": {"p_partkey": {"int", "bigint"}, "p_retailprice": {"double"}},
    "orders": {"o_orderkey": {"int", "bigint"}, "o_orderdate": {"timestamp", "timestamp_ntz", "date"}},
    "lineitem": {"l_orderkey": {"int", "bigint"}, "l_shipdate": {"timestamp", "timestamp_ntz", "date"}},
    "events": {
        "event_id": {"int", "bigint"},
        "ts": {"timestamp"},  # post-normalization: always session-zone timestamp
        "user_id": {"int", "bigint"},
        "event_type": {"string"},
        "value": {"double"},
        "props": {"string"},
    },
    "documents": {"doc_id": {"int", "bigint"}, "text": {"string"}, "lang": {"string"}, "source": {"string"}},
    "embeddings": {"vec_id": {"int", "bigint"}, "embedding": {"array<float>", "array<double>"}},
}


def test_fixture_logical_types(spark):
    tables = load_tables(spark, SF_SMOKE)
    assert set(tables) == set(TABLES)
    problems = []
    for t, cols in EXPECTED.items():
        dtypes = dict(tables[t].dtypes)
        physical = {f.name: str(f.type) for f in pq.read_schema(f"{SF_SMOKE}/{t}.parquet")}
        for c, allowed in cols.items():
            if c not in dtypes:
                problems.append(f"{t}.{c}: MISSING (physical schema: {physical})")
            elif dtypes[c] not in allowed:
                problems.append(
                    f"{t}.{c}: spark dtype {dtypes[c]!r} not in {sorted(allowed)} "
                    f"(parquet physical type: {physical.get(c)!r})"
                )
    assert not problems, "fixture schema drift:\n  " + "\n  ".join(problems)


@pytest.mark.parametrize("era", ["nanos_as_long", "timestamp_micros"])
def test_load_events_normalizes_both_ts_eras(spark, tmp_path, era):
    """Synthesize each historical ts encoding and assert load_events yields
    identical timestamp values regardless of era."""
    base_us = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch-micros
    micros = [base_us, base_us + 1_500_000, base_us + 86_400_000_000]
    if era == "nanos_as_long":
        ts_arr = pa.array([m * 1000 for m in micros], type=pa.int64())
    else:
        ts_arr = pa.array(
            [datetime.datetime.utcfromtimestamp(m / 1e6) for m in micros],
            type=pa.timestamp("us"),
        )
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            "ts": ts_arr,
            "user_id": pa.array([10, 11, 12], type=pa.int64()),
            "event_type": pa.array(["a", "b", "c"]),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    d = tmp_path / era
    d.mkdir()
    pq.write_table(table, d / "events.parquet")

    ev = load_events(spark, str(d))
    assert dict(ev.dtypes)["ts"] == "timestamp", (
        f"era={era}: expected normalized timestamp, got {dict(ev.dtypes)['ts']!r}"
    )
    got = sorted(r.ts for r in ev.select("ts").collect())
    want = sorted(
        datetime.datetime.utcfromtimestamp(m / 1e6) for m in micros
    )
    assert got == want, f"era={era}: normalized values differ: {got} vs {want}"


def test_register_views_sql_surface(spark):
    """register_views makes every table reachable from plain spark.sql, with
    events already dtype-normalized (the SQL twin of load_tables)."""
    from pulsar_replay_spark.session import register_views

    names = register_views(spark, SF_SMOKE, prefix="v_")
    assert len(names) == len(TABLES)
    n = spark.sql("SELECT COUNT(*) AS n FROM v_events WHERE ts IS NOT NULL").first().n
    assert n == 1000
    joined = spark.sql(
        """
        SELECT r.r_name, COUNT(*) AS n
        FROM v_nation nt JOIN v_region r ON nt.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name
        """
    ).collect()
    assert len(joined) == 5
    assert dict(spark.sql("SELECT * FROM v_events").dtypes)["ts"] == "timestamp"
