"""Frequent-items sketch and bivariate statistics gates.

``df.stat.freqItems`` (single-pass KPS sketch) must return a SUPERSET of the
exact heavy hitters — that is its published guarantee; false positives are
allowed, false negatives are not. The exact query is the oracle-checked
``heavy_hitters_event_type``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_freq_items_sketch_superset_of_exact(spark):
    from pulsar_replay_spark.queries_functions import q_heavy_hitters_event_type

    exact = {r["event_type"] for r in q_heavy_hitters_event_type(spark, SF_SMOKE).collect()}
    assert exact, "fixture should contain heavy hitters at 5% support"

    from pulsar_replay_spark.session import load_events

    ev = load_events(spark, SF_SMOKE)
    sketch = set(ev.stat.freqItems(["event_type"], support=0.05).first()[0])
    assert exact <= sketch, f"sketch {sketch} missed exact heavy hitters {exact}"


def test_correlation_matches_numpy(spark):
    import numpy as np

    from pulsar_replay_spark.queries_functions import q_qty_price_correlation

    rows = {r["l_returnflag"]: r for r in q_qty_price_correlation(spark, SF_SMOKE).collect()}
    li = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .toPandas()
    )
    for flag, grp in li.groupby("l_returnflag"):
        want = np.corrcoef(grp["l_quantity"], grp["l_extendedprice"])[0, 1]
        assert abs(rows[flag]["qty_price_corr"] - want) < 1e-3


def test_ewma_matches_python_fold(spark):
    """The codegen fold must reproduce the sequential python recursion
    exactly (same IEEE operation order), per key, in order."""
    from pulsar_replay_spark.operators.stats import ewma
    from pulsar_replay_spark.session import load_events
    from tests.conftest import SF_SMOKE

    ev = load_events(spark, SF_SMOKE)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.round(F.sum("value"), 4).alias("v"))
    got = ewma(hourly, "event_type", "bucket", "v", alpha=0.3).collect()

    series: dict = {}
    for r in hourly.collect():
        series.setdefault(r["event_type"], []).append((r["bucket"], r["v"]))
    expect: dict = {}
    for k, pts in series.items():
        s = None
        for o, x in sorted(pts):
            s = x if s is None else 0.3 * x + 0.7 * s
            expect[(k, o)] = round(s, 6)
    assert len(got) == len(expect)
    for r in got:
        assert r["ewma"] == expect[(r["event_type"], r["bucket"])], (
            r["event_type"],
            r["bucket"],
        )
    plan_df = ewma(hourly, "event_type", "bucket", "v")
    plan = plan_df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
