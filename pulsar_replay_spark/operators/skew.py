"""Skew-mitigation operators.

At 100 TB a handful of hot topics/keys dominate any key-partitioned shuffle
(one Pulsar topic with 40% of traffic → one straggler task). Two standard
mitigations, both exposed here and equality-tested against their plain
formulations:

- **AQE skew-join splitting** is on by default in the session conf
  (``spark.sql.adaptive.skewJoin.enabled``) — covers joins automatically;
- **two-phase salted aggregation** covers aggregations whose partial
  aggregation can't save them (e.g. high-cardinality intermediate state):
  spray each hot key across S salts, aggregate, then merge the S partials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salted_count_sum(
    df: DataFrame, key: str, value: str, n_salts: int = DEFAULT_SALTS
) -> DataFrame:
    """groupBy(key).agg(count, sum(value)) computed skew-proof:
    phase 1 groups on (key, salt) — hot keys split across n_salts reducers —
    phase 2 merges the partials on key alone (n_salts rows per key, trivial).

    Results are identical to the direct groupBy (count/sum are associative);
    sums are reassociated so floating totals can differ in the last ulp —
    callers needing oracle-exact floats should round, as everywhere else.
    """
    salt = (F.rand(seed=42) * n_salts).cast("int")
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_n"), F.sum(value).alias("_s"))
    )
    return phase1.groupBy(key).agg(
        F.sum("_n").alias("n"), F.sum("_s").alias("sum_value")
    )


def salted_join(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = DEFAULT_SALTS
) -> DataFrame:
    """Salted equi-join for when AQE can't help (e.g. the small side is too
    big to broadcast but the big side is skewed): replicate each small-side
    row n_salts times with an explicit salt, salt the big side randomly, and
    join on (key, salt) — hot keys fan across n_salts tasks."""
    salted_big = big.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(salted_small, [key, "_salt"]).drop("_salt")


def key_skew_report(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Pre-shuffle skew diagnosis for a prospective join/agg key: the top-N
    hottest keys with their share of all rows and the share a perfectly
    uniform key would carry — the decision input for "plain groupBy vs
    salted vs AQE-split" before paying the shuffle.

    One aggregation on the candidate keyspace (map-side combined) plus two
    scalar actions on the aggregated frame; the report is top_n rows.
    ``skew_x`` is the key's multiple of the uniform share — the straggler
    multiplier an unsalted shuffle would hand that key's reducer.

    Returns (key, n_rows, share, skew_x) ordered hottest first."""
    counts = df.groupBy(F.col(key).alias("key")).agg(
        F.count("*").alias("n_rows")
    ).persist()
    totals = counts.agg(
        F.sum("n_rows").alias("total"), F.count("*").alias("n_keys")
    ).first()
    out = (
        counts.orderBy(F.desc("n_rows"), "key")
        .limit(top_n)
        .select(
            "key",
            "n_rows",
            # unrounded: a diagnosis report, not an oracle row — rounding is
            # presentation, and HALF_UP vs half-even engine edges (1.005)
            # would manufacture false cross-engine diffs
            (F.col("n_rows") / F.lit(float(totals.total))).alias("share"),
            (
                F.col("n_rows") / F.lit(float(totals.total) / totals.n_keys)
            ).alias("skew_x"),
        )
        .localCheckpoint(eager=True)
    )
    counts.unpersist()
    return out


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    key: str,
    broadcast_threshold_rows: int = 1_000_000,
    skew_multiple: float = 10.0,
) -> dict:
    """Pre-flight join planner: predict an inner equi-join's output
    cardinality and recommend a physical strategy BEFORE paying for the
    join — the decision input for plain vs broadcast vs salted (the same
    role ``key_skew_report`` plays for aggregations).

    The estimate is EXACT, not a sketch: |A ⋈_k B| = Σ_k cnt_A(k)·cnt_B(k),
    computed by joining the two per-key count relations — which shuffle at
    keyspace size (map-side combined), never the fact rows themselves. For
    a 100 TB join this costs two count aggs + one keyspace-sized join,
    orders of magnitude below the join it prices.

    Returns {rows_out, left_rows, right_rows, top_key, top_key_rows_out,
    top_key_share, recommendation}: 'broadcast' when a side's row count is
    under ``broadcast_threshold_rows``, 'salted' when the hottest key
    produces more than ``skew_multiple``× the per-key mean output, else
    'shuffle' (AQE handles the residual skew).
    """
    lc = left.groupBy(F.col(key).alias("k")).agg(F.count("*").alias("ca"))
    rc = right.groupBy(F.col(key).alias("k")).agg(F.count("*").alias("cb"))
    per_key = (
        lc.join(rc, "k")
        .select("k", (F.col("ca") * F.col("cb")).alias("out_rows"))
        .localCheckpoint(eager=True)  # feeds the total AND the argmax
    )
    agg = per_key.agg(
        F.sum("out_rows").alias("rows_out"),
        F.count("*").alias("n_keys"),
        F.max_by("k", F.struct("out_rows", "k")).alias("top_key"),
        F.max("out_rows").alias("top_rows"),
    ).first()
    sides = {
        "left_rows": left.count(),
        "right_rows": right.count(),
    }
    rows_out = int(agg.rows_out or 0)
    top_rows = int(agg.top_rows or 0)
    mean_per_key = rows_out / agg.n_keys if agg.n_keys else 0.0
    if min(sides.values()) <= broadcast_threshold_rows:
        rec = "broadcast"
    elif mean_per_key and top_rows > skew_multiple * mean_per_key:
        rec = "salted"
    else:
        rec = "shuffle"
    return {
        "rows_out": rows_out,
        **sides,
        "top_key": agg.top_key,
        "top_key_rows_out": top_rows,
        "top_key_share": (top_rows / rows_out) if rows_out else 0.0,
        "recommendation": rec,
    }
