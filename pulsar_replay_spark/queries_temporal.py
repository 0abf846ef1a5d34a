"""Temporal-join + approximate-aggregate corpus (engine extensions).

The reference carries two time domains per message (publish vs event time,
SURVEY.md §2.9 T1) but never joins across them; a real analytics engine needs
the temporal join family — as-of (point-in-time) and range (interval) joins —
plus the sketch aggregates (HLL distinct, quantile sketch) that replace exact
operators at 100 TB. Each query here pins semantics against the DuckDB
oracle; the approximate ones pin an error *bound* (the sketch estimate must
sit within tolerance of the exact answer, which both engines compute
exactly).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pulsar_replay_spark.operators.asof import asof_join, latest_per
from pulsar_replay_spark.registry import register
from pulsar_replay_spark.session import load_events


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# As-of join: each event picks up the customer's most recent order at-or-
# before the event. Union+window plan: one shuffle on user_id, no pair
# explosion (operators/asof.py).
# ---------------------------------------------------------------------------
@register(
    "asof_latest_order",
    """
WITH od AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                            ORDER BY o_orderkey DESC) AS rn
  FROM orders QUALIFY rn = 1
)
SELECT e.event_id, e.user_id, epoch_ms(e.ts) AS ts_ms,
       od.o_orderkey AS asof_orderkey,
       ROUND(od.o_totalprice, 2) AS asof_totalprice
FROM events e
ASOF LEFT JOIN od ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
""",
)
def q_asof_latest_order(spark, sf_dir):
    ev = load_events(spark, sf_dir).select("event_id", "user_id", "ts")
    od = latest_per(
        _t(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "user_id"),
        ["user_id", "o_orderdate"],
        "o_orderkey",
    )
    joined = asof_join(
        ev, od, key="user_id", left_time="ts", right_time="o_orderdate",
        payload=["o_orderkey", "o_totalprice"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.col("o_orderkey").alias("asof_orderkey"),
        F.round("o_totalprice", 2).alias("asof_totalprice"),
    )


# ---------------------------------------------------------------------------
# Range (interval) join: per event, how many orders the same customer placed
# in the trailing 7 days. Equi-key + time-band condition → Catalyst plans a
# sort-merge join on the equality key with the band as a post-join predicate;
# the shuffle is on user_id only.
# ---------------------------------------------------------------------------
@register(
    "range_join_recent_orders",
    """
SELECT e.event_id, epoch_ms(e.ts) AS ts_ms,
       COUNT(o.o_orderkey) AS n_recent_orders
FROM events e
LEFT JOIN orders o
  ON e.user_id = o.o_custkey
 AND o.o_orderdate BETWEEN e.ts - INTERVAL 7 DAY AND e.ts
GROUP BY e.event_id, e.ts
""",
)
def q_range_join_recent_orders(spark, sf_dir):
    ev = load_events(spark, sf_dir).select("event_id", "user_id", "ts")
    o = _t(spark, sf_dir, "orders")
    cond = (
        (ev.user_id == o.o_custkey)
        & (o.o_orderdate >= ev.ts - F.expr("INTERVAL 7 DAYS"))
        & (o.o_orderdate <= ev.ts)
    )
    return (
        ev.join(o, cond, "left")
        .groupBy("event_id", "ts")
        .agg(F.count("o_orderkey").alias("n_recent_orders"))
        .select("event_id", F.unix_millis("ts").alias("ts_ms"), "n_recent_orders")
    )


# ---------------------------------------------------------------------------
# Sketch aggregates. At 100 TB exact COUNT(DISTINCT) shuffles every distinct
# value; HyperLogLog ships constant-size sketches instead. The oracle can't
# reproduce Spark's HLL estimate bit-for-bit, so the query emits the exact
# answer (both engines agree) plus a boolean asserting the sketch landed
# within tolerance — the driver hash then pins the error bound.
# ---------------------------------------------------------------------------
# One profile row per event_type covering the whole sketch/distribution
# family: exact vs HLL distinct (error-bound boolean — the sketch must land
# within 5%), exact vs KLL-style quantile sketch (2%), heavy-hitter share
# (the exact two-pass form; the freqItems single-pass sketch is pinned
# against it in tests/test_stats_extras.py), and the fixed-width value
# histogram serialized as a deterministic "bucket:n" string. One scan +
# two aggs; the global total rides along as a broadcast 1-row frame.
@register(
    "event_type_profile",
    """
WITH tot AS (SELECT COUNT(*) AS total FROM events),
base AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         COUNT(DISTINCT user_id) AS n_users_exact,
         ROUND(quantile_cont(value, 0.5), 2) AS p50_exact
  FROM events GROUP BY event_type
),
hist AS (
  SELECT event_type,
         string_agg(CAST(bucket AS VARCHAR) || ':' || CAST(n AS VARCHAR), ','
                    ORDER BY bucket) AS hist
  FROM (
    SELECT event_type, CAST(FLOOR(value / 10) AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
  ) GROUP BY event_type
)
SELECT b.event_type, b.cnt,
       ROUND(b.cnt * 1.0 / t.total, 4) AS share,
       b.cnt * 1.0 / t.total >= 0.05 AS is_heavy,
       b.n_users_exact,
       TRUE AS hll_within_5pct,
       b.p50_exact,
       TRUE AS sketch_within_2pct,
       h.hist
FROM base b JOIN hist h USING (event_type) CROSS JOIN tot t
""",
)
def q_event_type_profile(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    total = ev.agg(F.count("*").alias("total"))
    base = ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.countDistinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("hll"),
        F.expr("percentile(value, 0.5)").alias("p50_raw"),
        F.percentile_approx("value", 0.5, 10000).alias("p50_sketch"),
    )
    bucket = F.floor(F.col("value") / 10).cast("int")
    hist = (
        ev.groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count("*").alias("n"))
        .groupBy("event_type")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("bucket", "n"))),
                    lambda s: F.concat_ws(
                        ":", s["bucket"].cast("string"), s["n"].cast("string")
                    ),
                ),
                ",",
            ).alias("hist")
        )
    )
    return (
        base.join(hist, "event_type")
        .join(F.broadcast(total))
        .select(
            "event_type",
            "cnt",
            F.round(F.col("cnt") / F.col("total"), 4).alias("share"),
            (F.col("cnt") / F.col("total") >= 0.05).alias("is_heavy"),
            "n_users_exact",
            (
                F.abs(F.col("hll") - F.col("n_users_exact"))
                <= 0.05 * F.col("n_users_exact")
            ).alias("hll_within_5pct"),
            F.round("p50_raw", 2).alias("p50_exact"),
            (
                F.abs(F.col("p50_sketch") - F.col("p50_raw"))
                <= 0.02 * F.abs(F.col("p50_raw"))
            ).alias("sketch_within_2pct"),
            "hist",
        )
    )


# (Leg of event_type_profile — kept for tests.)
def q_approx_distinct_users(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("hll"),
    )
    return agg.select(
        "event_type",
        "n_users_exact",
        (
            F.abs(F.col("hll") - F.col("n_users_exact"))
            <= 0.05 * F.col("n_users_exact")
        ).alias("hll_within_5pct"),
    )


def q_approx_quantiles_value(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    agg = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50_exact"),
        F.percentile_approx("value", 0.5, 10000).alias("p50_sketch"),
    )
    return agg.select(
        "event_type",
        F.round("p50_exact", 2).alias("p50_exact"),
        (
            F.abs(F.col("p50_sketch") - F.col("p50_exact"))
            <= 0.02 * F.abs(F.col("p50_exact"))
        ).alias("sketch_within_2pct"),
    )


# ---------------------------------------------------------------------------
# Time-series gap fill (resample): per-user hourly grid spanning each user's
# active range, zero-filled where no events landed. sequence+explode builds
# the grid distributed (never a driver loop); the grid join is an equi-join
# on (user_id, hour).
# ---------------------------------------------------------------------------
def q_gapfill_hourly_counts(spark, sf_dir):
    # r12 optimization (guide §2.4/§1.2): the per-user bounds are derivable
    # from the hourly aggregate itself — date_trunc('hour', min(ts)) ==
    # min(date_trunc('hour', ts)) (truncation is monotone), so ONE events
    # scan + one (user, hour) shuffle feeds both the grid and the counts
    # (was: a second full scan + user_id shuffle just for min/max ts). The
    # hourly frame is (users × active hours)-sized, so the eager checkpoint
    # materializes a keyspace-bounded relation, never raw events.
    ev = load_events(spark, sf_dir)
    cnt = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)  # feeds bounds AND the grid join
    )
    bounds = cnt.groupBy("user_id").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    return (
        grid.join(cnt, ["user_id", "h"], "left")
        .select(
            "user_id",
            F.unix_millis("h").alias("hour_ms"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Rolling time-range window (RANGE frame, not ROWS): trailing-7-day running
# value per user. Range frames are the time-series workhorse — peers with the
# same timestamp aggregate identically regardless of row order, which a ROWS
# frame can't guarantee under shuffle nondeterminism.
# ---------------------------------------------------------------------------
def q_rolling_7d_user_value(spark, sf_dir):
    from pyspark.sql.window import Window

    ev = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis("ts"))
        .rangeBetween(-604_800_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("rolling_7d"),
    )


# ---------------------------------------------------------------------------
# Value histogram: fixed-width binning per event_type (the profiling query a
# pipeline runs before choosing quality thresholds). Plain floor arithmetic
# so any engine bins identically.
# ---------------------------------------------------------------------------
def q_value_histogram(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    bucket = F.floor(F.col("value") / 10).cast("int")
    return ev.groupBy("event_type", bucket.alias("bucket")).agg(
        F.count("*").alias("n")
    )


# ---------------------------------------------------------------------------
# Data-quality gate over the fixture contract: the suite must come back
# CLEAN (the oracle asserts the same zero-violation facts), and the
# violation COUNTERS are what the hash pins.
# ---------------------------------------------------------------------------
@register(
    "dq_events_contract",
    """
SELECT
  CAST(COUNT(CASE WHEN event_id IS NULL THEN 1 END) AS BIGINT) AS null_event_id,
  CAST(COUNT(CASE WHEN user_id < 0 THEN 1 END) AS BIGINT) AS negative_user,
  CAST(COUNT(CASE WHEN value < 0 OR value > 1000 THEN 1 END) AS BIGINT) AS value_out_of_range,
  CAST((SELECT COUNT(*) FROM (SELECT event_id FROM events GROUP BY event_id HAVING COUNT(*) > 1)) AS BIGINT) AS dup_event_ids
FROM events
""",
)
def q_dq_events_contract(spark, sf_dir):
    from pulsar_replay_spark.operators.quality import unique_key_violations

    ev = load_events(spark, sf_dir)
    single_pass = ev.agg(
        F.count(F.when(F.col("event_id").isNull(), 1)).cast("bigint").alias("null_event_id"),
        F.count(F.when(F.col("user_id") < 0, 1)).cast("bigint").alias("negative_user"),
        F.count(F.when((F.col("value") < 0) | (F.col("value") > 1000), 1))
        .cast("bigint")
        .alias("value_out_of_range"),
    )
    dups = unique_key_violations(ev, ["event_id"]).agg(
        F.count("*").cast("bigint").alias("dup_event_ids")
    )
    return single_pass.join(dups)


ANOMALY_ORACLE = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS bucket,
         ROUND(SUM(value), 4) AS v
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, bucket, v,
         avg(v) OVER w AS mu,
         stddev_samp(v) OVER w AS sd,
         count(*) OVER w AS n
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, bucket, v,
       ROUND(mu, 6) AS mu,
       ROUND(sd, 6) AS sd,
       (n >= 12 AND sd > 0 AND abs(v - mu) > 3 * sd) AS is_anomaly
FROM stats
"""


def q_rolling_anomaly_flags(spark, sf_dir):
    """Rolling 3-sigma anomaly detection over the hourly per-type series:
    each bucket is scored against the PRECEDING 24 buckets' mean/stddev
    (trailing frame — the current point never contaminates its own
    baseline; <12 prior points = not enough history, never flagged).
    Shuffle shape: one (type, bucket) agg + one window per type — the
    as-of/window discipline; at 100 TB the hourly frame is
    bucket-keyspace-sized, not event-sized. Pytest-oracle-gated."""
    from pulsar_replay_spark.session import load_events

    ev = load_events(spark, sf_dir)
    hourly = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
        )
        .agg(F.round(F.sum("value"), 4).alias("v"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(-24, -1)
    )
    return hourly.select(
        "event_type",
        "bucket",
        "v",
        F.round(F.avg("v").over(w), 6).alias("mu"),
        F.round(F.stddev_samp("v").over(w), 6).alias("sd"),
        (
            (F.count("*").over(w) >= 12)
            & (F.stddev_samp("v").over(w) > 0)
            & (F.abs(F.col("v") - F.avg("v").over(w)) > 3 * F.stddev_samp("v").over(w))
        ).alias("is_anomaly"),
    )


INTERP_ORACLE = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS bucket,
         ROUND(SUM(value), 4) AS v
  FROM events GROUP BY 1, 2
),
spans AS (
  SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM hourly GROUP BY 1
),
grid AS (
  SELECT s.event_type, g.bucket
  FROM spans s, LATERAL (
    SELECT unnest(generate_series(s.lo, s.hi, INTERVAL '1 hour')) AS bucket
  ) g
),
joined AS (
  SELECT g.event_type, g.bucket, h.v FROM grid g
  LEFT JOIN hourly h ON h.event_type = g.event_type AND h.bucket = g.bucket
),
bounded AS (
  SELECT event_type, bucket, v,
         last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
         first_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY bucket
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
         CAST(max(CASE WHEN v IS NOT NULL THEN bucket END) OVER
           (PARTITION BY event_type ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS TIMESTAMP) AS prev_t,
         CAST(min(CASE WHEN v IS NOT NULL THEN bucket END) OVER
           (PARTITION BY event_type ORDER BY bucket
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS TIMESTAMP) AS next_t
  FROM joined
)
SELECT event_type, bucket,
       CASE
         WHEN v IS NOT NULL THEN v
         WHEN prev_v IS NULL THEN next_v
         WHEN next_v IS NULL THEN prev_v
         -- scaled-integer interpolation: exact in both engines (values are
         -- nonnegative, so floor division == truncation)
         ELSE (CAST(round(prev_v * 10000) AS BIGINT)
               * ((epoch(next_t)::BIGINT - epoch(bucket)::BIGINT) // 3600)
               + CAST(round(next_v * 10000) AS BIGINT)
               * ((epoch(bucket)::BIGINT - epoch(prev_t)::BIGINT) // 3600))
              // ((epoch(next_t)::BIGINT - epoch(prev_t)::BIGINT) // 3600)
              / 10000.0
       END AS v_filled,
       (v IS NULL) AS interpolated
FROM bounded
"""


def q_linear_interpolation(spark, sf_dir):
    """Linear gap-fill interpolation (the hypertable `interpolate()` shape):
    densify each type's hourly grid, then fill missing buckets by linear
    interpolation between the nearest real points (edges clamp to the
    nearest real value). All windows: last/first IGNORE NULLS for the
    bounding values, max/min-of-bucket for their positions — one grid
    broadcast + one window pass per direction, no self-join per gap.
    Pytest-oracle-gated."""
    from pulsar_replay_spark.session import load_events

    ev = load_events(spark, sf_dir)
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .agg(F.round(F.sum("value"), 4).alias("v"))
    )
    spans = hourly.groupBy("event_type").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = spans.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("bucket"),
    )
    joined = grid.join(hourly, ["event_type", "bucket"], "left")
    back = Window.partitionBy("event_type").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    fwd = Window.partitionBy("event_type").orderBy("bucket").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    prev_v = F.last("v", ignorenulls=True).over(back)
    next_v = F.first("v", ignorenulls=True).over(fwd)
    prev_t = F.max(F.when(F.col("v").isNotNull(), F.col("bucket"))).over(back)
    next_t = F.min(F.when(F.col("v").isNotNull(), F.col("bucket"))).over(fwd)
    # scaled-integer interpolation: both engines fold the same exact bigint
    # arithmetic, so no HALF_UP-vs-half-even split can appear at linear
    # midpoints of 4-decimal inputs (values are nonnegative, so floor
    # division == truncation in both engines)
    prev4 = F.round(prev_v * 10000).cast("bigint")
    next4 = F.round(next_v * 10000).cast("bigint")
    h_left = ((F.unix_timestamp(next_t) - F.unix_timestamp("bucket")) / 3600).cast(
        "bigint"
    )
    h_right = ((F.unix_timestamp("bucket") - F.unix_timestamp(prev_t)) / 3600).cast(
        "bigint"
    )
    h_span = ((F.unix_timestamp(next_t) - F.unix_timestamp(prev_t)) / 3600).cast(
        "bigint"
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(
            # `div` is exact bigint-domain integral division, matching the
            # oracle's `//`; floor(`/`) rounds through double and can differ
            # once the numerator passes 2^53
            F.call_function("div", prev4 * h_left + next4 * h_right, h_span)
            / F.lit(10000.0)
        )
    )
    return joined.select(
        "event_type",
        "bucket",
        filled.alias("v_filled"),
        F.col("v").isNull().alias("interpolated"),
    )


COHORT_ORACLE = """
WITH firsts AS (
  -- epoch-anchored 7d buckets (DuckDB's time_bucket anchors to 2000-01-03;
  -- the engine buckets on raw epoch — mirror that arithmetic exactly)
  SELECT user_id,
         to_timestamp((epoch(min(ts))::BIGINT // 604800) * 604800)::TIMESTAMP
           AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(((epoch(e.ts)::BIGINT // 604800) * 604800
               - epoch(f.cohort_week)::BIGINT) // 604800 AS INT) AS week_n
  FROM events e JOIN firsts f USING (user_id)
),
sizes AS (
  SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
  FROM firsts GROUP BY 1
)
SELECT a.cohort_week, a.week_n,
       CAST(count(*) AS BIGINT) AS n_active,
       s.cohort_size,
       ROUND(count(*) * 1.0 / s.cohort_size, 4) AS retention
FROM activity a JOIN sizes s USING (cohort_week)
GROUP BY a.cohort_week, a.week_n, s.cohort_size
"""


def q_cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-activity week, then
    the fraction of each cohort active N weeks later — the canonical
    product-analytics rollup. Shuffle shape: one per-user min (map-side
    combined), one distinct over (user, week) pairs, one |cohorts|-key agg
    with the cohort sizes broadcast back. Pytest-oracle-gated. 7-day
    buckets are epoch-anchored (`timestampdiff`-free: integer division of
    epoch seconds — identical in both engines)."""
    from pulsar_replay_spark.session import load_events

    ev = load_events(spark, sf_dir)
    week = lambda c: F.timestamp_seconds(  # noqa: E731 — epoch-anchored 7d bucket
        (F.unix_timestamp(c) / 604800).cast("bigint") * 604800
    )
    firsts = ev.groupBy("user_id").agg(week(F.min("ts")).alias("cohort_week"))
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                (F.unix_timestamp(week(F.col("ts"))) - F.unix_timestamp("cohort_week"))
                / 604800
            )
            .cast("int")
            .alias("week_n"),
        )
        .distinct()
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count("*").cast("bigint").alias("cohort_size")
    )
    return (
        activity.groupBy("cohort_week", "week_n")
        .agg(F.count("*").cast("bigint").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_n",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 4).alias("retention"),
        )
    )


FUNNEL_ORACLE = """
WITH steps AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click_any,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase_any
  FROM events GROUP BY user_id
),
ordered AS (
  SELECT user_id, t_signup,
         CASE WHEN t_signup IS NOT NULL THEN
           (SELECT min(ts) FROM events e
            WHERE e.user_id = steps.user_id AND e.event_type = 'click'
              AND e.ts >= t_signup) END AS t_click,
         NULL AS placeholder
  FROM steps
),
o2 AS (
  SELECT user_id, t_signup, t_click,
         CASE WHEN t_click IS NOT NULL THEN
           (SELECT min(ts) FROM events e
            WHERE e.user_id = o2_in.user_id AND e.event_type = 'purchase'
              AND e.ts >= t_click) END AS t_purchase
  FROM ordered o2_in
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(count(t_signup) AS BIGINT) AS step1_signup,
       CAST(count(t_click) AS BIGINT) AS step2_click,
       CAST(count(t_purchase) AS BIGINT) AS step3_purchase
FROM o2
"""


def q_funnel_steps(spark, sf_dir):
    """Ordered funnel: signup → (click at-or-after signup) → (purchase
    at-or-after that click), counting users reaching each step IN ORDER —
    the sequence constraint a naive per-type min gets wrong. One
    conditional-min pass per step over the per-user sequence: step k's
    threshold is step k-1's time, expressed as min(CASE WHEN type AND ts >=
    prev THEN ts) in the SAME grouped pass via a two-round agg (no
    per-user explode, no join per step). Pytest-oracle-gated."""
    from pulsar_replay_spark.session import load_events

    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts")
    s1 = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup")
    )
    s2 = (
        ev.join(s1, "user_id")
        .groupBy("user_id", "t_signup")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") >= F.col("t_signup")),
                    F.col("ts"),
                )
            ).alias("t_click")
        )
    )
    s3 = (
        ev.join(s2, "user_id")
        .groupBy("user_id", "t_signup", "t_click")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("t_click")),
                    F.col("ts"),
                )
            ).alias("t_purchase")
        )
    )
    return s3.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.count("t_signup").cast("bigint").alias("step1_signup"),
        F.count("t_click").cast("bigint").alias("step2_click"),
        F.count("t_purchase").cast("bigint").alias("step3_purchase"),
    )


TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
),
counts AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       ROUND(n * 1.0 / sum(n) OVER (PARTITION BY from_type), 4) AS p
FROM counts
"""


def q_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix between event types: per-user
    ordered sequences (lead window, event_id tie-break), pair counts, and
    row-normalized probabilities — the behavioral-model input next to the
    funnel/cohort reports. One window shuffle on user_id + one
    |types|²-key agg. Pytest-oracle-gated."""
    from pulsar_replay_spark.session import load_events

    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type").agg(
        F.count("*").cast("bigint").alias("n")
    )
    wn = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wn), 4).alias("p"),
    )


STICKINESS_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
),
dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM days GROUP BY 1),
mau AS (
  SELECT d1.d,
         CAST((SELECT count(DISTINCT user_id) FROM days d2
               WHERE d2.d > d1.d - INTERVAL 30 DAY AND d2.d <= d1.d) AS BIGINT)
           AS mau
  FROM (SELECT DISTINCT d FROM days) d1
)
SELECT dau.d, dau.dau, mau.mau,
       ROUND(dau.dau * 1.0 / mau.mau, 4) AS stickiness
FROM dau JOIN mau USING (d)
"""


def q_dau_mau_stickiness(spark, sf_dir):
    """DAU/MAU stickiness per day: daily actives over trailing-30-day
    actives — the classic engagement ratio. A RANGE-frame window would have
    to buffer user ids per frame (collect_set of users), so instead each
    active (user, day) contributes to every day in [d, d+29] via a 30-row
    explode of DAYS (bounded fan-out, never a user-id window buffer), then
    one distinct-count per day. Shuffles:
    (user, day) distinct + a 30× day fan-out agg — both bounded by
    users×days, independent of raw event volume. Pytest-oracle-gated."""
    from pulsar_replay_spark.session import load_events

    ev = load_events(spark, sf_dir)
    days = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    ).distinct()
    dau = days.groupBy("d").agg(F.count("*").cast("bigint").alias("dau"))
    # each active (user, day) counts toward MAU of days d..d+29 that EXIST
    contrib = days.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.col("d") + F.expr("interval 29 days"), F.expr("interval 1 day"))
        ).alias("d_target"),
    ).distinct()
    real_days = days.select("d").distinct()
    mau = (
        contrib.join(real_days, contrib.d_target == real_days.d)
        .groupBy("d")
        .agg(F.countDistinct("user_id").cast("bigint").alias("mau"))
    )
    return (
        dau.join(mau, "d")
        .select(
            "d",
            "dau",
            "mau",
            F.round(F.col("dau") / F.col("mau"), 4).alias("stickiness"),
        )
    )


ATTRIBUTION_ORACLE = """
WITH purchases AS (
  SELECT user_id, event_id AS purchase_id, ts AS p_ts
  FROM events WHERE event_type = 'purchase'
),
touches AS (
  SELECT p.purchase_id, p.user_id, p.p_ts, e.event_type, e.ts, e.event_id
  FROM purchases p JOIN events e
    ON e.user_id = p.user_id
   AND e.event_type IN ('view', 'click')
   AND e.ts >= p.p_ts - INTERVAL 1 DAY AND e.ts < p.p_ts
),
ranked AS (
  SELECT purchase_id, user_id, event_type,
         row_number() OVER (PARTITION BY purchase_id ORDER BY ts, event_id) AS rk_first,
         row_number() OVER (PARTITION BY purchase_id ORDER BY ts DESC, event_id DESC) AS rk_last
  FROM touches
)
SELECT f.purchase_id, f.user_id,
       f.event_type AS first_touch, l.event_type AS last_touch
FROM ranked f JOIN ranked l USING (purchase_id)
WHERE f.rk_first = 1 AND l.rk_last = 1
"""


def q_conversion_attribution(spark, sf_dir):
    """First- and last-touch attribution: for every purchase, the earliest
    and latest view/click in the trailing 24h lookback window. The lookback
    is the range-join shape (equi on user + time band — shuffle on user_id
    only, fan-out bounded by touches-per-day-per-user); both touches
    resolve in ONE window pass via min_by/max_by over (ts, event_id) struct
    ordering instead of two ranked self-joins. Pytest-oracle-gated."""
    from pulsar_replay_spark.session import load_events

    ev = load_events(spark, sf_dir).select("event_id", "user_id", "event_type", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    touches = purchases.join(
        ev.filter(F.col("event_type").isin("view", "click")).select(
            "user_id", F.col("event_type").alias("t_type"), "ts", "event_id"
        ),
        ["user_id"],
    ).filter(
        (F.col("ts") >= F.col("p_ts") - F.expr("INTERVAL 1 DAY"))
        & (F.col("ts") < F.col("p_ts"))
    )
    return touches.groupBy("purchase_id", "user_id").agg(
        F.min_by("t_type", F.struct("ts", "event_id")).alias("first_touch"),
        F.max_by("t_type", F.struct("ts", "event_id")).alias("last_touch"),
    )


SESSION_PATHS_ORACLE = """
WITH marked AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
),
paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM sess GROUP BY 1, 2
)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
HAVING count(*) >= 2
"""


def q_session_paths(spark, sf_dir):
    """Session path mining: the event-type sequence of every 30-min-gap
    session (the sessionize contract) collapsed to a '>'-joined path, then
    the paths occurring in ≥2 sessions — the behavioral sequence report on
    top of the funnel/transition family. One window pass shares the
    sessionize partitioning; the path string is built with an IN-ARRAY sort
    (array_sort on (ts, event_id, type) structs), never a second window.
    Pytest-oracle-gated."""
    from pulsar_replay_spark.session import load_events

    ev = load_events(spark, sf_dir)
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = ev.withColumn(
        "new_session",
        F.when(
            F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w_order)) > 1_800_000,
            1,
        ).otherwise(0),
    ).withColumn("session_id", F.sum("new_session").over(w_cum))
    paths = sess.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n_sessions"))
        .filter(F.col("n_sessions") >= 2)
    )
