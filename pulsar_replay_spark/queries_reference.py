"""Reference-surface queries (SURVEY §2) over the `events` fixture, each with
its DuckDB oracle.

The `events` table stands in for the Pulsar message stream (event_type ≈
message type, derived tenant/namespace/topic ≈ catalog — see
``catalog.EVENTS_TOPICS_SQL`` for the shared derivation).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pulsar_replay_spark import catalog
from pulsar_replay_spark.catalog import (
    EVENTS_TOPICS_SQL,
    SYSTEM_TENANTS,
    with_topics,
)
from pulsar_replay_spark.envelope import b64, decode_content, is_valid_utf8
from pulsar_replay_spark.functions.codecs import (
    collapse_partition,
    extract_project_id,
    is_partition_topic,
    topic_from_filename,
    topic_to_filename,
)
from pulsar_replay_spark.operators.capture import bounded_scan, capture_pipeline
from pulsar_replay_spark.registry import register
from pulsar_replay_spark.session import load_events

PART_RE_SQL = r"-partition-\d+$"


# ---------------------------------------------------------------------------
# Flagship: the capture pipeline (S3 + P1 + O3 + A1 composed).
# ---------------------------------------------------------------------------
@register(
    "capture_pipeline",
    EVENTS_TOPICS_SQL
    + rf"""
, scanned AS (
  SELECT *, row_number() OVER (PARTITION BY topic ORDER BY ts, event_id) AS rn
  FROM events_topics
  WHERE NOT regexp_matches(topic, '{PART_RE_SQL}')
)
SELECT topic,
       COUNT(*) AS n_msgs,
       epoch_ms(MIN(ts)) AS first_ts_ms,
       epoch_ms(MAX(ts)) AS last_ts_ms,
       ROUND(SUM(value), 2) AS sum_value
FROM scanned WHERE rn <= 10000
GROUP BY topic
""",
)
def q_capture_pipeline(spark, sf_dir):
    return capture_pipeline(load_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# A1 — per-(logical-)topic message count.
# ---------------------------------------------------------------------------
@register(
    "per_topic_count",
    EVENTS_TOPICS_SQL
    + rf"""
SELECT regexp_replace(topic, '{PART_RE_SQL}', '') AS topic, COUNT(*) AS n_msgs
FROM events_topics GROUP BY 1
""",
)
def q_per_topic_count(spark, sf_dir):
    ev = with_topics(load_events(spark, sf_dir))
    return (
        ev.withColumn("topic", collapse_partition(F.col("topic")))
        .groupBy("topic")
        .agg(F.count("*").alias("n_msgs"))
    )


# ---------------------------------------------------------------------------
# A2 — global count + filtered ratio ("Found N topics, M non-partition").
# ---------------------------------------------------------------------------
@register(
    "count_ratio",
    EVENTS_TOPICS_SQL
    + rf"""
SELECT COUNT(*) AS n_total,
       COUNT(CASE WHEN NOT regexp_matches(topic, '{PART_RE_SQL}') THEN 1 END) AS n_kept
FROM events_topics
""",
)
def q_count_ratio(spark, sf_dir):
    ev = with_topics(load_events(spark, sf_dir))
    return ev.agg(
        F.count("*").alias("n_total"),
        F.count(F.when(~is_partition_topic(F.col("topic")), 1)).alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# U1/A3 — three-way union of topic listings + distinct
# (pulsar_remote_inspector.py:400-421).
# ---------------------------------------------------------------------------
@register(
    "union_listings",
    EVENTS_TOPICS_SQL
    + rf"""
SELECT DISTINCT tenant, namespace, topic FROM (
  SELECT tenant, namespace, topic FROM events_topics
  WHERE NOT regexp_matches(topic, '{PART_RE_SQL}') AND tenant <> 'pulsar'
  UNION ALL
  SELECT tenant, namespace, regexp_replace(topic, '{PART_RE_SQL}', '') AS topic
  FROM events_topics WHERE regexp_matches(topic, '{PART_RE_SQL}')
  UNION ALL
  SELECT tenant, namespace, topic FROM events_topics WHERE tenant = 'pulsar'
)
""",
)
def q_union_listings(spark, sf_dir):
    return catalog.union_three_listings(load_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# P2/U2 — system-resource exclusion (NOT IN / anti) on the collapsed listing.
# ---------------------------------------------------------------------------
@register(
    "non_system_topics",
    EVENTS_TOPICS_SQL
    + rf"""
SELECT DISTINCT tenant, namespace, regexp_replace(topic, '{PART_RE_SQL}', '') AS topic
FROM events_topics
WHERE tenant NOT IN ({",".join(f"'{t}'" for t in SYSTEM_TENANTS)})
""",
)
def q_non_system_topics(spark, sf_dir):
    return catalog.non_system_topics(load_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# O2/O4 — top-N topic listing with per-tenant/per-namespace caps and
# priority-pattern namespaces first (pulsar_remote_inspector.py:394,477-534).
# ---------------------------------------------------------------------------
@register(
    "top_n_topics",
    EVENTS_TOPICS_SQL
    + rf"""
, lt AS (
  SELECT DISTINCT tenant, namespace, regexp_replace(topic, '{PART_RE_SQL}', '') AS topic
  FROM events_topics
),
p AS (
  SELECT *, CASE WHEN regexp_matches(namespace, '{catalog.PRIORITY_NS_RE}') THEN 1 ELSE 0 END AS is_priority
  FROM lt
),
a AS (
  SELECT *, row_number() OVER (PARTITION BY tenant, namespace ORDER BY topic) AS rn_ns FROM p
),
b AS (
  SELECT *, row_number() OVER (PARTITION BY tenant ORDER BY is_priority DESC, namespace, topic) AS rn_tenant
  FROM a WHERE rn_ns <= 5
)
SELECT tenant, namespace, topic, is_priority
FROM b WHERE rn_tenant <= 10
ORDER BY is_priority DESC, tenant, namespace, topic
LIMIT 50
""",
)
def q_top_n_topics(spark, sf_dir):
    return catalog.top_n_topics(load_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# O3 — per-topic bounded scan, row-level output (config.json:9 semantics).
# ---------------------------------------------------------------------------
@register(
    "per_topic_limit",
    EVENTS_TOPICS_SQL
    + r"""
, scanned AS (
  SELECT topic, event_id, ts, row_number() OVER (PARTITION BY topic ORDER BY ts, event_id) AS rn
  FROM events_topics
)
SELECT topic, event_id, epoch_ms(ts) AS ts_ms
FROM scanned WHERE rn <= 5
""",
)
def q_per_topic_limit(spark, sf_dir):
    ev = with_topics(load_events(spark, sf_dir))
    return bounded_scan(ev, max_per_topic=5).select(
        "topic", "event_id", F.unix_millis("ts").alias("ts_ms")
    )


# ---------------------------------------------------------------------------
# P4 — priority-namespace filter (substring patterns org-1|global|dlq).
# ---------------------------------------------------------------------------
@register(
    "priority_namespaces",
    EVENTS_TOPICS_SQL
    + rf"""
SELECT namespace, COUNT(DISTINCT topic) AS n_topics, COUNT(*) AS n_msgs
FROM events_topics
WHERE regexp_matches(namespace, '{catalog.PRIORITY_NS_RE}')
GROUP BY namespace
""",
)
def q_priority_namespaces(spark, sf_dir):
    ev = with_topics(load_events(spark, sf_dir))
    return (
        ev.filter(F.col("namespace").rlike(catalog.PRIORITY_NS_RE))
        .groupBy("namespace")
        .agg(
            F.countDistinct("topic").alias("n_topics"),
            F.count("*").alias("n_msgs"),
        )
    )


# ---------------------------------------------------------------------------
# P5 — project-id extraction from topic names
# (pulsar_remote_inspector.py:188-195).
# ---------------------------------------------------------------------------
@register(
    "project_id_extract",
    r"""
WITH ing AS (
  SELECT 'persistent://eventbus/org-1/'
         || CASE WHEN event_id % 7 = 0 THEN 'post-' ELSE '' END
         || CASE WHEN event_id % 3 = 0 THEN 'ingestion-' || CAST(user_id % 50 AS VARCHAR)
                 ELSE 'other-' || event_type END AS topic,
         value
  FROM events
)
SELECT CAST(NULLIF(regexp_extract(topic, '(?:post-)?ingestion-(\d+)', 1), '') AS INT) AS project_id,
       COUNT(*) AS n,
       ROUND(SUM(value), 2) AS sum_value
FROM ing GROUP BY 1
""",
)
def q_project_id_extract(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    topic = F.concat(
        F.lit("persistent://eventbus/org-1/"),
        F.when((F.col("event_id") % 7) == 0, F.lit("post-")).otherwise(F.lit("")),
        F.when(
            (F.col("event_id") % 3) == 0,
            F.concat(F.lit("ingestion-"), (F.col("user_id") % 50).cast("string")),
        ).otherwise(F.concat(F.lit("other-"), F.col("event_type"))),
    )
    return (
        ev.withColumn("topic", topic)
        .groupBy(extract_project_id(F.col("topic")).alias("project_id"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


# ---------------------------------------------------------------------------
# P7 — topic↔filename codec round-trip (pulsar_backup_restore.py:103,192).
# ---------------------------------------------------------------------------
@register(
    "topic_codec",
    EVENTS_TOPICS_SQL
    + r"""
SELECT DISTINCT topic,
       replace(replace(topic, '/', '_'), ':', '+') AS fname,
       replace(replace(replace(replace(topic, '/', '_'), ':', '+'), '_', '/'), '+', ':') = topic
         AS roundtrip_ok
FROM events_topics
""",
)
def q_topic_codec(spark, sf_dir):
    ev = with_topics(load_events(spark, sf_dir))
    return ev.select(
        "topic",
        topic_to_filename(F.col("topic")).alias("fname"),
        (topic_from_filename(topic_to_filename(F.col("topic"))) == F.col("topic")).alias(
            "roundtrip_ok"
        ),
    ).distinct()


# ---------------------------------------------------------------------------
# P8 — charset-fallback content codec over documents (UTF-8 branch; the
# invalid-UTF-8 branch is covered by tests/test_envelope.py).
# ---------------------------------------------------------------------------
@register(
    "content_codec",
    """
SELECT doc_id,
       base64(encode(text)) AS b64,
       octet_length(encode(text)) AS byte_len
FROM documents
""",
)
def q_content_codec(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    raw = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        b64(raw).alias("b64"),
        F.octet_length(raw).alias("byte_len"),
    )


# ---------------------------------------------------------------------------
# JSON family — get_json_object over events.props (§2.8).
# ---------------------------------------------------------------------------
@register(
    "json_props",
    """
SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
       COUNT(*) AS n,
       ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY 1
""",
)
def q_json_props(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy((k % 10).alias("k_bucket"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


# ---------------------------------------------------------------------------
# S9 — deterministic synthetic generator (emailSend shape,
# pulsar_remote_inspector.py:197-256) as pure expressions over a range source.
# Seeded by row id (not rand()) so the oracle reproduces it exactly.
# ---------------------------------------------------------------------------
GENERATOR_N = 1000


@register(
    "generator",
    f"""
SELECT id,
       md5('event-' || CAST(id AS VARCHAR)) AS event_id_hex,
       (CASE WHEN id % 3 = 0 THEN 'alex' WHEN id % 3 = 1 THEN 'sam' ELSE 'jordan' END)
         || '.' || (CASE WHEN id % 4 = 0 THEN '99' WHEN id % 4 = 1 THEN 'dev'
                         WHEN id % 4 = 2 THEN 'x' ELSE '7' END)
         || '@' || (CASE WHEN id % 3 = 0 THEN 'example.com' WHEN id % 3 = 1 THEN 'test.org'
                         ELSE 'mail.net' END) AS user_key,
       CAST(1000 + (id * 37) % 50 AS INT) AS campaign_id,
       CAST(500 + (id * 13) % 20 AS INT) AS template_id,
       CAST(100 + id % 7 AS INT) AS project_id,
       strftime(epoch_ms(CAST(1700000000000 + id * 1000 AS BIGINT)), '%Y-%m-%dT%H:%M:%SZ') AS created_at
FROM range({GENERATOR_N}) t(id)
""",
)
def q_generator(spark, sf_dir):
    from pulsar_replay_spark.generator import generate_flat

    return generate_flat(spark, GENERATOR_N)


# ---------------------------------------------------------------------------
# Timestamp functions (§2.8 date/time) — monthly rollup of orders.
# ---------------------------------------------------------------------------
@register(
    "orders_by_month",
    """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders GROUP BY 1
""",
)
def q_orders_by_month(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# T8-adjacent (batch form) — tumbling-window counts per event_type; the
# streaming variant (watermark + window) is tested in tests/test_streaming.py.
# ---------------------------------------------------------------------------
@register(
    "tumbling_window_counts",
    """
SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms,
       event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY 1, 2
""",
)
def q_tumbling_window_counts(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Sliding windows (1 h window, 30 min slide): each event lands in 2 windows.
# ---------------------------------------------------------------------------
@register(
    "sliding_window_counts",
    """
WITH exploded AS (
  SELECT (epoch_ms(ts) // 1800000) * 1800000 AS window_start_ms, value FROM events
  UNION ALL
  SELECT ((epoch_ms(ts) // 1800000) - 1) * 1800000 AS window_start_ms, value FROM events
)
SELECT window_start_ms, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
FROM exploded GROUP BY 1
""",
)
def q_sliding_window_counts(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.unix_millis(F.col("w.start")).alias("window_start_ms"), "n", "sum_value")
    )


# ---------------------------------------------------------------------------
# Sessionization (gap-based), batch form via lag + cumulative sum — the
# session_window streaming variant lives in tests/test_streaming.py.
# 30-minute inactivity gap per user.
# ---------------------------------------------------------------------------
@register(
    "sessionize",
    """
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   > 1800000 THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, event_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       epoch_ms(MIN(ts)) AS session_start_ms,
       epoch_ms(MAX(ts)) AS session_end_ms,
       ROUND(SUM(value), 2) AS sum_value
FROM sess GROUP BY user_id, session_id
""",
)
def q_sessionize(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = ev.withColumn(
        "new_session",
        F.when(
            F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w_order)) > 1_800_000, 1
        ).otherwise(0),
    )
    sess = marked.withColumn("session_id", F.sum("new_session").over(w_cum))
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.unix_millis(F.min("ts")).alias("session_start_ms"),
        F.unix_millis(F.max("ts")).alias("session_end_ms"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
