"""Catalog operators: the tenant → namespace → topic hierarchy (SURVEY §1.1).

The reference enumerates this catalog by shelling to ``pulsarctl`` / the Admin
REST API (``pulsar_backup_restore.py:54-96``,
``pulsar_remote_inspector.py:341-458``). Here the catalog is data: a topics
DataFrame. For the oracle-checked correctness corpus we derive a deterministic
topics view from the ``events`` fixture table; the SAME derivation is written
once as a Spark expression and once as a DuckDB CTE so driver comparisons are
exact.

Operators covered: S1/S2 (listings), U1 (3-way union+distinct,
``pulsar_remote_inspector.py:400-421``), U2 (except,
``pulsar_backup_restore.py:87,246``), P1/P6 (partition anti-filter/collapse),
P2 (system exclusion, ``config.json:11-14``), P4/O4 (priority namespaces,
``pulsar_remote_inspector.py:477-491``), O1 (lexicographic sort), O2 (top-N
with nested tenant/namespace caps, ``pulsar_remote_inspector.py:394,480-534``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pulsar_replay_spark.functions.codecs import collapse_partition, is_partition_topic

# System-resource exclusion lists (reference config.json:11-14).
SYSTEM_TENANTS = ["public", "pulsar", "system"]
SYSTEM_NAMESPACES = ["functions", "system"]
PRIORITY_NS_RE = "org-1|global|dlq"  # pulsar_remote_inspector.py:477

# ---------------------------------------------------------------------------
# Deterministic topics view over the `events` fixture. Tenant/namespace/topic
# are pure arithmetic on event_id/user_id/event_type so DuckDB reproduces them
# exactly. ~1 in 5 rows is a partition child; 1 in 11 belongs to a system
# tenant; one namespace in 4 matches the priority pattern.
# ---------------------------------------------------------------------------


def with_topics(events: DataFrame) -> DataFrame:
    """Add tenant/namespace/topic columns to `events` — a pure projection
    (no shuffle, stays inside the scan's whole-stage codegen)."""
    tenant = F.when((F.col("event_id") % 11) == 0, F.lit("pulsar")).otherwise(
        F.concat(F.lit("tenant-"), (F.col("event_id") % 3).cast("string"))
    )
    ns_base = F.when((F.col("user_id") % 4) == 0, F.lit("org-1")).otherwise(
        F.concat(F.lit("ns-"), (F.col("user_id") % 4).cast("string"))
    )
    topic = F.concat(
        F.lit("persistent://"),
        tenant,
        F.lit("/"),
        ns_base,
        F.lit("/"),
        F.col("event_type"),
        F.lit("-"),
        (F.col("user_id") % 5).cast("string"),
        F.when(
            (F.col("event_id") % 5) == 0,
            F.concat(F.lit("-partition-"), (F.col("event_id") % 4).cast("string")),
        ).otherwise(F.lit("")),
    )
    return (
        events.withColumn("tenant", tenant)
        .withColumn("namespace", ns_base)
        .withColumn("topic", topic)
    )


def topics_view(events: DataFrame) -> DataFrame:
    return with_topics(events).select("event_id", "tenant", "namespace", "topic")


# The same derivation as a DuckDB CTE (kept textually adjacent so the two
# stay in lockstep — any edit here must change both). Carries every event
# column so downstream oracle SQL can reference ts/value/props.
EVENTS_TOPICS_SQL = """
WITH events_topics AS (
  SELECT
    e.*,
    CASE WHEN event_id % 11 = 0 THEN 'pulsar'
         ELSE 'tenant-' || CAST(event_id % 3 AS VARCHAR) END AS tenant,
    CASE WHEN user_id % 4 = 0 THEN 'org-1'
         ELSE 'ns-' || CAST(user_id % 4 AS VARCHAR) END AS namespace,
    'persistent://'
      || CASE WHEN event_id % 11 = 0 THEN 'pulsar'
              ELSE 'tenant-' || CAST(event_id % 3 AS VARCHAR) END
      || '/'
      || CASE WHEN user_id % 4 = 0 THEN 'org-1'
              ELSE 'ns-' || CAST(user_id % 4 AS VARCHAR) END
      || '/' || event_type || '-' || CAST(user_id % 5 AS VARCHAR)
      || CASE WHEN event_id % 5 = 0
              THEN '-partition-' || CAST(event_id % 4 AS VARCHAR)
              ELSE '' END AS topic
  FROM events e
)
"""
TOPICS_VIEW_SQL = EVENTS_TOPICS_SQL + """
, topics_view AS (
  SELECT event_id, tenant, namespace, topic FROM events_topics
)
"""


def list_topics(events: DataFrame) -> DataFrame:
    """Distinct logical topics, partition children collapsed then deduped
    (A3/P6; reference ``pulsar_remote_inspector.py:430-446``)."""
    return (
        topics_view(events)
        .select(
            F.col("tenant"),
            F.col("namespace"),
            collapse_partition(F.col("topic")).alias("topic"),
        )
        .distinct()
    )


def union_three_listings(events: DataFrame) -> DataFrame:
    """U1: base ∪ partitioned ∪ system topic listings, deduped
    (reference ``pulsar_remote_inspector.py:400-421``). The three listings are
    disjoint slices re-unioned — the shape (3 API calls unioned + distinct),
    not a tautology: partitioned listing collapses children first."""
    t = topics_view(events)
    base = t.filter(~is_partition_topic(F.col("topic")) & (F.col("tenant") != "pulsar"))
    partitioned = t.filter(is_partition_topic(F.col("topic"))).select(
        F.col("tenant"), F.col("namespace"), collapse_partition(F.col("topic")).alias("topic")
    )
    system = t.filter(F.col("tenant") == "pulsar")
    return (
        base.select("tenant", "namespace", "topic")
        .unionByName(partitioned.select("tenant", "namespace", "topic"))
        .unionByName(system.select("tenant", "namespace", "topic"))
        .distinct()
    )


def non_system_topics(events: DataFrame) -> DataFrame:
    """P2/U2: all topics except system tenants — left-anti semantics via
    NOT IN (reference ``pulsar_backup_restore.py:246,259``)."""
    return list_topics(events).filter(~F.col("tenant").isin(SYSTEM_TENANTS))


def top_n_topics(events: DataFrame, limit: int = 50, per_tenant: int = 10, per_ns: int = 5) -> DataFrame:
    """O2/O4: priority-pattern namespaces first, then ≤`per_ns` topics per
    namespace, ≤`per_tenant` per tenant, global `limit`
    (reference ``pulsar_remote_inspector.py:394,477-491,531-534``).

    Scale note: the windows partition by namespace/tenant — bounded-cardinality
    keys — and the final global top-N is a `limit` Catalyst turns into
    CollectLimit; no full sort of the topic universe is materialized.
    """
    t = list_topics(events).withColumn(
        "is_priority", F.col("namespace").rlike(PRIORITY_NS_RE).cast("int")
    )
    w_ns = Window.partitionBy("tenant", "namespace").orderBy("topic")
    w_tenant = Window.partitionBy("tenant").orderBy(F.desc("is_priority"), "namespace", "topic")
    return (
        t.withColumn("rn_ns", F.row_number().over(w_ns))
        .filter(F.col("rn_ns") <= per_ns)
        .withColumn("rn_tenant", F.row_number().over(w_tenant))
        .filter(F.col("rn_tenant") <= per_tenant)
        .orderBy(F.desc("is_priority"), "tenant", "namespace", "topic")
        .limit(limit)
        .select("tenant", "namespace", "topic", "is_priority")
    )
