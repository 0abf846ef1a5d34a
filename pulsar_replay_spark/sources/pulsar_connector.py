"""Thin, optional Pulsar connectivity (SURVEY §7 step 7).

Everything here degrades gracefully when no broker / connector jar is present
— correctness tests never touch it. The mapping targets the public
StreamNative ``pulsar-spark`` connector option surface; the catalog module
(S1/S2/S10/S11) uses the public Pulsar Admin REST v2 API via ``requests``.

Connector column mapping (reference envelope ⇄ connector schema):
  content/raw        ⇄ value (binary)
  partition_key      ⇄ __key
  event_timestamp    ⇄ __eventTime
  publish_timestamp  ⇄ __publishTime
  properties         ⇄ __properties (map<string,string>)
  topic              ⇄ __topic
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PULSAR_FORMAT = "pulsar"


class PulsarUnavailable(RuntimeError):
    pass


def read_topics(
    spark: SparkSession,
    service_url: str,
    admin_url: str,
    topics: list[str] | None = None,
    topics_pattern: str | None = None,
    starting_offsets: str = "earliest",
    max_per_topic: int | None = None,
) -> DataFrame:
    """Bounded topic scan (S3): non-destructive read from earliest — the
    connector, like the reference's Reader API, never commits a subscription.
    Per-topic bound applied declaratively (window row_number) when the
    connector can't push it down."""
    reader = (
        spark.read.format(PULSAR_FORMAT)
        .option("service.url", service_url)
        .option("admin.url", admin_url)
        .option("startingOffsets", starting_offsets)
    )
    if topics_pattern:
        reader = reader.option("topicsPattern", topics_pattern)
    elif topics:
        reader = reader.option("topics", ",".join(topics))
    else:
        raise ValueError("need topics or topics_pattern")
    try:
        df = reader.load()
    except Exception as e:  # connector jar / broker absent
        raise PulsarUnavailable(str(e)) from e
    env = df.select(
        F.col("__topic").alias("topic"),
        F.col("value").alias("raw"),
        F.col("__properties").alias("properties"),
        F.col("__publishTime").alias("publish_timestamp"),
        F.col("__eventTime").alias("event_timestamp"),
        F.col("__key").alias("partition_key"),
        # Unique per message: the deterministic tie-break for the bounded
        # scan (equal publish timestamps are common within a batch; sorting
        # on the timestamp alone would make the captured set nondeterministic
        # across runs).
        F.hex(F.col("__messageId")).alias("message_id"),
    )
    from pulsar_replay_spark.envelope import with_envelope

    env = with_envelope(env)
    if max_per_topic:
        from pulsar_replay_spark.operators.capture import bounded_scan

        env = bounded_scan(
            env, ts_col=F.col("publish_timestamp"), id_col="message_id",
            max_per_topic=max_per_topic,
        )
    return env


def write_replay(env: DataFrame, service_url: str, admin_url: str) -> None:
    """Replay sink (S6): re-publish preserving key/eventTime/properties.
    Batching (the reference's 100-msg/50 ms producer batching,
    ``pulsar_remote_inspector.py:174-179``) maps to connector producer
    options; micro-batch commit replaces the manual flush."""
    from pulsar_replay_spark.sources.jsonio import replay_frame

    out = replay_frame(env)
    try:
        (
            out.select(
                F.col("payload").alias("value"),
                F.col("partition_key").alias("__key"),
                F.col("event_timestamp").alias("__eventTime"),
                F.col("properties").alias("__properties"),
                F.col("topic").alias("__topic"),
            )
            .write.format(PULSAR_FORMAT)
            .option("service.url", service_url)
            .option("admin.url", admin_url)
            .option("pulsar.producer.batchingMaxMessages", "100")
            .option("pulsar.producer.batchingMaxPublishDelayMicros", "50000")
            .save()
        )
    except Exception as e:
        raise PulsarUnavailable(str(e)) from e


# ---------------------------------------------------------------------------
# Admin REST catalog (S1/S2/S10/S11) — driver-side DDL, like the reference's
# pulsarctl/REST calls, but returning DataFrames for the listing operators.
# ---------------------------------------------------------------------------


def admin_list_topics(
    spark: SparkSession, admin_url: str, tenant: str, namespace: str, token: str | None = None
) -> DataFrame:
    """S2: union of base/partitioned topic listings via Admin REST v2
    (reference ``pulsar_remote_inspector.py:394-458``), deduped, partition
    children collapsed."""
    try:
        import requests
    except ImportError as e:  # pragma: no cover
        raise PulsarUnavailable("requests not installed") from e

    headers = {"Authorization": f"Bearer {token}"} if token else {}
    names: set[str] = set()
    for endpoint in (
        f"{admin_url}/admin/v2/persistent/{tenant}/{namespace}",
        f"{admin_url}/admin/v2/persistent/{tenant}/{namespace}/partitioned",
    ):
        try:
            resp = requests.get(endpoint, headers=headers, timeout=3)
            resp.raise_for_status()
            names.update(resp.json())
        except Exception as e:
            raise PulsarUnavailable(str(e)) from e
    from pulsar_replay_spark.functions.codecs import collapse_partition

    df = spark.createDataFrame([(n,) for n in sorted(names)], "topic string")
    return df.select(collapse_partition(F.col("topic")).alias("topic")).distinct()
