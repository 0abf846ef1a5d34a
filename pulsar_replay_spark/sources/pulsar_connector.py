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


def paced_publish(
    rows,
    producer,
    rate_per_second: int,
    clock=None,
    sleep=None,
) -> int:
    """Rate-paced async publish of one partition's rows (S7 / T5 sink side).

    Reference semantics (``pulsar_remote_inspector.py:291-328``): batches of
    ``min(100, rate//10)`` messages (≥1), ``send_async`` per message inside
    the batch, sleep the remainder of ``batch_size/rate`` between batches,
    and a single ``flush()`` after the last message so everything async is
    on the wire before return. Returns the number of messages sent.

    ``producer`` needs ``send_async(payload, callback=None)`` and
    ``flush()`` — satisfied by a ``pulsar.Producer`` and by test stubs.
    ``clock``/``sleep`` are injectable so tests assert pacing without
    wall-clock sleeps. Designed to run per-partition (each executor
    partition gets ``rate/`` partitions share), never per-row on the driver.
    """
    import time as _time

    clock = clock or _time.monotonic
    sleep = sleep or _time.sleep
    if rate_per_second <= 0:
        raise ValueError("rate_per_second must be positive")
    batch_size = max(1, min(100, rate_per_second // 10))
    delay_between_batches = batch_size / rate_per_second

    sent = 0
    batch: list = []
    it = iter(rows)
    while True:
        batch.clear()
        for msg in it:
            batch.append(msg)
            if len(batch) >= batch_size:
                break
        if not batch:
            break
        batch_start = clock()
        for msg in batch:
            producer.send_async(msg, callback=None)
            sent += 1
        batch_time = clock() - batch_start
        if len(batch) == batch_size and batch_time < delay_between_batches:
            sleep(delay_between_batches - batch_time)
    producer.flush()
    return sent


def write_replay_paced(
    env: DataFrame,
    producer_factory,
    rate_per_second: int,
    partitions: int = 1,
) -> None:
    """Distributed replay at a bounded aggregate rate: each of ``partitions``
    partitions opens its own producer (connections can't cross the
    executor boundary) and paces at its share of the total rate — the
    scale-out form of the reference's single paced producer loop.
    ``producer_factory`` runs on the executor and must be serializable."""
    from pulsar_replay_spark.sources.jsonio import replay_frame

    per_part_rate = max(1, rate_per_second // partitions)
    payloads = replay_frame(env).select("payload")

    def _publish(rows) -> None:
        producer = producer_factory()
        try:
            paced_publish((r["payload"] for r in rows), producer, per_part_rate)
        finally:
            close = getattr(producer, "close", None)
            if close:
                close()

    payloads.repartition(partitions).foreachPartition(_publish)


# ---------------------------------------------------------------------------
# Admin REST catalog (S1/S2/S10/S11) — driver-side DDL, like the reference's
# pulsarctl/REST calls, but returning DataFrames for the listing operators.
# ---------------------------------------------------------------------------


def _admin_get(admin_url: str, path: str, token: str | None, ok_404: bool = False):
    """One Admin REST v2 GET (reference ``pulsar_remote_inspector.py:92-114``).

    ``ok_404=True`` mirrors the reference's silently-ignore-404 behavior for
    empty namespaces during the all-tenants walk; every other failure raises
    ``PulsarUnavailable`` (the reference prints-and-continues — swallowing a
    real outage as an empty catalog is the one behavior we don't copy)."""
    try:
        import requests
    except ImportError as e:  # pragma: no cover
        raise PulsarUnavailable("requests not installed") from e

    headers = {"Authorization": f"Bearer {token}"} if token else {}
    try:
        resp = requests.get(
            f"{admin_url.rstrip('/')}/{path.lstrip('/')}", headers=headers, timeout=3
        )
        if ok_404 and resp.status_code == 404:
            return None
        resp.raise_for_status()
        return resp.json()
    except Exception as e:
        raise PulsarUnavailable(str(e)) from e


def admin_list_tenants(
    spark: SparkSession, admin_url: str, token: str | None = None
) -> DataFrame:
    """S1/S2: live tenant listing via Admin REST v2
    (reference ``pulsar_remote_inspector.py:341-356``) — the cluster-backed
    twin of the fixture-derived catalog's tenant level."""
    result = _admin_get(admin_url, "admin/v2/tenants", token)
    tenants = result if isinstance(result, list) else []
    return spark.createDataFrame([(t,) for t in sorted(tenants)], "tenant string")


def admin_list_namespaces(
    spark: SparkSession,
    admin_url: str,
    tenant: str | None = None,
    token: str | None = None,
) -> DataFrame:
    """S1/S2: live namespace listing via Admin REST v2
    (reference ``pulsar_remote_inspector.py:358-392``): one tenant's
    namespaces, or — with no tenant — the walk over every tenant. A 404 on
    one tenant's listing means an empty tenant and is skipped, like the
    reference; any other failure raises.

    The walk is a driver-side loop over the TENANT list (tens of rows on
    any real cluster), not data-plane work — same shape as the reference."""
    if tenant is not None:
        result = _admin_get(admin_url, f"admin/v2/namespaces/{tenant}", token)
        namespaces = result if isinstance(result, list) else []
    else:
        tenants = _admin_get(admin_url, "admin/v2/tenants", token)
        namespaces = []
        for t in tenants if isinstance(tenants, list) else []:
            ns = _admin_get(admin_url, f"admin/v2/namespaces/{t}", token, ok_404=True)
            if ns:
                namespaces.extend(ns)
    return spark.createDataFrame(
        [(n,) for n in sorted(set(namespaces))], "namespace string"
    )


def admin_list_topics(
    spark: SparkSession, admin_url: str, tenant: str, namespace: str, token: str | None = None
) -> DataFrame:
    """S2: union of base/partitioned topic listings via Admin REST v2
    (reference ``pulsar_remote_inspector.py:394-458``), deduped, partition
    children collapsed."""
    names: set[str] = set()
    for path in (
        f"admin/v2/persistent/{tenant}/{namespace}",
        f"admin/v2/persistent/{tenant}/{namespace}/partitioned",
    ):
        result = _admin_get(admin_url, path, token)
        names.update(result if isinstance(result, list) else [])
    from pulsar_replay_spark.functions.codecs import collapse_partition

    df = spark.createDataFrame([(n,) for n in sorted(names)], "topic string")
    return df.select(collapse_partition(F.col("topic")).alias("topic")).distinct()
