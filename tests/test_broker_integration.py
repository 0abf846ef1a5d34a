"""Opt-in live-broker integration for S1/S2/S3/S6 — the half of the surface
this sandbox cannot exercise (no broker, no connector jar). Set

    PULSAR_ADMIN_URL=http://broker:8080          (required to un-skip)
    PULSAR_SERVICE_URL=pulsar://broker:6650      (required for S3/S6)
    PULSAR_TOKEN=...                             (optional bearer token)
    PULSAR_TEST_TOPIC=persistent://public/default/spark-graft-it
                                                 (optional, default shown)

against a real cluster to run the full round-trip: catalog listings walk the
live Admin API (reference ``pulsar_remote_inspector.py:341-458``), then a
replay-publish → bounded-scan loop verifies the envelope survives the broker
byte-for-byte (reference ``pulsar_backup_restore.py:100-137,202-219``).

Everything here runs through the same public functions the HTTP-stub tests
gate; this module only swaps the stub for a cluster.
"""

from __future__ import annotations

import os
import uuid

import pytest

ADMIN = os.environ.get("PULSAR_ADMIN_URL")
SERVICE = os.environ.get("PULSAR_SERVICE_URL")
TOKEN = os.environ.get("PULSAR_TOKEN")
TOPIC = os.environ.get(
    "PULSAR_TEST_TOPIC", "persistent://public/default/spark-graft-it"
)

pytestmark = pytest.mark.skipif(
    not ADMIN, reason="no live broker: set PULSAR_ADMIN_URL to enable"
)


def test_live_catalog_walk(spark):
    """S1/S2 against the cluster: tenants → namespaces → topics, each level
    non-empty-schema'd and consistent with the level above."""
    from pulsar_replay_spark.sources.pulsar_connector import (
        admin_list_namespaces,
        admin_list_tenants,
        admin_list_topics,
    )

    tenants = [r["tenant"] for r in admin_list_tenants(spark, ADMIN, TOKEN).collect()]
    assert "public" in tenants  # every Pulsar cluster ships the public tenant

    all_ns = [
        r["namespace"] for r in admin_list_namespaces(spark, ADMIN, token=TOKEN).collect()
    ]
    pub_ns = [
        r["namespace"]
        for r in admin_list_namespaces(spark, ADMIN, "public", TOKEN).collect()
    ]
    assert set(pub_ns) <= set(all_ns)
    assert all(ns.split("/")[0] in tenants for ns in all_ns)

    t, ns = pub_ns[0].split("/", 1)
    topics = admin_list_topics(spark, ADMIN, t, ns, TOKEN)
    assert topics.columns == ["topic"]  # may be empty; shape is the contract


@pytest.mark.skipif(not SERVICE, reason="set PULSAR_SERVICE_URL for S3/S6")
def test_live_publish_capture_roundtrip(spark):
    """S6 → S3 round-trip: synthesize envelopes, replay-publish them, scan
    them back bounded, and compare payload/key/properties byte-for-byte."""
    from pulsar_replay_spark.generator import generate_emailsend
    from pulsar_replay_spark.sources.pulsar_connector import (
        read_topics,
        write_replay,
    )

    marker = uuid.uuid4().hex
    env = (
        generate_emailsend(spark, 50)
        .selectExpr(
            "cast(json as binary) as content",
            "cast(id as string) as partition_key",
            "timestamp as event_timestamp",
            f"map('it_marker', '{marker}') as properties",
            f"'{TOPIC}' as topic",
        )
    )
    from pulsar_replay_spark.envelope import with_envelope

    env = with_envelope(env.withColumn("raw", env.content))
    sent = {r["partition_key"]: bytes(r["raw"]) for r in env.collect()}

    write_replay(env, SERVICE, ADMIN)

    got = (
        read_topics(spark, SERVICE, ADMIN, topics=[TOPIC], max_per_topic=10_000)
        .where(f"properties['it_marker'] = '{marker}'")
        .collect()
    )
    assert {r["partition_key"]: bytes(r["raw"]) for r in got} == sent
