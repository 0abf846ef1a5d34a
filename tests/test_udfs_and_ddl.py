"""Arrow UDF seams pinned against JVM twins; catalog DDL plans; console sink."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pulsar_replay_spark.catalog import SYSTEM_TENANTS, list_topics
from pulsar_replay_spark.catalog_ddl import deletion_plan, execute_plan, restore_plan


def test_pandas_udf_matches_jvm_token_count(spark, documents):
    from pulsar_replay_spark.functions.text import token_count
    from pulsar_replay_spark.functions.udfs import ws_token_count_udf

    df = documents.select(
        token_count(F.col("text")).alias("jvm"),
        ws_token_count_udf(F.col("text")).alias("py"),
    )
    assert df.filter(F.col("jvm") != F.col("py")).count() == 0


def test_quality_score_udf_bounds(spark, documents):
    from pulsar_replay_spark.functions.udfs import quality_score_udf

    scores = documents.select(quality_score_udf(F.col("text")).alias("s")).collect()
    assert all(0.0 <= r["s"] <= 1.0 for r in scores)


def test_zscore_pandas_matches_window(spark, events):
    from pulsar_replay_spark.operators.stats import zscore_by_group, zscore_by_group_sql

    a = sorted(map(tuple, zscore_by_group(events).collect()))
    b = sorted(map(tuple, zscore_by_group_sql(events).collect()))
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra[:3] == rb[:3]
        assert ra[3] == pytest.approx(rb[3], abs=1e-9)


def test_restore_plan_order(spark, events):
    topics = list_topics(events)
    plan = restore_plan(topics).collect()
    steps = [r["step"] for r in plan]
    assert steps == sorted(steps)  # tenants before namespaces before topics
    ops = {r["op"] for r in plan}
    assert ops == {"create-tenant", "create-namespace", "create-topic"}


def test_deletion_plan_excludes_system_and_requires_confirm(spark, events):
    topics = list_topics(events)
    plan = deletion_plan(topics)
    assert plan.filter(F.col("target").isin(SYSTEM_TENANTS)).count() == 0
    with pytest.raises(PermissionError, match="DELETE"):
        execute_plan(plan, "http://localhost:0")  # guard fires before any I/O


def test_console_sink_runs(spark, capsys, tmp_path):
    from pulsar_replay_spark.envelope import synthetic_envelope
    from pulsar_replay_spark.sources.console import print_messages

    print_messages(synthetic_envelope(spark, 50).drop("raw"), n=5)
    out = capsys.readouterr().out
    assert "topic" in out and "n_msgs" in out


def test_from_json_tolerates_garbage(spark):
    """Malformed payloads must parse to NULL, never fail the job."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, '{"a": "1"}'), (2, "{not json"), (3, None), (4, '["wrong shape"]')],
        "id long, props string",
    )
    out = df.withColumn("p", F.from_json("props", "map<string,string>")).collect()
    by_id = {r["id"]: r["p"] for r in out}
    assert by_id[1] == {"a": "1"}
    assert by_id[2] is None and by_id[3] is None and by_id[4] is None


def test_topic_parts_udtf(spark):
    """UDTF surface: registered table function usable from SQL text and
    lateral-joined over a column."""
    from pulsar_replay_spark.functions.udfs import topic_parts_udtf

    spark.udtf.register("topic_parts", topic_parts_udtf())
    rows = spark.sql(
        "SELECT * FROM topic_parts('persistent://eventbus/org-1/post-ingestion-495')"
    ).collect()
    assert [(r["role"], r["segment"]) for r in rows] == [
        ("domain", "persistent"),
        ("tenant", "eventbus"),
        ("namespace", "org-1"),
        ("topic", "post-ingestion-495"),
    ]
    # lateral join over a table of topics
    spark.createDataFrame(
        [("persistent://t1/ns/a",), ("non-persistent://t2/ns2/b",)], "topic string"
    ).createOrReplaceTempView("topics_v")
    out = spark.sql(
        "SELECT t.topic, p.role, p.segment FROM topics_v t, "
        "LATERAL topic_parts(t.topic) p WHERE p.role = 'tenant'"
    ).collect()
    assert sorted((r["topic"], r["segment"]) for r in out) == [
        ("non-persistent://t2/ns2/b", "t2"),
        ("persistent://t1/ns/a", "t1"),
    ]


def test_normalize_and_redact(spark):
    from pyspark.sql import functions as F

    from pulsar_replay_spark.functions.text import normalize_text, redact_pii

    df = spark.createDataFrame(
        [
            (1, "  The   QUICK brown\tfox "),
            (2, "contact bob.smith+x@corp.example.COM or https://ex.com/a?id=1234567 now"),
            (3, "account 123456789 and short 12345"),
        ],
        "id long, text string",
    )
    out = {r["id"]: (r["norm"], r["red"]) for r in df.select(
        "id",
        normalize_text(F.col("text")).alias("norm"),
        redact_pii(F.col("text")).alias("red"),
    ).collect()}
    assert out[1][0] == "the quick brown fox"
    assert "<EMAIL>" in out[2][1] and "<URL>" in out[2][1]
    assert "bob.smith" not in out[2][1] and "1234567" not in out[2][1]
    assert out[3][1] == "account <NUM> and short 12345"  # 6+ digits only
    # idempotent: redacting redacted text is a no-op
    again = df.select(redact_pii(redact_pii(F.col("text"))).alias("r2"),
                      redact_pii(F.col("text")).alias("r1")).collect()
    assert all(r["r1"] == r["r2"] for r in again)


def test_redact_phone_and_ip(spark):
    """r8 PII breadth: IPv4 and phone numbers redact; version strings,
    dates, and short math terms survive; the chain stays idempotent
    (property-tested below over random compositions)."""
    from pyspark.sql import functions as F

    from pulsar_replay_spark.functions.text import redact_pii

    cases = [
        # (input, expected)
        ("server at 192.168.10.254 port 80", "server at <IP> port 80"),
        ("gateway 10.0.0.1.", "gateway <IP>."),
        ("octet too big 300.1.2.3 stays", "octet too big 300.1.2.3 stays"),
        ("release v1.2.3 of lib", "release v1.2.3 of lib"),
        ("dated 15.08.2026 and 2026-08-15", "dated 15.08.2026 and 2026-08-15"),
        ("call (555) 123-4567 today", "call <PHONE> today"),
        ("or 555.123.4567 works", "or <PHONE> works"),
        ("intl +1 415 555 2671 line", "intl <PHONE> line"),
        ("intl +44-20-7946-0958!", "intl <PHONE>!"),
        ("sum +123 is fine", "sum +123 is fine"),
        ("plain 4155552671 is a digit run", "plain <NUM> is a digit run"),
        # URL containing an IP must be eaten by the URL rule first
        ("see http://10.0.0.1/x?p=1234567", "see <URL>"),
    ]
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(cases)], "id long, text string"
    )
    out = {
        r["id"]: r["red"]
        for r in df.select(
            "id", redact_pii(F.col("text")).alias("red")
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert out[i] == want, f"case {i}: {out[i]!r} != {want!r}"


def test_redact_idempotent_property(spark):
    """Hypothesis-style property via seeded random composition: for texts
    assembled from PII-ish and benign fragments in any order,
    redact(redact(x)) == redact(x)."""
    import random

    from pyspark.sql import functions as F

    from pulsar_replay_spark.functions.text import redact_pii

    frags = [
        "a@b.co", "http://x.io/1234567", "10.0.0.1", "+1 415 555 2671",
        "(555) 123-4567", "123456789", "v1.2.3", "2026-08-15", "hello",
        "+12", "999.999.999.999", "short 123",
    ]
    rng = random.Random(8)
    rows = [
        (i, " ".join(rng.choice(frags) for _ in range(rng.randint(1, 8))))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = df.select(
        redact_pii(F.col("text")).alias("r1"),
        redact_pii(redact_pii(F.col("text"))).alias("r2"),
    ).collect()
    assert all(r["r1"] == r["r2"] for r in got)
    # and every raw PII fragment is gone from the redacted corpus
    joined = " | ".join(r["r1"] for r in got)
    for leak in ("a@b.co", "10.0.0.1", "555 2671", "123-4567", "123456789"):
        assert leak not in joined


def test_check_suite_catches_planted_violations(spark):
    from pyspark.sql import functions as F

    from pulsar_replay_spark.operators.quality import (
        check_suite,
        referential_violations,
        unique_key_violations,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (2, 20.0), (None, 3.0)], "id long, v double"
    )
    out = {r["check"]: r["n_violations"] for r in check_suite(
        df, {"null_id": F.col("id").isNull(), "neg_v": F.col("v") < 0}
    ).collect()}
    assert out == {"null_id": 1, "neg_v": 1}
    assert unique_key_violations(df, ["id"]).count() == 1  # id=2 twice
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    orphans = referential_violations(df, parent, "id", "pk").count()
    assert orphans == 1  # the NULL id has no parent

    # clean frame -> empty suite
    clean = spark.createDataFrame([(1, 1.0)], "id long, v double")
    assert check_suite(clean, {"null_id": F.col("id").isNull()}).count() == 0


# --- reference publish knobs on the generator ------------------------------


def test_generator_publish_knobs(spark):
    from pulsar_replay_spark.generator import generate_emailsend

    # explicit campaign pool: every campaignId drawn from it, deterministically
    pool = [7, 11, 13]
    doc = generate_emailsend(spark, 50, campaign_ids=pool)
    camps = {r[0] for r in doc.select("doc.payload.data.diff.campaignId").collect()}
    assert camps <= set(pool) and len(camps) == len(pool)

    # campaign range generation (reference --campaign-start/--campaign-count)
    doc = generate_emailsend(spark, 50, campaign_start=2000, campaign_count=4)
    camps = {r[0] for r in doc.select("doc.payload.data.diff.campaignId").collect()}
    assert camps <= set(range(2000, 2004)) and len(camps) == 4

    # explicit project id wins everywhere it lands in the doc
    doc = generate_emailsend(spark, 10, project_id=42)
    rows = doc.select(
        "doc.payload.projectId", "doc.payload.metadata.esContext.esProjectId"
    ).collect()
    assert all(r[0] == 42 and r[1] == 42 for r in rows)

    # auto-detect parses the trailing int off the topic (reference :188)
    doc = generate_emailsend(
        spark, 5, topic="persistent://eventbus/org-1/post-ingestion-495",
        auto_detect_project=True,
    )
    assert {r[0] for r in doc.select("doc.payload.projectId").collect()} == {495}

    # no knobs -> the oracle-pinned varied pools are untouched
    doc = generate_emailsend(spark, 20)
    assert doc.select("doc.payload.projectId").distinct().count() > 1
