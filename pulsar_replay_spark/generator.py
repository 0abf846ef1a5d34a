"""Synthetic emailSend document generator (SURVEY §2.1 S9).

The reference generates deeply nested emailSend JSON docs with random user
keys, campaign/template ids from pools, fresh UUIDs and timestamps
(``pulsar_remote_inspector.py:197-256``), rate-paced into Pulsar. Here the
generator is a pure expression pipeline over ``spark.range`` — distributed,
no driver loop, no Python UDF — and **seeded by row id** (md5 of the id
replaces ``uuid4``/``random.choice``) so tests and the DuckDB oracle can
reproduce every row exactly. The streaming variant (rate source) is in
``streaming/pipelines.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

USER_PREFIXES = ["alex", "sam", "jordan"]
USER_SUFFIXES = ["99", "dev", "x", "7"]
USER_DOMAINS = ["example.com", "test.org", "mail.net"]
BASE_TS_MS = 1_700_000_000_000


def _pick(col, options: list[str]):
    """options[col % len] as a when-chain (kept CASE-shaped to mirror the
    oracle SQL exactly)."""
    n = len(options)
    expr = F.when((col % n) == 0, F.lit(options[0]))
    for i in range(1, n - 1):
        expr = expr.when((col % n) == i, F.lit(options[i]))
    return expr.otherwise(F.lit(options[-1]))


def generate_flat(spark: SparkSession, n: int) -> DataFrame:
    """Flat projection of the generated doc (the oracle-checked core fields)."""
    df = spark.range(n)
    id_ = F.col("id")
    user_key = F.concat(
        _pick(id_, USER_PREFIXES),
        F.lit("."),
        _pick(id_, USER_SUFFIXES),
        F.lit("@"),
        _pick(id_, USER_DOMAINS),
    )
    created = F.timestamp_millis(F.lit(BASE_TS_MS) + id_ * 1000)
    return df.select(
        id_.alias("id"),
        F.md5(F.concat(F.lit("event-"), id_.cast("string"))).alias("event_id_hex"),
        user_key.alias("user_key"),
        (F.lit(1000) + (id_ * 37) % 50).cast("int").alias("campaign_id"),
        (F.lit(500) + (id_ * 13) % 20).cast("int").alias("template_id"),
        (F.lit(100) + id_ % 7).cast("int").alias("project_id"),
        F.date_format(created, "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("created_at"),
    )


def generate_emailsend(
    spark: SparkSession,
    n: int,
    topic: str = "persistent://eventbus/org-1/ingestion-495",
    project_id: int | None = None,
    campaign_ids: list[int] | None = None,
    campaign_start: int | None = None,
    campaign_count: int | None = None,
    auto_detect_project: bool = False,
) -> DataFrame:
    """Full nested emailSend document matching the reference's shape
    (``pulsar_remote_inspector.py:208-256``): 4 levels of struct nesting and
    the reference's three distinct timestamp string formats (`:218` ISO-Z,
    `:228` millis-truncated ISO-Z, `:234` ``%Y-%m-%d %H:%M:%S +00:00``).

    The reference's publish knobs (``:258-332``) are honored: an explicit
    ``project_id`` wins, else ``auto_detect_project`` parses the trailing
    integer off the topic name (``extract_project_id_from_topic``, `:188`);
    ``campaign_ids`` pins the campaign pool, ``campaign_start`` +
    ``campaign_count`` generate the reference's contiguous range (`:197`).
    Defaults keep the oracle-pinned varied pools (campaign/template/project
    as deterministic id-derived picks), so the contract rows are unchanged.
    """
    import re

    flat = generate_flat(spark, n)
    id_ = F.col("id")
    created = F.timestamp_millis(F.lit(BASE_TS_MS) + id_ * 1000)
    iso_z = F.date_format(created, "yyyy-MM-dd'T'HH:mm:ss'Z'")
    iso_millis_z = F.date_format(created, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    spaced = F.date_format(created, "yyyy-MM-dd HH:mm:ss '+00:00'")

    if project_id is not None:
        project_expr = F.lit(int(project_id))
    elif auto_detect_project:
        m = re.search(r"(\d+)$", topic)
        project_expr = F.lit(int(m.group(1))) if m else F.lit(1)
    else:
        project_expr = F.col("project_id")

    if campaign_start is not None and campaign_count is not None:
        campaign_ids = list(range(campaign_start, campaign_start + campaign_count))
    if campaign_ids:
        # deterministic pick from the configured pool (the reference's
        # random.choice made reproducible, same posture as _pick)
        campaign_expr = F.element_at(
            F.array(*[F.lit(int(c)) for c in campaign_ids]),
            ((id_ * 37) % len(campaign_ids)).cast("int") + 1,
        )
        flat = flat.withColumn("campaign_id", campaign_expr)

    project_id = project_expr
    doc = F.struct(
        F.col("event_id_hex").alias("eventId"),
        F.md5(F.concat(F.lit("corr-"), id_.cast("string"))).alias("correlationId"),
        iso_z.alias("createdAt"),
        F.lit(1).alias("payloadVersion"),
        F.lit("emailSend").alias("payloadType"),
        F.struct(
            project_id.alias("projectId"),
            F.col("user_key").alias("userKey"),
            F.lit("emailSend").alias("docType"),
            F.struct(
                F.struct(
                    iso_millis_z.alias("requestCreatedAt"),
                    iso_millis_z.alias("processingStartedAt"),
                    iso_millis_z.alias("processingEndedAt"),
                ).alias("telemetry"),
                F.struct(
                    F.md5(F.concat(F.lit("es-"), id_.cast("string"))).alias("esDocId"),
                    F.lit("email_send").alias("esIndexType"),
                    spaced.alias("esCreatedAt"),
                    project_id.alias("esProjectId"),
                ).alias("esContext"),
                F.struct(F.lit("triggered").alias("action")).alias("source"),
            ).alias("metadata"),
            F.struct(
                F.create_map().cast("map<string,string>").alias("data"),
                F.struct(
                    F.col("template_id").alias("templateId"),
                    F.col("campaign_id").alias("campaignId"),
                    F.col("user_key").alias("email"),
                    F.substring(F.md5(F.concat(F.lit("msg-"), id_.cast("string"))), 1, 32).alias(
                        "messageId"
                    ),
                    F.struct(
                        spaced.alias("documentCreatedAt"),
                        spaced.alias("documentUpdatedAt"),
                    ).alias("itblInternal"),
                    iso_z.alias("createdAt"),
                ).alias("diff"),
            ).alias("data"),
        ).alias("payload"),
    )
    return flat.select(id_.alias("id"), F.lit(topic).alias("topic"), doc.alias("doc")).withColumn(
        "json", F.to_json("doc")
    )
