"""Scalar-function-family queries (SURVEY §2.8) + nested-document and
analytics coverage, each with its DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pulsar_replay_spark.registry import register
from pulsar_replay_spark.session import load_events

# ---------------------------------------------------------------------------
# Map family (§2.8): properties-style map parsed from JSON, map_keys /
# element_at / size (reference carries properties as dict,
# pulsar_backup_restore.py:129).
# ---------------------------------------------------------------------------


@register(
    "props_map_ops",
    """
SELECT event_id,
       json_keys(props)[1] AS first_key,
       CAST(json_extract(props, '$.k') AS INT) AS k_val,
       len(json_keys(props)) AS n_keys,
       json_valid(props) AS parse_ok,
       CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket
FROM events
""",
)
def q_props_map_ops(spark, sf_dir):
    """Map + JSON scalar family in one per-event pass: from_json → map ops
    (keys/element_at/size), tolerant-parse health flag (from_json yields NULL
    on malformed input instead of failing the job — the property that matters
    when 100 TB of scraped payloads contain garbage; the malformed branch is
    exercised in tests with injected garbage), and get_json_object-style
    bucketing."""
    ev = load_events(spark, sf_dir)
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.map_keys(m)[0].alias("first_key"),
        F.element_at(m, "k").alias("k_val"),
        F.size(m).cast("bigint").alias("n_keys"),
        m.isNotNull().alias("parse_ok"),
        (F.get_json_object("props", "$.k").cast("int") % 10).alias("k_bucket"),
    )


# ---------------------------------------------------------------------------
# P3 — column extraction from whitespace-split text rows (the pulsarctl
# ASCII-table parsing idiom, ``pulsar_backup_restore.py:56-57``: skip header,
# take field #1 of each row).
# ---------------------------------------------------------------------------


def q_ascii_table_parse(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    line = F.concat(
        F.lit("| "), F.col("event_id").cast("string"), F.lit(" | "), F.col("event_type"), F.lit(" |")
    )
    toks = F.split(line, r"\s+")
    parsed = ev.select(
        toks.getItem(1).cast("bigint").alias("id"), toks.getItem(3).alias("name")
    )
    return parsed.groupBy("name").agg(
        F.count("*").alias("n"), F.min("id").alias("min_id"), F.max("id").alias("max_id")
    )


# ---------------------------------------------------------------------------
# Nested emailSend document: build the 4-level struct, then navigate back out
# (§1.3; the oracle recomputes the fields directly from the generator
# formulas — pins struct construction + field access + all three timestamp
# formats of pulsar_remote_inspector.py:218,228,234).
# ---------------------------------------------------------------------------
NESTED_N = 500


def q_emailsend_nested_fields(spark, sf_dir):
    from pulsar_replay_spark.generator import generate_emailsend

    doc = generate_emailsend(spark, NESTED_N)
    return doc.select(
        "id",
        F.col("doc.payload.projectId").alias("project_id"),
        F.col("doc.payload.data.diff.campaignId").alias("campaign_id"),
        F.col("doc.payload.data.diff.templateId").alias("template_id"),
        F.col("doc.createdAt").alias("created_at"),
        F.col("doc.payload.metadata.esContext.esCreatedAt").alias("es_created_at"),
        F.col("doc.payload.docType").alias("doc_type"),
    )


# ---------------------------------------------------------------------------
# JSON round-trip: struct → to_json → from_json → fields survive (the
# capture-file fidelity property, driven through SQL-visible output).
# ---------------------------------------------------------------------------
def q_emailsend_json_roundtrip(spark, sf_dir):
    from pulsar_replay_spark.generator import generate_emailsend

    doc = generate_emailsend(spark, NESTED_N)
    schema = doc.schema["doc"].dataType
    back = doc.select("id", "doc", F.from_json("json", schema).alias("doc2"))
    return back.select(
        "id",
        F.col("doc2.eventId").alias("event_id"),
        F.col("doc2.payload.data.diff.campaignId").alias("campaign_id"),
        (F.to_json("doc") == F.to_json("doc2")).alias("roundtrip_ok"),
    )


# ---------------------------------------------------------------------------
# Analytic window family: dense_rank / percent_rank / ntile.
# ---------------------------------------------------------------------------
def q_order_rank_analytics(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.dense_rank().over(w).alias("drank"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.ntile(4).over(w).alias("quartile"),
    )


# ---------------------------------------------------------------------------
# BPE-ish regex tokenization (LLM-pipeline token counting; the scale-honest
# stand-in for a real BPE vocab — word pieces + punctuation as single
# tokens).
# ---------------------------------------------------------------------------
def q_bpe_token_counts(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(r"\w+|[^\w\s]"), 0)).alias("n_bpe_tokens"),
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs (exact; the LSH-candidate variant is
# the scale path, pinned against this in tests).
# ---------------------------------------------------------------------------
# ---------------------------------------------------------------------------
# The Arrow/Python seam, oracle-checked: applyInPandas z-score per event_type
# must equal the SQL window-function formulation (SURVEY §2.10).
# ---------------------------------------------------------------------------
@register(
    "zscore_apply_in_pandas",
    """
SELECT event_id, event_type, value,
       ROUND((value - AVG(value) OVER w) / stddev_samp(value) OVER w, 4) AS zscore
FROM events
WINDOW w AS (PARTITION BY event_type)
""",
)
def q_zscore_apply_in_pandas(spark, sf_dir):
    from pulsar_replay_spark.operators.stats import zscore_by_group

    return zscore_by_group(load_events(spark, sf_dir))


NEAR_DUP_THRESHOLD = 0.45


@register(
    "embedding_near_dup_pairs",
    f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         ROUND(list_inner_product(a.v, b.v)
               / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))), 6) AS sim6
  FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, ROUND(sim6, 3) AS sim FROM pairs WHERE sim6 >= {NEAR_DUP_THRESHOLD}
""",
)
def q_embedding_near_dup_pairs(spark, sf_dir):
    from pulsar_replay_spark.functions.vectors import dot, norm

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"),
        norm(F.col("embedding")).alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"),
        norm(F.col("embedding")).alias("nb"),
    )
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b")).withColumn(
        "sim6", F.round(dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6)
    )
    return pairs.filter(F.col("sim6") >= NEAR_DUP_THRESHOLD).select(
        "vec_a", "vec_b", F.round("sim6", 3).alias("sim")
    )


# ---------------------------------------------------------------------------
# SQL-text interface: the engine's second query API. Tables register as temp
# views; the query text goes through the same Catalyst pipeline as the
# DataFrame API (identical plans) — pinned here by running pure SQL text.
# ---------------------------------------------------------------------------
def q_sql_interface_monthly_revenue(spark, sf_dir):
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView(
        "lineitem_v"
    )
    return spark.sql(
        """
        SELECT l_linestatus, date_format(l_shipdate, 'yyyy-MM') AS month,
               COUNT(*) AS n_items,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem_v GROUP BY l_linestatus, date_format(l_shipdate, 'yyyy-MM')
        """
    )


# ---------------------------------------------------------------------------
# Tolerant JSON parsing: from_json yields NULL on malformed input instead of
# failing the job — the property that matters when 100 TB of scraped payloads
# contain garbage. The fixture's props are all well-formed; the invariant
# (0 parse failures, all rows parsed) is exactly what the oracle pins, and
# the malformed branch is exercised in tests with injected garbage.
# ---------------------------------------------------------------------------
def q_json_parse_health(spark, sf_dir):
    from pulsar_replay_spark.session import load_events

    ev = load_events(spark, sf_dir)
    parsed = ev.withColumn(
        "p", F.from_json("props", "map<string,string>")
    )
    return parsed.agg(
        F.count("*").alias("n_rows"),
        F.count("p").alias("n_parsed"),
        (F.count("*") - F.count("p")).alias("n_failed"),
    )


# ---------------------------------------------------------------------------
# Grouped-aggregate Pandas UDF (§2.10 — the custom-UDAF seam): Arrow ships
# each group's (value, weight) series to Python once, the reduction returns a
# scalar that participates in the hash aggregate like any built-in. Unlike
# applyInPandas this never materializes the group as a DataFrame.
# ---------------------------------------------------------------------------
def q_weighted_avg_price(spark, sf_dir):
    from pulsar_replay_spark.functions.udfs import weighted_avg_udf

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.groupBy("l_returnflag").agg(
        F.round(
            weighted_avg_udf(F.col("l_extendedprice"), F.col("l_quantity")), 4
        ).alias("w_avg_price")
    )


# ---------------------------------------------------------------------------
# Heavy hitters (frequent items): the exact two-pass form — per-key counts
# vs a broadcast global total. The single-pass sketch alternative
# (df.stat.freqItems, Karp-Papadimitriou-Shenker) is pinned against this in
# tests/test_stats_extras.py via its superset guarantee; at 100 TB you run
# the sketch first and this exact query only over the candidate set.
# ---------------------------------------------------------------------------
def q_heavy_hitters_event_type(spark, sf_dir):
    ev = load_events(spark, sf_dir).select("event_type")
    total = ev.agg(F.count("*").alias("total"))
    return (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .join(F.broadcast(total))
        .withColumn("share", F.round(F.col("cnt") / F.col("total"), 4))
        .filter(F.col("cnt") / F.col("total") >= 0.05)
        .select("event_type", "cnt", "share")
    )


# ---------------------------------------------------------------------------
# Statistical-aggregate family (§2.4) + the grouped-agg Pandas UDAF seam
# (§2.10) in ONE map-side-combinable pass per l_returnflag: Pearson corr /
# sample covariance / stddev are built-ins; the weighted average is the
# custom Arrow UDAF (each group's (value, weight) series ships to Python
# once and the scalar result participates in the same hash aggregate).
# ---------------------------------------------------------------------------
@register(
    "lineitem_stats",
    """
SELECT l_returnflag,
       ROUND(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
       ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
       ROUND(stddev_samp(l_quantity), 4) AS qty_sd,
       ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS w_avg_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_lineitem_stats(spark, sf_dir):
    from pulsar_replay_spark.functions.udfs import weighted_avg_udf

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # Spark forbids mixing a grouped-agg pandas UDF with non-pandas aggregates
    # in one agg (INVALID_PANDAS_UDF_PLACEMENT) — two aggs over the same
    # 3-key groupBy, joined on the tiny result.
    builtins = li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_covar"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_sd"),
    )
    udaf = li.groupBy("l_returnflag").agg(
        F.round(
            weighted_avg_udf(F.col("l_extendedprice"), F.col("l_quantity")), 4
        ).alias("w_avg_price")
    )
    return builtins.join(udaf, "l_returnflag")


def q_qty_price_correlation(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_covar"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_sd"),
    )
