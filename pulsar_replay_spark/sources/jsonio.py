"""JSON capture-dir sink/source (SURVEY §2.1 S4/S5) + replay mapping (S6).

The reference captures each topic to one pretty-printed JSON array file named
by the `/`→`_` codec (``pulsar_backup_restore.py:103,142-143``) and replays by
globbing ``messages/*.json``, recovering the topic from the filename
(``:190-198``). Here:

- the engine-internal capture format is **Parquet partitioned by topic** (the
  scale path: partition pruning on topic, predicate pushdown, column pruning);
- the JSON array format is kept for reference fidelity: `write_json_capture`
  emits one JSON-array file per topic, `read_json_capture` restores the
  envelope from such a directory, recovering `topic` from the filename.

Timestamps travel as epoch millis in JSON (the reference's on-disk schema,
``README.md:63-75``); event_timestamp 0 ⇄ null per ``:214``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_replay_spark.envelope import normalize_event_timestamp
from pulsar_replay_spark.functions.codecs import topic_from_filename

JSON_FIELDS = [
    "content",
    "binary_encoded",
    "properties",
    "publish_timestamp",
    "event_timestamp",
    "partition_key",
]


def to_json_rows(env: DataFrame) -> DataFrame:
    """Envelope → reference on-disk row shape (epoch-millis ints, 0 for
    unset event time)."""
    return env.select(
        "topic",
        "content",
        "binary_encoded",
        "properties",
        F.unix_millis("publish_timestamp").alias("publish_timestamp"),
        F.coalesce(F.unix_millis("event_timestamp"), F.lit(0)).alias("event_timestamp"),
        "partition_key",
    )


def write_json_capture(env: DataFrame, out_dir: str) -> None:
    """One JSON-array file per topic, filename = topic with `/`→`_`
    (driver-side loop over topics only for file *naming* — each file's rows
    are written by the JVM, and the capture format at scale is the Parquet
    sink below, not this fidelity export)."""
    import json
    import os
    from collections import defaultdict

    os.makedirs(out_dir, exist_ok=True)
    by_topic: dict[str, list] = defaultdict(list)
    for r in to_json_rows(env).collect():  # one job, grouped driver-side
        by_topic[r["topic"]].append({k: r[k] for k in JSON_FIELDS})
    for topic, payload in by_topic.items():
        fname = topic.replace("/", "_").replace(":", "+") + ".json"
        with open(os.path.join(out_dir, fname), "w") as f:
            json.dump(payload, f, indent=2)


def read_json_capture(spark: SparkSession, in_dir: str) -> DataFrame:
    """Restore the envelope from a capture dir; topic recovered from the
    filename (`_`→`/`), multiLine JSON arrays as the reference writes them."""
    schema = (
        "content string, binary_encoded boolean, properties map<string,string>, "
        "publish_timestamp long, event_timestamp long, partition_key string"
    )
    df = (
        spark.read.option("multiLine", True)
        .schema(schema)
        .json(f"{in_dir}/*.json")
        .withColumn(
            "topic",
            topic_from_filename(
                F.regexp_replace(
                    F.regexp_extract(F.input_file_name(), r"([^/]+)\.json$", 1),
                    r"\.json$",
                    "",
                )
            ),
        )
    )
    return df.select(
        "topic",
        "content",
        "binary_encoded",
        "properties",
        F.timestamp_millis("publish_timestamp").alias("publish_timestamp"),
        normalize_event_timestamp(F.col("event_timestamp")).alias("event_timestamp"),
        "partition_key",
    )


def write_parquet_capture(env: DataFrame, out_dir: str) -> None:
    """The scale-path capture sink: Parquet partitioned by topic → partition
    pruning on later per-topic reads, columnar pushdown, no driver loop."""
    env.write.partitionBy("topic").mode("overwrite").parquet(out_dir)


def read_parquet_capture(spark: SparkSession, in_dir: str) -> DataFrame:
    return spark.read.parquet(in_dir)


def write_orc_capture(env: DataFrame, out_dir: str) -> None:
    """ORC capture sink — same topic-partitioned layout (and therefore the
    same partition-pruning / columnar-pushdown story) as the Parquet path,
    for warehouses standardized on ORC."""
    env.write.partitionBy("topic").mode("overwrite").orc(out_dir)


def read_orc_capture(spark: SparkSession, in_dir: str) -> DataFrame:
    return spark.read.orc(in_dir)


def _require_avro(e: Exception) -> None:
    if "Failed to find data source: avro" in str(e):
        raise NotImplementedError(
            "Avro capture needs the external spark-avro module on the "
            "classpath (--packages org.apache.spark:spark-avro_2.13:<ver>); "
            "it is not bundled with the pip pyspark distribution"
        ) from e
    raise e


def write_avro_capture(env: DataFrame, out_dir: str) -> None:
    """Avro capture sink — same topic-partitioned layout as Parquet/ORC, for
    schema-registry/Kafka-adjacent estates standardized on Avro. Spark's
    Avro support is the external ``spark-avro`` module: absent (as in this
    container) the call degrades to a named NotImplementedError at the
    format lookup, never inside the engine."""
    try:
        env.write.partitionBy("topic").mode("overwrite").format("avro").save(out_dir)
    except Exception as e:  # noqa: BLE001 — re-raised, classified
        _require_avro(e)


def read_avro_capture(spark: SparkSession, in_dir: str) -> DataFrame:
    try:
        return spark.read.format("avro").load(in_dir)
    except Exception as e:  # noqa: BLE001 — re-raised, classified
        _require_avro(e)


_CSV_OPTS = {"header": True, "quote": '"', "escape": '"'}


def write_csv_capture(env: DataFrame, out_dir: str) -> None:
    """CSV interchange export. CSV carries flat types only, so the
    properties map is JSON-serialized and timestamps travel as epoch millis
    (the reference's on-disk convention, ``README.md:63-75``); quote-escaped
    so content with embedded newlines/commas survives. Topic-partitioned
    like the other capture sinks."""
    flat = to_json_rows(env).withColumn("properties", F.to_json("properties"))
    w = flat.write.partitionBy("topic").mode("overwrite")
    for k, v in _CSV_OPTS.items():
        w = w.option(k, v)
    w.csv(out_dir)


def read_csv_capture(spark: SparkSession, in_dir: str) -> DataFrame:
    """Restore the envelope from a CSV capture dir (topic recovered via
    partition discovery; multiLine for quoted embedded newlines)."""
    schema = (
        "content string, binary_encoded boolean, properties string, "
        "publish_timestamp long, event_timestamp long, partition_key string"
    )
    r = spark.read.schema(schema).option("multiLine", True)
    for k, v in _CSV_OPTS.items():
        r = r.option(k, v)
    df = r.csv(in_dir)
    return df.select(
        "topic",
        "content",
        "binary_encoded",
        F.from_json("properties", "map<string,string>").alias("properties"),
        F.timestamp_millis("publish_timestamp").alias("publish_timestamp"),
        normalize_event_timestamp(F.col("event_timestamp")).alias("event_timestamp"),
        "partition_key",
    )


def replay_frame(env: DataFrame) -> DataFrame:
    """Envelope → replay-sink shape (S6, ``pulsar_backup_restore.py:202-219``):
    payload bytes restored (base64-decode when flagged binary), event time and
    partition key preserved, ordered within topic by publish time.

    A Pulsar writer would map payload→value, partition_key→__key,
    event_timestamp→__eventTime (see sources/pulsar_connector.py)."""
    from pulsar_replay_spark.envelope import encode_content

    return (
        env.select(
            "topic",
            encode_content(F.col("content"), F.col("binary_encoded")).alias("payload"),
            "properties",
            "event_timestamp",
            "partition_key",
            "publish_timestamp",
        )
        .repartition("topic")
        .sortWithinPartitions("publish_timestamp")
    )


def compact_parquet(
    spark, src_dir: str, dst_dir: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files. Streaming captures (one file per
    micro-batch per topic) accrete thousands of KB-sized files; scans then
    pay one task + one open per file. Run compaction behind the watermark.

    Returns the output file count. Uses repartition (round-robin, even
    output sizes) — not coalesce, which skips the shuffle but inherits skewed
    input splits.
    """
    import math
    import os

    df = spark.read.parquet(src_dir)
    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(src_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    n = max(1, math.ceil(total / target_file_bytes))
    df.repartition(n).write.mode("overwrite").parquet(dst_dir)
    return n


def write_jsonl_corpus(
    docs: DataFrame, out_dir: str, n_shards: int = 16, compression: str | None = "gzip"
) -> None:
    """Document-corpus export in the LLM-interchange format: JSON Lines, one
    object per line, sharded deterministically — ``spark.write.json`` IS
    JSONL per part file, so this is the native zero-copy path (no UDF, no
    driver serialization). Shard assignment and in-file order reuse the
    md5(doc_id) discipline of ``packing.write_training_shards``, so the
    bytes downstream tooling streams are reproducible across reruns and
    cluster sizes."""
    shard = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("int") % n_shards
    writer = (
        docs.withColumn("shard", shard)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "doc_id")
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.json(out_dir)


def read_jsonl_corpus(
    spark: SparkSession, in_dir: str, schema: str | None = None
) -> DataFrame:
    """Read a JSONL corpus (ours or anyone's). Pass an explicit ``schema``
    string in production — schema inference scans the data twice and types
    drift with content; the permissive default is for exploration."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(in_dir).drop("shard")
