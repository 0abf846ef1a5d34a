"""The capture pipeline, expressed declaratively (SURVEY §3.1).

The reference's capture (``pulsar_backup_restore.py:48-148``) is: enumerate
topics → drop partition children → per topic, bounded scan of ≤
``max_messages_per_topic`` messages from earliest → decode → envelope → sink.
It processes topics **sequentially in one thread**; here the whole thing is
one distributed DataFrame plan:

- topic anti-filter (P1) is a predicate that prunes before any message work;
- the per-topic bound (O3, ``config.json:9`` + loop ``:115``) is
  ``row_number() OVER (PARTITION BY topic ORDER BY ts) <= N`` — one shuffle
  partitioned by topic, which is exactly the parallelism the reference lacks;
- the per-topic count (A1, ``:139``) is a partial-aggregated groupBy.

Scale: the window shuffles once on `topic`. At 100 TB the topic key is the
natural partitioning of the source (one Spark partition per Pulsar topic
partition), so with a topic-partitioned source this becomes a map-side
window — no extra shuffle. Skewed topics are handled by AQE skew-join/split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pulsar_replay_spark.catalog import with_topics
from pulsar_replay_spark.functions.codecs import is_partition_topic

MAX_MESSAGES_PER_TOPIC = 10_000  # reference config.json:9


def bounded_scan(messages: DataFrame, topic_col: str = "topic", ts_col: Column | None = None,
                 id_col: str = "event_id", max_per_topic: int = MAX_MESSAGES_PER_TOPIC) -> DataFrame:
    """Per-topic bounded scan: ≤ `max_per_topic` earliest messages per topic,
    deterministic tie-break on the message id."""
    ts = ts_col if ts_col is not None else F.col("ts")
    w = Window.partitionBy(topic_col).orderBy(ts, F.col(id_col))
    return (
        messages.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_per_topic)
        .drop("rn")
    )


def capture_pipeline(events: DataFrame, max_per_topic: int = MAX_MESSAGES_PER_TOPIC) -> DataFrame:
    """Flagship query: capture over the `events` fixture.

    events ⋈ derived topic → anti-filter partition children → bounded scan →
    per-topic message count + time range. Returns one row per captured topic.
    """
    msgs = with_topics(events).filter(~is_partition_topic(F.col("topic")))
    scanned = bounded_scan(msgs, max_per_topic=max_per_topic)
    return (
        scanned.groupBy("topic")
        .agg(
            F.count("*").alias("n_msgs"),
            F.unix_millis(F.min("ts")).alias("first_ts_ms"),
            F.unix_millis(F.max("ts")).alias("last_ts_ms"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def observed_capture(events: DataFrame, max_per_topic: int = MAX_MESSAGES_PER_TOPIC):
    """Capture pipeline with inline metrics via the Observation API: row
    count, distinct-ish topic count and value sum are collected as
    accumulator-style observations DURING the one pass — the engine's
    replacement for the reference's per-topic print counters
    (pulsar_backup_restore.py:139,343-378), which cost it a second iteration.

    Returns (result_df, observation); read ``observation.get`` AFTER an
    action on result_df.
    """
    from pyspark.sql import Observation

    obs = Observation("capture_metrics")
    msgs = with_topics(events).filter(~is_partition_topic(F.col("topic")))
    observed = msgs.observe(
        obs,
        F.count(F.lit(1)).alias("rows_scanned"),
        F.approx_count_distinct("topic").alias("approx_topics"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    scanned = bounded_scan(observed, max_per_topic=max_per_topic)
    result = scanned.groupBy("topic").agg(
        F.count("*").alias("n_msgs"),
        F.unix_millis(F.min("ts")).alias("first_ts_ms"),
        F.unix_millis(F.max("ts")).alias("last_ts_ms"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    return result, obs
