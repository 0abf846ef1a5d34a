"""Gates for the continuous time-bucket rollup sink and the training shard
writer.

Rollup contract: stream-of-partials == one-shot batch rollup, crash-retried
batches never double-count, compaction preserves the served result, and the
store size is bucket-keyspace-bounded (never event-bounded). Shard writer
contract: shard assignment is a pure md5 function, bytes on disk are
ordered, and the layout is identical under repartitioning.
"""

from __future__ import annotations

import glob
import hashlib
import uuid

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pulsar_replay_spark.streaming import pipelines
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_src(spark, tmp_path_factory):
    from pulsar_replay_spark.session import load_events

    path = str(tmp_path_factory.mktemp("events_rollup_src"))
    load_events(spark, SF_SMOKE).repartition(4).write.mode("overwrite").parquet(path)
    return path


def _batch_rollup(spark, events_src):
    return (
        spark.read.parquet(events_src)
        .groupBy(F.window("ts", "1 hour").start.alias("bucket_start"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .withColumn("avg_value", F.col("sum_value") / F.col("cnt"))
    )


def _canon(df):
    return sorted(
        (
            r["bucket_start"],
            r["event_type"],
            r["cnt"],
            round(r["sum_value"], 6),
            round(r["min_value"], 6),
            round(r["max_value"], 6),
            round(r["avg_value"], 9),
        )
        for r in df.collect()
    )


def test_rollup_stream_equals_batch(spark, events_src, tmp_path_factory):
    rollup_dir = str(tmp_path_factory.mktemp("rollup"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    q = pipelines.continuous_rollup_sink(
        pipelines.events_stream(spark, events_src), rollup_dir, ckpt
    )
    q.awaitTermination()
    got = pipelines.rollup_read(spark, rollup_dir)
    want = _batch_rollup(spark, events_src)
    assert _canon(got) == _canon(want)
    # Store is partial-aggregate-bounded: at most (batches × bucket
    # keyspace) rows, independent of how many raw events each batch held —
    # the invariant that keeps the sink O(batch) at any event volume.
    stored = spark.read.parquet(rollup_dir)
    n_batches = stored.select("batch_id").distinct().count()
    keyspace = want.select("bucket_start", "event_type").distinct().count()
    assert stored.count() <= n_batches * keyspace


def test_rollup_retry_is_idempotent(spark, events_src, tmp_path_factory):
    rollup_dir = str(tmp_path_factory.mktemp("rollup_retry"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    q = pipelines.continuous_rollup_sink(
        pipelines.events_stream(spark, events_src), rollup_dir, ckpt
    )
    q.awaitTermination()
    before = _canon(pipelines.rollup_read(spark, rollup_dir))
    # Simulate a crash-retry of batch 0: re-write the same partial under the
    # same batch_id — dynamic overwrite must replace, not append.
    b0 = spark.read.parquet(rollup_dir).where("batch_id = 0").drop("batch_id")
    (
        b0.withColumn("batch_id", F.lit(0))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(rollup_dir)
    )
    assert _canon(pipelines.rollup_read(spark, rollup_dir)) == before


def test_rollup_compaction_preserves_served_result(spark, events_src, tmp_path_factory):
    rollup_dir = str(tmp_path_factory.mktemp("rollup_c"))
    compact_dir = str(tmp_path_factory.mktemp("rollup_cc"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    q = pipelines.continuous_rollup_sink(
        pipelines.events_stream(spark, events_src), rollup_dir, ckpt
    )
    q.awaitTermination()
    pipelines.rollup_compact(spark, rollup_dir, compact_dir)
    assert _canon(pipelines.rollup_read(spark, compact_dir)) == _canon(
        pipelines.rollup_read(spark, rollup_dir)
    )
    # Compacted store holds exactly one partial per (bucket, type).
    c = spark.read.parquet(compact_dir)
    assert c.count() == c.select("bucket_start", "event_type").distinct().count()


# ---------------------------------------------------------------------------
# Training shard writer
# ---------------------------------------------------------------------------


def _expected_shard(doc_id: int, n_shards: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:2], 16) % n_shards


def _read_shard_files(out_dir: str):
    """(shard → ordered doc_ids) straight from the parquet bytes (pyarrow:
    in-file row order is authoritative; Spark reads don't promise it)."""
    out = {}
    for d in sorted(glob.glob(f"{out_dir}/shard=*")):
        shard = int(d.rsplit("=", 1)[1])
        ids = []
        for f in sorted(glob.glob(f"{d}/*.parquet")):
            ids.extend(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
        out[shard] = ids
    return out


def test_shard_writer_layout_and_order(spark, documents, tmp_path_factory):
    from pulsar_replay_spark.operators.packing import write_training_shards

    out = str(tmp_path_factory.mktemp("shards")) + "/t"
    write_training_shards(documents, out, n_shards=8)
    shards = _read_shard_files(out)
    all_ids = [i for ids in shards.values() for i in ids]
    assert sorted(all_ids) == sorted(
        r["doc_id"] for r in documents.select("doc_id").collect()
    )
    for shard, ids in shards.items():
        assert ids == sorted(ids), f"shard {shard} not ordered"
        assert all(_expected_shard(i, 8) == shard for i in ids)


def test_shard_writer_deterministic_under_repartitioning(
    spark, documents, tmp_path_factory
):
    from pulsar_replay_spark.operators.packing import write_training_shards

    out_a = str(tmp_path_factory.mktemp("shards_a")) + "/t"
    out_b = str(tmp_path_factory.mktemp("shards_b")) + "/t"
    write_training_shards(documents, out_a, n_shards=8)
    write_training_shards(documents.repartition(13), out_b, n_shards=8)
    assert _read_shard_files(out_a) == _read_shard_files(out_b)


def test_shard_writer_max_records_splits_preserve_order(
    spark, documents, tmp_path_factory
):
    from pulsar_replay_spark.operators.packing import write_training_shards

    out = str(tmp_path_factory.mktemp("shards_split")) + "/t"
    write_training_shards(documents, out, n_shards=4, max_records_per_file=25)
    shards = _read_shard_files(out)
    for shard, ids in shards.items():
        assert ids == sorted(ids), f"shard {shard} split files broke order"
    for d in glob.glob(f"{out}/shard=*"):
        for f in glob.glob(f"{d}/*.parquet"):
            assert pq.read_table(f).num_rows <= 25
