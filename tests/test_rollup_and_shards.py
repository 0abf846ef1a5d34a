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
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("approx_users"),
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
            # unioned per-batch sketches must equal the one-pass sketch
            # (register maxima are order-independent)
            r["approx_users"],
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


# --- streaming CDC apply (merge-on-read) -----------------------------------

CDC_SCHEMA = (
    "doc_id long, op string, seq long, text string, lang string, "
    "source string, n_chars long"
)


@pytest.fixture(scope="module")
def cdc_src(spark, tmp_path_factory):
    """Three change-feed files (one micro-batch each) over the sf0.001 docs:
    b0 upserts %7 (v2), b1 deletes %5, b2 re-upserts %35 (v3). Global seqs
    are distinct (doc_id*10 + batch) so the outcome is independent of file
    discovery order."""
    import os
    import time

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    src = str(tmp_path_factory.mktemp("cdc_src"))

    def feed(filt, op, seq_off, suffix):
        d = docs.filter(filt)
        if op == "delete":
            return d.select(
                "doc_id", F.lit("delete").alias("op"),
                (F.col("doc_id") * 10 + seq_off).alias("seq"),
                F.lit(None).cast("string").alias("text"),
                F.lit(None).cast("string").alias("lang"),
                F.lit(None).cast("string").alias("source"),
                F.lit(None).cast("bigint").alias("n_chars"),
            )
        return d.select(
            "doc_id", F.lit("upsert").alias("op"),
            (F.col("doc_id") * 10 + seq_off).alias("seq"),
            F.concat("text", F.lit(suffix)).alias("text"),
            "lang", "source", "n_chars",
        )

    batches = [
        feed(F.col("doc_id") % 7 == 0, "upsert", 1, " v2"),
        feed(F.col("doc_id") % 5 == 0, "delete", 2, ""),
        feed(F.col("doc_id") % 35 == 0, "upsert", 3, " v3"),
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    arrow_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("op", pa.string()),
            ("seq", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    now = time.time()
    for i, b in enumerate(batches):
        pq.write_table(
            pa.Table.from_pandas(
                b.toPandas(), schema=arrow_schema, preserve_index=False
            ),
            f"{src}/b{i}.parquet",
        )
        os.utime(f"{src}/b{i}.parquet", (now + i, now + i))
    return src


@pytest.fixture(scope="module")
def cdc_store(spark, cdc_src, tmp_path_factory):
    store = str(tmp_path_factory.mktemp("cdc_store"))
    ckpt = str(tmp_path_factory.mktemp("cdc_ckpt"))
    stream = (
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(cdc_src)
    )
    pipelines.cdc_apply_sink(stream, store, ckpt).awaitTermination()
    return store


def test_cdc_stream_equals_batch_merge(spark, cdc_src, cdc_store):
    from pulsar_replay_spark.operators.curation import merge_upsert

    base = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = pipelines.cdc_read(spark, base, cdc_store)
    full_feed = spark.read.schema(CDC_SCHEMA).parquet(cdc_src)
    want = merge_upsert(base, full_feed)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    texts = {r["doc_id"]: r["text"] for r in got.collect()}
    probe = [i for i in texts if i % 35 == 0]
    assert probe and all(texts[i].endswith(" v3") for i in probe)
    assert not any(i % 5 == 0 and i % 35 != 0 for i in texts)


def test_cdc_retry_is_idempotent(spark, cdc_store):
    base = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    before = sorted(map(tuple, pipelines.cdc_read(spark, base, cdc_store).collect()))
    b0 = spark.read.parquet(cdc_store).where("batch_id = 0").drop("batch_id")
    (
        b0.withColumn("batch_id", F.lit(0))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(cdc_store)
    )
    after = sorted(map(tuple, pipelines.cdc_read(spark, base, cdc_store).collect()))
    assert after == before


def test_cdc_compaction_preserves_served_snapshot(spark, cdc_store, tmp_path_factory):
    base = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    compact = str(tmp_path_factory.mktemp("cdc_compact"))
    pipelines.cdc_compact(spark, cdc_store, compact)
    a = sorted(map(tuple, pipelines.cdc_read(spark, base, cdc_store).collect()))
    b = sorted(map(tuple, pipelines.cdc_read(spark, base, compact).collect()))
    assert a == b
    store_df = spark.read.parquet(cdc_store)
    compact_df = spark.read.parquet(compact)
    n_keys = store_df.select("doc_id").distinct().count()
    assert compact_df.count() == n_keys  # bounded by live keys
    assert store_df.count() > n_keys  # the fold actually folded something


def test_rollup_distinct_users_sketch(spark, events_src, tmp_path_factory):
    """The merged per-batch HLL partials must estimate distinct users like a
    one-pass sketch (register maxima are order-independent) and land within
    the standard HLL error of the exact count."""
    rollup_dir = str(tmp_path_factory.mktemp("rollup_hll"))
    ckpt = str(tmp_path_factory.mktemp("ckpt_hll"))
    pipelines.continuous_rollup_sink(
        pipelines.events_stream(spark, events_src), rollup_dir, ckpt
    ).awaitTermination()
    got = {
        (r["bucket_start"], r["event_type"]): r["approx_users"]
        for r in pipelines.rollup_read(spark, rollup_dir).collect()
    }
    exact = {
        (r["bucket_start"], r["event_type"]): r["du"]
        for r in spark.read.parquet(events_src)
        .groupBy(F.window("ts", "1 hour").start.alias("bucket_start"), "event_type")
        .agg(F.countDistinct("user_id").alias("du"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) <= max(3, 0.05 * exact[k]), (k, est, exact[k])


def test_rollup_topk_trending(spark, events_src, tmp_path_factory):
    """Trending serve: per bucket, exactly the k highest merged counts (ties
    by event_type), with shares summing the bucket's full distribution."""
    rollup_dir = str(tmp_path_factory.mktemp("rollup_topk"))
    ckpt = str(tmp_path_factory.mktemp("ckpt_topk"))
    pipelines.continuous_rollup_sink(
        pipelines.events_stream(spark, events_src), rollup_dir, ckpt
    ).awaitTermination()
    got = pipelines.rollup_topk(spark, rollup_dir, k=2).collect()
    full = {
        (r["bucket_start"], r["event_type"]): r["cnt"]
        for r in pipelines.rollup_read(spark, rollup_dir).collect()
    }
    by_bucket: dict = {}
    for (b, t), c in full.items():
        by_bucket.setdefault(b, []).append((-c, t))
    for r in got:
        expect = sorted(by_bucket[r["bucket_start"]])[: 2]
        assert (-r["cnt"], r["event_type"]) == expect[r["rk"] - 1]
        bucket_total = sum(-c for c, _ in by_bucket[r["bucket_start"]])
        assert r["share"] == round(r["cnt"] / bucket_total, 6)
    assert all(r["rk"] <= 2 for r in got)


def test_shard_writer_epoch_reshuffle(spark, documents, tmp_path_factory):
    """A shuffle salt re-deals within-shard READ order (md5(salt||id),
    python-mirrored) without moving any document between shards; each salt
    is deterministic."""
    from pulsar_replay_spark.operators.packing import write_training_shards

    out_a = str(tmp_path_factory.mktemp("ep_a")) + "/t"
    out_b = str(tmp_path_factory.mktemp("ep_b")) + "/t"
    out_a2 = str(tmp_path_factory.mktemp("ep_a2")) + "/t"
    write_training_shards(documents, out_a, n_shards=4, shuffle_salt="epoch-0")
    write_training_shards(documents, out_b, n_shards=4, shuffle_salt="epoch-1")
    write_training_shards(documents, out_a2, n_shards=4, shuffle_salt="epoch-0")
    a, b, a2 = _read_shard_files(out_a), _read_shard_files(out_b), _read_shard_files(out_a2)
    assert a == a2  # same salt -> identical bytes order
    assert {k: sorted(v) for k, v in a.items()} == {
        k: sorted(v) for k, v in b.items()
    }  # placement never moves
    assert a != b  # read order re-dealt
    for shard, ids in a.items():
        expect = sorted(
            ids, key=lambda i: hashlib.md5(f"epoch-0{i}".encode()).hexdigest()
        )
        assert ids == expect, shard


def test_cdc_chaos_kill_restart_exactly_once(spark, cdc_src, tmp_path_factory):
    """CDC chaos recovery: kill the apply stream mid-run, delete the newest
    commit marker (crash between sink write and checkpoint commit), restart
    from the same checkpoint — the re-delivered batch overwrites its own
    partition, and the served snapshot equals the one-shot batch merge."""
    import os
    import time

    from pulsar_replay_spark.operators.curation import merge_upsert

    store = str(tmp_path_factory.mktemp("cdc_chaos_store"))
    ck = str(tmp_path_factory.mktemp("cdc_chaos_ck"))
    stream = (
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(cdc_src)
    )
    q = pipelines.cdc_apply_sink(stream, store, ck, processing_time="1 seconds")
    commits = os.path.join(ck, "commits")
    deadline = time.time() + 120
    while time.time() < deadline:
        done = [f for f in os.listdir(commits)] if os.path.isdir(commits) else []
        if len([f for f in done if not f.startswith(".")]) >= 1:
            break
        time.sleep(0.2)
    q.stop()
    try:
        q.awaitTermination()
    except Exception:
        pass
    deadline = time.time() + 60
    while time.time() < deadline and any(aq.id == q.id for aq in spark.streams.active):
        time.sleep(0.2)
    committed = sorted(int(f) for f in os.listdir(commits) if not f.startswith("."))
    assert committed, "no batch committed before the kill"
    offsets_dir = os.path.join(ck, "offsets")
    planned = sorted(int(f) for f in os.listdir(offsets_dir) if not f.startswith("."))
    if planned and planned[-1] in committed:
        os.remove(os.path.join(commits, str(planned[-1])))
        crc = os.path.join(commits, f".{planned[-1]}.crc")
        if os.path.exists(crc):
            os.remove(crc)

    q2 = pipelines.cdc_apply_sink(
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(cdc_src),
        store,
        ck,
    )
    q2.awaitTermination()

    base = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = pipelines.cdc_read(spark, base, store)
    want = merge_upsert(base, spark.read.schema(CDC_SCHEMA).parquet(cdc_src))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


# --- streaming uniform sample (mergeable bottom-k) -------------------------


def test_sample_stream_equals_batch_bottom_k(spark, tmp_path_factory):
    """The maintained stream sample must equal the bottom-k (by the same md5
    priority) of the WHOLE corpus — exact, not approximate — and the store
    must hold ≤ k·batches rows."""
    import hashlib

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    src = str(tmp_path_factory.mktemp("sample_src"))
    docs.repartition(3).write.mode("overwrite").parquet(src)
    store = str(tmp_path_factory.mktemp("sample_store"))
    ck = str(tmp_path_factory.mktemp("sample_ck"))

    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    pipelines.sample_sink(stream, store, ck, k=20).awaitTermination()

    got = sorted(
        r["doc_id"] for r in pipelines.sample_read(spark, store, k=20).collect()
    )
    all_ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    expect = sorted(
        sorted(
            all_ids, key=lambda i: hashlib.md5(f"sample-v1{i}".encode()).hexdigest()
        )[:20]
    )
    assert got == expect

    stored = spark.read.parquet(store)
    n_batches = stored.select("batch_id").distinct().count()
    assert stored.count() <= 20 * n_batches
    assert n_batches >= 2  # the merge actually crossed batches

    # crash-retry: rewriting batch 0's partition must not change the sample
    b0 = stored.where("batch_id = 0").drop("batch_id")
    (
        b0.withColumn("batch_id", F.lit(0))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(store)
    )
    again = sorted(
        r["doc_id"] for r in pipelines.sample_read(spark, store, k=20).collect()
    )
    assert again == expect


def test_rollup_ewma_matches_batch_fold(spark, events_src, tmp_path_factory):
    """Smoothed serve over the partial store == the same EWMA fold over the
    one-shot batch rollup."""
    rollup_dir = str(tmp_path_factory.mktemp("rollup_ewma"))
    ck = str(tmp_path_factory.mktemp("ck_ewma"))
    pipelines.continuous_rollup_sink(
        pipelines.events_stream(spark, events_src), rollup_dir, ck
    ).awaitTermination()
    got = sorted(map(tuple, pipelines.rollup_ewma(spark, rollup_dir).collect()))
    from pulsar_replay_spark.operators.stats import ewma

    want = sorted(
        map(
            tuple,
            ewma(
                _batch_rollup(spark, events_src).select(
                    "event_type", "bucket_start", F.round("sum_value", 4).alias("v")
                ),
                "event_type",
                "bucket_start",
                "v",
            ).collect(),
        )
    )
    assert got == want and got


def test_rollup_absorbs_late_data(spark, events_src, tmp_path_factory):
    """Late arrivals: after the stream drains, a new file carrying events
    for OLD time buckets arrives and a second availableNow run drains it —
    the merged serve must equal the batch rollup over everything, with the
    late partials landing as NEW batch partitions (old partials untouched)."""
    import shutil
    import glob as _glob
    import os

    src2 = str(tmp_path_factory.mktemp("events_late_src"))
    for f in _glob.glob(f"{events_src}/*.parquet"):
        shutil.copy(f, src2)
    rollup_dir = str(tmp_path_factory.mktemp("rollup_late"))
    ck = str(tmp_path_factory.mktemp("ck_late"))
    pipelines.continuous_rollup_sink(
        pipelines.events_stream(spark, src2), rollup_dir, ck
    ).awaitTermination()
    n_parts_before = len(
        spark.read.parquet(rollup_dir).select("batch_id").distinct().collect()
    )

    # late file: re-timestamped copies of early events (same old buckets)
    late = (
        spark.read.parquet(src2)
        .limit(200)
        .withColumn("event_id", F.col("event_id") + 10_000_000)
    )
    late.coalesce(1).write.mode("overwrite").parquet(str(tmp_path_factory.mktemp("tmp_late")))
    lf = _glob.glob(f"{tmp_path_factory.getbasetemp()}/tmp_late*/*.parquet")[0]
    shutil.copy(lf, f"{src2}/zz_late.parquet")

    pipelines.continuous_rollup_sink(
        pipelines.events_stream(spark, src2), rollup_dir, ck
    ).awaitTermination()

    want = (
        spark.read.parquet(src2)
        .groupBy(F.window("ts", "1 hour").start.alias("bucket_start"), "event_type")
        .agg(F.count("*").alias("cnt"))
    )
    got = pipelines.rollup_read(spark, rollup_dir)
    assert sorted(
        (r["bucket_start"], r["event_type"], r["cnt"]) for r in got.collect()
    ) == sorted((r["bucket_start"], r["event_type"], r["cnt"]) for r in want.collect())
    n_parts_after = len(
        spark.read.parquet(rollup_dir).select("batch_id").distinct().collect()
    )
    assert n_parts_after > n_parts_before  # late data = new partials only


def test_rollup_coarse_serve_matches_batch_day_rollup(spark, events_src, tmp_path_factory):
    """Day-level serve over the HOUR partial store == a one-shot day-level
    batch rollup over the raw events (incl. the unioned distinct sketch)."""
    rollup_dir = str(tmp_path_factory.mktemp("rollup_day"))
    ck = str(tmp_path_factory.mktemp("ck_day"))
    pipelines.continuous_rollup_sink(
        pipelines.events_stream(spark, events_src), rollup_dir, ck
    ).awaitTermination()
    got = pipelines.rollup_read_coarse(spark, rollup_dir, "day")
    want = (
        spark.read.parquet(events_src)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("bucket_start"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("approx_users"),
        )
        .withColumn("avg_value", F.col("sum_value") / F.col("cnt"))
    )
    assert _canon(got) == _canon(want)
