"""Envelope model + charset-fallback codec + capture/replay round-trip
(FIXTURES.md §B1; reference semantics with the binary_encoded bug FIXED —
``pulsar_backup_restore.py:128`` always wrote False, we write the truth)."""

from __future__ import annotations

import base64

from pyspark.sql import functions as F

from pulsar_replay_spark.envelope import (
    MESSAGE_ENVELOPE,
    decode_content,
    encode_content,
    is_valid_utf8,
    synthetic_envelope,
)


def test_synthetic_envelope_covers_branches(spark):
    env = synthetic_envelope(spark, 500)
    rows = env.collect()
    assert len(rows) == 500
    assert {r["binary_encoded"] for r in rows} == {True, False}
    assert any(r["event_timestamp"] is None for r in rows)
    assert any(r["partition_key"] is None for r in rows)
    assert any("-partition-" in r["topic"] for r in rows)
    assert any(len(r["properties"]) == 0 for r in rows)


def test_utf8_validity_detection(spark):
    df = spark.createDataFrame(
        [("ascii", b"hello"), ("multibyte", "päy-世界".encode()), ("invalid", b"\xff\x80\xc3(")],
        "name string, raw binary",
    )
    got = {r["name"]: r["ok"] for r in df.select("name", is_valid_utf8(F.col("raw")).alias("ok")).collect()}
    assert got == {"ascii": True, "multibyte": True, "invalid": False}


def test_decode_content_matches_reference_semantics(spark):
    raw_bin = b"\xff\x80\xc3("
    df = spark.createDataFrame(
        [("t", b"plain"), ("t", raw_bin)], "topic string, raw binary"
    )
    rows = df.select(
        decode_content(F.col("raw")).alias("content"),
        (~is_valid_utf8(F.col("raw"))).alias("binary_encoded"),
    ).collect()
    assert rows[0]["content"] == "plain" and rows[0]["binary_encoded"] is False
    # binary branch: base64 (as the reference stores it, pulsar_backup_restore.py:123)
    assert rows[1]["content"] == base64.b64encode(raw_bin).decode("ascii")
    assert rows[1]["binary_encoded"] is True


def test_encode_decode_roundtrip(spark):
    """content+flag → bytes → content+flag is the identity (replay path,
    pulsar_backup_restore.py:203-208)."""
    env = synthetic_envelope(spark, 300)
    back = env.select(
        "raw",
        encode_content(F.col("content"), F.col("binary_encoded")).alias("raw2"),
    )
    assert back.filter(F.col("raw") != F.col("raw2")).count() == 0


def test_json_capture_roundtrip(spark, tmp_path):
    """envelope → JSON array files (filename codec) → envelope identity
    (capture→replay loop, SURVEY §5)."""
    from pulsar_replay_spark.sources.jsonio import read_json_capture, write_json_capture

    env = synthetic_envelope(spark, 200).drop("raw")
    out = str(tmp_path / "messages")
    write_json_capture(env, out)
    back = read_json_capture(spark, out)

    cols = ["topic", "content", "binary_encoded", "publish_timestamp", "event_timestamp", "partition_key"]
    a = sorted([tuple(r) for r in env.select(cols).collect()])
    b = sorted([tuple(r) for r in back.select(cols).collect()])
    assert a == b
    # properties map round-trips too (compared as sorted items)
    pa = sorted([tuple(sorted(r["properties"].items())) for r in env.collect()])
    pb = sorted([tuple(sorted(r["properties"].items())) for r in back.collect()])
    assert pa == pb


def test_parquet_capture_partition_pruning(spark, tmp_path):
    """Scale path: parquet capture partitioned by topic; a single-topic read
    must prune partitions (visible as PartitionFilters in the plan)."""
    from pulsar_replay_spark.sources.jsonio import read_parquet_capture, write_parquet_capture

    env = synthetic_envelope(spark, 300).drop("raw")
    out = str(tmp_path / "capture")
    write_parquet_capture(env, out)
    back = read_parquet_capture(spark, out)
    one = back.filter(F.col("topic") == "persistent://tenant-1/ns-1/topic-1")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(topic" in plan
    assert one.count() > 0


def test_replay_frame_restores_bytes(spark):
    from pulsar_replay_spark.sources.jsonio import replay_frame

    env = synthetic_envelope(spark, 100)
    out = replay_frame(env)
    joined = out.alias("o").join(env.alias("e"), ["topic", "publish_timestamp"])
    assert joined.filter(F.col("o.payload") != F.col("e.raw")).count() == 0


def test_envelope_schema_shape():
    names = [f.name for f in MESSAGE_ENVELOPE.fields]
    assert names == [
        "topic", "content", "raw", "binary_encoded",
        "properties", "publish_timestamp", "event_timestamp", "partition_key",
    ]


def test_compact_parquet_reduces_file_count(spark, events, tmp_path):
    from pulsar_replay_spark.sources.jsonio import compact_parquet

    src = str(tmp_path / "shards")
    events.repartition(64).write.parquet(src)
    import glob

    n_in = len(glob.glob(f"{src}/*.parquet"))
    assert n_in >= 64
    dst = str(tmp_path / "compacted")
    n_target = compact_parquet(spark, src, dst)
    n_out = len(glob.glob(f"{dst}/*.parquet"))
    assert n_out == n_target < n_in
    assert spark.read.parquet(dst).count() == events.count()


def test_observed_capture_metrics_match_direct_aggregates(spark, events):
    from pulsar_replay_spark.operators.capture import observed_capture, with_topics
    from pulsar_replay_spark.functions.codecs import is_partition_topic
    from pyspark.sql import functions as F

    result, obs = observed_capture(events)
    result.count()  # one action; observations ride along
    m = obs.get
    direct = with_topics(events).filter(~is_partition_topic(F.col("topic")))
    assert m["rows_scanned"] == direct.count()
    assert m["total_value"] == direct.agg(F.round(F.sum("value"), 2)).first()[0]
    n_topics = direct.select("topic").distinct().count()
    assert abs(m["approx_topics"] - n_topics) <= max(1, 0.05 * n_topics)


def test_orc_capture_roundtrip(spark, tmp_path):
    """envelope → topic-partitioned ORC → envelope identity (format breadth:
    the capture layout is format-agnostic)."""
    from pulsar_replay_spark.sources.jsonio import read_orc_capture, write_orc_capture

    env = synthetic_envelope(spark, 200).drop("raw")
    out = str(tmp_path / "orc_capture")
    write_orc_capture(env, out)
    back = read_orc_capture(spark, out)

    cols = ["topic", "content", "binary_encoded", "publish_timestamp", "event_timestamp", "partition_key"]
    a = sorted([tuple(r) for r in env.select(cols).collect()])
    b = sorted([tuple(r) for r in back.select(cols).collect()])
    assert a == b
    pa = sorted([tuple(sorted(r["properties"].items())) for r in env.collect()])
    pb = sorted([tuple(sorted(r["properties"].items())) for r in back.collect()])
    assert pa == pb


def test_csv_capture_roundtrip(spark, tmp_path):
    """envelope → quoted CSV (map JSON-flattened, millis timestamps) →
    envelope identity."""
    from pulsar_replay_spark.sources.jsonio import read_csv_capture, write_csv_capture

    env = synthetic_envelope(spark, 200).drop("raw")
    out = str(tmp_path / "csv_capture")
    write_csv_capture(env, out)
    back = read_csv_capture(spark, out)

    cols = ["topic", "content", "binary_encoded", "publish_timestamp", "event_timestamp", "partition_key"]
    a = sorted([tuple(r) for r in env.select(cols).collect()])
    b = sorted([tuple(r) for r in back.select(cols).collect()])
    assert a == b
    pa = sorted([tuple(sorted(r["properties"].items())) for r in env.collect()])
    pb = sorted([tuple(sorted(r["properties"].items())) for r in back.collect()])
    assert pa == pb


def test_jsonl_corpus_roundtrip(spark, documents, tmp_path):
    """JSONL export: every line is a standalone JSON object (the corpus
    interchange contract), layout is md5-sharded + in-file ordered, and the
    read-back equals the input exactly under an explicit schema."""
    import glob
    import gzip
    import hashlib
    import json

    from pulsar_replay_spark.sources import jsonio

    out = str(tmp_path / "corpus")
    jsonio.write_jsonl_corpus(documents, out, n_shards=4)

    back = jsonio.read_jsonl_corpus(
        spark, out, schema="doc_id long, text string, lang string, source string, n_chars long"
    )
    assert sorted(map(tuple, back.select(*documents.columns).collect())) == sorted(
        map(tuple, documents.collect())
    )
    for d in glob.glob(f"{out}/shard=*"):
        shard = int(d.rsplit("=", 1)[1])
        for f in glob.glob(f"{d}/part-*"):
            opener = gzip.open if f.endswith(".gz") else open
            with opener(f, "rt") as fh:
                ids = []
                for line in fh:
                    obj = json.loads(line)  # each line: standalone object
                    ids.append(obj["doc_id"])
                    assert (
                        int(hashlib.md5(str(obj["doc_id"]).encode()).hexdigest()[:2], 16) % 4
                        == shard
                    )
                assert ids == sorted(ids)  # in-file order reproducible


def test_avro_capture_gated_or_roundtrips(spark, tmp_path):
    """Avro capture: where the external spark-avro module exists the
    envelope must round-trip like ORC/Parquet; in this container (module
    absent) the call must fail at the FORMAT LOOKUP with a named
    NotImplementedError — never a silent no-op or an engine-internal
    error."""
    import pytest

    from pulsar_replay_spark.sources.jsonio import (
        read_avro_capture,
        write_avro_capture,
    )

    env = synthetic_envelope(spark, 50).drop("raw")
    out = str(tmp_path / "avro_capture")
    try:
        write_avro_capture(env, out)
    except NotImplementedError as e:
        assert "spark-avro" in str(e)  # named dependency, actionable
        with pytest.raises(NotImplementedError):
            read_avro_capture(spark, out)
        return
    back = read_avro_capture(spark, out)
    cols = ["topic", "content", "partition_key"]
    assert sorted(map(tuple, env.select(cols).collect())) == sorted(
        map(tuple, back.select(cols).collect())
    )
