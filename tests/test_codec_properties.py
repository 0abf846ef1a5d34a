"""Property-based round-trip tests for the charset-fallback codec — SURVEY
§7 hard part (a). Hypothesis generates adversarial byte strings (invalid
UTF-8, truncated multi-byte sequences, NULs, empty); the envelope
decode→encode round trip must reproduce the original bytes for every one,
matching the reference's capture→replay loop (pulsar_backup_restore.py:
118-124 capture, 203-208 replay)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pulsar_replay_spark.envelope import decode_content, encode_content, is_valid_utf8

_BATCH = st.lists(st.binary(min_size=0, max_size=64), min_size=1, max_size=24)


@settings(max_examples=12, deadline=None)
@given(_BATCH)
def test_decode_encode_roundtrip_is_identity(spark, payloads):
    df = spark.createDataFrame([(i, p) for i, p in enumerate(payloads)], "id long, raw binary")
    out = (
        df.withColumn("content", decode_content(F.col("raw")))
        .withColumn("flag", ~is_valid_utf8(F.col("raw")))
        .withColumn("back", encode_content(F.col("content"), F.col("flag")))
        .select("id", "raw", "back", "flag", "content")
        .collect()
    )
    for r in out:
        raw = bytes(r["raw"]) if r["raw"] is not None else b""
        back = bytes(r["back"]) if r["back"] is not None else b""
        assert back == raw, (raw, back, r["flag"])
        # flag semantics: set exactly when raw isn't valid UTF-8
        assert r["flag"] == (not _is_utf8(raw))
        # content is always printable-safe: either the UTF-8 text or base64
        if r["flag"]:
            import base64

            assert base64.b64decode(r["content"]) == raw


def _is_utf8(b: bytes) -> bool:
    try:
        b.decode("utf-8")
        return True
    except UnicodeDecodeError:
        return False
