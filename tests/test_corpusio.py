"""Corpus ingestion gates: JSONL/plain-text files must land in the exact
documents contract with stable content-addressed ids, tolerate corrupt
lines without aborting, never trigger schema inference, and round-trip
through the JSONL writer."""

from __future__ import annotations

import hashlib
import json

import pytest
from pyspark.sql import functions as F

from pulsar_replay_spark.sources import corpusio

DOC_SCHEMA = ["doc_id", "text", "lang", "source", "n_chars"]


def _content_id(text: str) -> int:
    return int(hashlib.md5(text.encode()).hexdigest()[:15], 16)


def test_read_jsonl_corpus_contract_and_corrupt_tolerance(spark, tmp_path):
    lines = [
        json.dumps({"text": "hello world", "lang": "en", "src": "web"}),
        json.dumps({"text": "bonjour", "lang": "fr", "src": "books"}),
        '{"text": "truncated...',  # corrupt: must not abort the job
        json.dumps({"lang": "de", "src": "web"}),  # missing text
    ]
    (tmp_path / "part0.jsonl").write_text("\n".join(lines))

    docs = corpusio.read_jsonl_corpus(
        spark, str(tmp_path), lang_field="lang", source_field="src"
    )
    assert docs.columns == DOC_SCHEMA
    rows = {r["text"]: r.asDict() for r in docs.collect()}
    # corrupt + missing-text rows dropped by default
    assert set(rows) == {"hello world", "bonjour"}
    assert rows["hello world"]["doc_id"] == _content_id("hello world")
    assert rows["hello world"]["lang"] == "en"
    assert rows["hello world"]["source"] == "web"
    assert rows["hello world"]["n_chars"] == 11

    kept = corpusio.read_jsonl_corpus(
        spark, str(tmp_path), lang_field="lang", source_field="src",
        keep_corrupt=True,
    )
    # corrupt-only projection straight off the scan must NOT trip Spark's
    # QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction (the library keeps the
    # scan schema wide); unparseable + missing-text rows both quarantine
    quarantined = kept.filter(F.col("corrupt").isNotNull())
    assert quarantined.count() == 2
    qrows = quarantined.collect()
    kinds = {r["corrupt"] for r in qrows}
    assert "missing-text-field" in kinds
    # quarantine rows stay addressable and DISTINCT: doc_id mixes the
    # corrupt payload with the row's remaining evidence (fields + file) —
    # never NULL, and two different quarantined rows never collide on the
    # constant marker
    assert all(r["doc_id"] is not None for r in qrows)
    assert len({r["doc_id"] for r in qrows}) == len(qrows)

    # id_field: numeric ids pass through, non-numeric ids hash
    (tmp_path / "ids.jsonl").write_text(
        "\n".join(
            [
                json.dumps({"text": "a", "id": "42"}),
                json.dumps({"text": "b", "id": "doc-xyz"}),
            ]
        )
    )
    with_ids = corpusio.read_jsonl_corpus(
        spark, str(tmp_path / "ids.jsonl"), id_field="id"
    )
    got = {r["text"]: r["doc_id"] for r in with_ids.collect()}
    assert got["a"] == 42
    assert got["b"] == int(hashlib.md5(b"doc-xyz").hexdigest()[:15], 16)

    # an id-less ROW under id_field falls back to the content hash, never NULL
    (tmp_path / "noid.jsonl").write_text(json.dumps({"text": "orphan"}))
    orphan = corpusio.read_jsonl_corpus(
        spark, str(tmp_path / "noid.jsonl"), id_field="id"
    ).collect()
    assert orphan[0]["doc_id"] == _content_id("orphan")

    # dotted top-level JSON keys are legal and must resolve as flat columns
    (tmp_path / "dotted.jsonl").write_text(json.dumps({"meta.text": "dotty"}))
    dotty = corpusio.read_jsonl_corpus(
        spark, str(tmp_path / "dotted.jsonl"), text_field="meta.text"
    ).collect()
    assert dotty[0]["text"] == "dotty" and dotty[0]["doc_id"] == _content_id("dotty")


def test_read_jsonl_corpus_never_infers_schema(spark, tmp_path):
    """The read schema is built from the field args — json() gets an
    explicit schema, so there is no inference scan (the 2x-read trap)."""
    (tmp_path / "x.jsonl").write_text(json.dumps({"text": "t", "extra": 1}))
    df = corpusio.read_jsonl_corpus(spark, str(tmp_path))
    # the physical read schema carries only text + corrupt column
    assert "extra" not in df.schema.simpleString()
    assert df.count() == 1


def test_read_text_corpus_lines_and_whole_files(spark, tmp_path):
    (tmp_path / "a.txt").write_text("first doc\n\nsecond doc\n")
    (tmp_path / "b.txt").write_text("third doc\n")
    docs = corpusio.read_text_corpus(spark, str(tmp_path))
    assert docs.columns == DOC_SCHEMA
    rows = {r["text"]: r.asDict() for r in docs.collect()}
    assert set(rows) == {"first doc", "second doc", "third doc"}  # blanks dropped
    assert rows["third doc"]["doc_id"] == _content_id("third doc")
    assert rows["third doc"]["source"].endswith("b.txt")

    whole = corpusio.read_text_corpus(spark, str(tmp_path), whole_files=True)
    texts = sorted(r["text"] for r in whole.collect())
    assert texts == sorted(["first doc\n\nsecond doc\n", "third doc\n"])


def test_jsonl_roundtrip_feeds_the_document_operators(spark, tmp_path, documents):
    """write_jsonl_corpus -> read_jsonl_corpus is faithful for the contract
    columns, and the ingested frame drives a real operator end-to-end."""
    from pulsar_replay_spark.operators import dedup

    sample = documents.limit(50)
    out = str(tmp_path / "corpus")
    corpusio.write_jsonl_corpus(sample, out, n_shards=4)
    back = corpusio.read_jsonl_corpus(
        spark, out, id_field="doc_id", lang_field="lang", source_field="source"
    )
    a = {tuple(r) for r in sample.select(*DOC_SCHEMA).collect()}
    b = {tuple(r) for r in back.select(*DOC_SCHEMA).collect()}
    assert a == b
    # the ingested frame is operator-ready
    assert "keep_doc_id" in dedup.exact_dup_groups(back).columns


def test_read_jsonl_corpus_reads_gzip_transparently(spark, tmp_path):
    """Real dumps ship as .jsonl.gz; Spark's text/json sources decompress by
    extension with no reader changes (gzip is non-splittable — one task per
    file, so shard counts on the WRITE side set the read parallelism)."""
    import gzip

    payload = "\n".join(
        json.dumps({"text": f"doc number {i}"}) for i in range(5)
    )
    with gzip.open(tmp_path / "shard0.jsonl.gz", "wt") as f:
        f.write(payload)
    docs = corpusio.read_jsonl_corpus(spark, str(tmp_path))
    assert docs.count() == 5
    assert {r["text"] for r in docs.collect()} == {f"doc number {i}" for i in range(5)}


def test_stream_jsonl_corpus_matches_batch_reader(spark, tmp_path):
    """The streaming twin must produce exactly the batch reader's rows for
    the same drop-folder (one availableNow pass), including corrupt-line
    quarantine semantics."""
    lines = [
        json.dumps({"text": "alpha", "lang": "en"}),
        json.dumps({"text": "beta", "lang": "fr"}),
        '{"broken', 
    ]
    (tmp_path / "drop0.jsonl").write_text("\n".join(lines))
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    stream = corpusio.stream_jsonl_corpus(
        spark, str(tmp_path), lang_field="lang", max_files_per_trigger=1
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish within timeout"

    got = {
        tuple(r)
        for r in spark.read.parquet(out_dir)
        .select("doc_id", "text", "lang", "n_chars")
        .collect()
    }
    want = {
        tuple(r)
        for r in corpusio.read_jsonl_corpus(spark, str(tmp_path), lang_field="lang")
        .select("doc_id", "text", "lang", "n_chars")
        .collect()
    }
    assert got == want and len(got) == 2


def test_jsonl_dropfolder_through_curation_ingest(spark, tmp_path):
    """Front-to-back: JSONL files land in a drop-folder, stream through
    stream_jsonl_corpus into curation_ingest_sink — exact duplicates across
    files are rejected, the accepted store holds the contract columns, and
    the run is one availableNow-style bounded pass."""
    from pulsar_replay_spark.functions.text import token_count
    from pulsar_replay_spark.streaming import pipelines

    long_a = "the quick brown fox jumps over the lazy dog " * 3
    long_b = "a completely different document about spark engines " * 3
    (tmp_path / "src").mkdir()
    (tmp_path / "src" / "b0.jsonl").write_text(
        "\n".join(
            [
                json.dumps({"text": long_a, "lang": "en", "source": "web"}),
                json.dumps({"text": long_b, "lang": "en", "source": "web"}),
                json.dumps({"text": "tiny", "lang": "en", "source": "junk"}),
            ]
        )
    )
    (tmp_path / "src" / "b1.jsonl").write_text(
        json.dumps({"text": long_a, "lang": "en", "source": "recrawl"})  # exact dup
    )

    stream = corpusio.stream_jsonl_corpus(
        spark,
        str(tmp_path / "src"),
        lang_field="lang",
        source_field="source",
        max_files_per_trigger=1,
    )

    def score_fn(docs):
        return docs.select("doc_id", token_count(F.col("text")).alias("score"))

    q = pipelines.curation_ingest_sink(
        stream,
        str(tmp_path / "accepted"),
        str(tmp_path / "index"),
        str(tmp_path / "ckpt"),
        score_fn,
        threshold=5.0,
    )
    q.awaitTermination()

    accepted = spark.read.parquet(str(tmp_path / "accepted"))
    texts = {r["text"] for r in accepted.collect()}
    assert long_a in texts and long_b in texts
    assert "tiny" not in texts  # below the quality threshold
    # the re-crawled exact duplicate was rejected: one copy, content-hash id
    assert accepted.filter(F.col("text") == long_a).count() == 1


def _warc_record(rec_type: str, body: bytes, uri: str | None = None,
                 lang: str | None = None, extra: str = "") -> bytes:
    hdr = [f"WARC/1.0", f"WARC-Type: {rec_type}",
           "WARC-Date: 2024-01-01T00:00:00Z",
           "WARC-Record-ID: <urn:uuid:0>"]
    if uri:
        hdr.append(f"WARC-Target-URI: {uri}")
    if lang:
        hdr.append(f"WARC-Identified-Content-Language: {lang}")
    if extra:
        hdr.append(extra)
    hdr.append(f"Content-Length: {len(body)}")
    return "\r\n".join(hdr).encode() + b"\r\n\r\n" + body + b"\r\n\r\n"


def test_read_warc_corpus_roundtrip_plain_and_gzip(spark, tmp_path):
    """Multi-record WARC/WET fixture → documents: content-addressed ids,
    WET language tags, warcinfo/request bookkeeping dropped, per-record
    gzip members inflate, and plain == gzip results."""
    import gzip

    recs = (
        _warc_record("warcinfo", b"software: test\r\n")
        + _warc_record("conversion", "hello warc\n".encode(),
                       uri="https://a.example/x", lang="eng,deu")
        + _warc_record("conversion", "bonjour warc\n".encode(),
                       uri="https://b.example/y", lang="fra")
        + _warc_record("request", b"GET / HTTP/1.1\r\n")
        + _warc_record("response", b"HTTP/1.1 200 OK\r\n\r\nraw page",
                       uri="https://c.example/z")
    )
    (tmp_path / "seg.warc").write_bytes(recs)
    # the Common Crawl layout: one gzip MEMBER per record
    gz = b"".join(
        gzip.compress(m) for m in (
            _warc_record("warcinfo", b"software: test\r\n"),
            _warc_record("conversion", "hello warc\n".encode(),
                         uri="https://a.example/x", lang="eng,deu"),
            _warc_record("conversion", "bonjour warc\n".encode(),
                         uri="https://b.example/y", lang="fra"),
            _warc_record("request", b"GET / HTTP/1.1\r\n"),
            _warc_record("response", b"HTTP/1.1 200 OK\r\n\r\nraw page",
                         uri="https://c.example/z"),
        )
    )
    gzdir = tmp_path / "gz"
    gzdir.mkdir()
    (gzdir / "seg.warc.gz").write_bytes(gz)

    docs = corpusio.read_warc_corpus(spark, str(tmp_path / "seg.warc"))
    assert docs.columns == DOC_SCHEMA
    rows = {r["source"]: r.asDict() for r in docs.collect()}
    assert set(rows) == {
        "https://a.example/x", "https://b.example/y", "https://c.example/z"
    }
    a = rows["https://a.example/x"]
    assert a["text"] == "hello warc\n"
    assert a["lang"] == "eng"  # first tag of the WET language list
    assert a["doc_id"] == _content_id("hello warc\n")
    assert a["n_chars"] == 11
    assert rows["https://b.example/y"]["lang"] == "fra"
    assert rows["https://c.example/z"]["lang"] is None

    gz_rows = {
        r["source"]: r.asDict()
        for r in corpusio.read_warc_corpus(spark, str(gzdir)).collect()
    }
    assert gz_rows == rows

    # record_types narrows: conversion-only drops the response record
    conv = corpusio.read_warc_corpus(
        spark, str(tmp_path / "seg.warc"), record_types=("conversion",)
    )
    assert conv.count() == 2


def test_read_warc_corpus_quarantines_corrupt_tail(spark, tmp_path):
    """Framing corruption mid-file: records BEFORE the break parse, the
    untrusted tail quarantines as one addressable corrupt row (dropped by
    default, kept with keep_corrupt=True) — and never aborts the scan."""
    good = _warc_record("conversion", b"ok doc", uri="https://ok.example")
    bad = good + b"GARBAGE-NOT-A-WARC-HEADER trailing junk"
    (tmp_path / "broken.warc").write_bytes(bad)

    default = corpusio.read_warc_corpus(spark, str(tmp_path))
    assert [r["text"] for r in default.collect()] == ["ok doc"]

    kept = corpusio.read_warc_corpus(spark, str(tmp_path), keep_corrupt=True)
    rows = kept.collect()
    assert len(rows) == 2
    q = [r for r in rows if r["corrupt"] is not None][0]
    assert "not a WARC record header" in q["corrupt"]
    # addressable, never NULL, and source-mixed so two broken files failing
    # the same way never collide
    assert q["doc_id"] == _content_id(q["corrupt"] + "\x1f" + q["source"])
    assert q["source"].endswith("broken.warc")

    # truncated Content-Length body quarantines too
    trunc = _warc_record("conversion", b"x" * 10)[:-14]
    (tmp_path / "broken.warc").write_bytes(trunc)
    got = corpusio.read_warc_corpus(spark, str(tmp_path), keep_corrupt=True).collect()
    assert len(got) == 1 and "truncated body" in got[0]["corrupt"]

    # a half-copied .warc.gz (truncated gzip raises EOFError, not OSError)
    # quarantines as the file's gzip row instead of failing the task
    import gzip

    whole = gzip.compress(_warc_record("conversion", b"doomed doc"))
    (tmp_path / "broken.warc").unlink()
    (tmp_path / "half.warc.gz").write_bytes(whole[: len(whole) // 2])
    got = corpusio.read_warc_corpus(spark, str(tmp_path), keep_corrupt=True).collect()
    q = [r for r in got if r["corrupt"] is not None]
    assert len(q) == 1 and q[0]["corrupt"].startswith("gzip:")
    assert q[0]["source"].endswith("half.warc.gz")


def test_split_warc_records_never_raises_on_fuzz():
    """The splitter is total: any byte string yields (records, reason) —
    the quarantine contract the Spark kernel relies on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pulsar_replay_spark.sources.corpusio import _split_warc_records

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=512))
    def fuzz(buf):
        recs, corrupt = _split_warc_records(buf)
        assert isinstance(recs, list)
        for headers, body in recs:
            assert int(headers["content-length"]) == len(body)

    fuzz()

    # and a valid prefix always survives whatever follows it
    good = _warc_record("conversion", b"abc")
    recs, corrupt = _split_warc_records(good + b"\xff\xfejunk")
    assert len(recs) == 1 and recs[0][1] == b"abc" and corrupt is not None


def test_stream_warc_corpus_matches_batch_reader(spark, tmp_path):
    """The streaming WARC twin must produce exactly the batch reader's rows
    for the same drop-folder, including the corrupt-tail quarantine."""
    import gzip

    good = _warc_record("conversion", "streamed doc\n".encode(),
                        uri="https://s.example/1", lang="eng")
    (tmp_path / "seg0.warc.gz").write_bytes(gzip.compress(good))
    (tmp_path / "seg1.warc").write_bytes(
        _warc_record("conversion", b"plain doc") + b"JUNK TAIL"
    )
    out_dir = str(tmp_path / "out")

    stream = corpusio.stream_warc_corpus(
        spark, str(tmp_path), keep_corrupt=True, max_files_per_trigger=1,
        pattern="*.warc*",
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish within timeout"

    got = {
        tuple(r)
        for r in spark.read.parquet(out_dir)
        .select("doc_id", "text", "lang", "n_chars", "corrupt")
        .collect()
    }
    want = {
        tuple(r)
        for r in corpusio.read_warc_corpus(
            spark, str(tmp_path), keep_corrupt=True, pattern="*.warc*"
        )
        .select("doc_id", "text", "lang", "n_chars", "corrupt")
        .collect()
    }
    assert got == want and len(got) == 3  # 2 docs + 1 quarantined tail


# ---------------------------------------------------------------------------
# Raw-WARC response records: HTTP framing split + HTML boilerplate strip.
# ---------------------------------------------------------------------------

_HTML_PAGE = (
    "<!DOCTYPE html><html><head><title>T&amp;C page</title>"
    "<style>body { color: red; }</style>"
    "<script type='text/javascript'>var x = '<b>not text</b>';</script>"
    "</head><body><!-- nav boilerplate -->"
    "<h1>Café menu</h1>\n<p>Fish &amp; chips &lt;today&gt;</p>"
    "<div>second   line</div></body></html>"
)


def _http_response(body: bytes, status: str = "200 OK",
                   headers: tuple[str, ...] = ("Content-Type: text/html",)) -> bytes:
    head = "\r\n".join([f"HTTP/1.1 {status}", *headers])
    return head.encode("latin-1") + b"\r\n\r\n" + body


def test_warc_response_records_extract_clean_text(spark, tmp_path):
    """The r7 'weak': raw-WARC response records must land as CLEAN text —
    no status line, no HTTP headers, no markup, entities decoded — while
    redirects and non-text payloads are skipped (records, not documents,
    not corruption)."""
    recs = (
        _warc_record("response", _http_response(_HTML_PAGE.encode()),
                     uri="https://page.example/a")
        + _warc_record("response", _http_response(b"", status="301 Moved",
                       headers=("Location: https://x",)),
                       uri="https://redirect.example")
        + _warc_record("response", _http_response(b"\x89PNG....",
                       headers=("Content-Type: image/png",)),
                       uri="https://img.example/p.png")
        + _warc_record("response", _http_response(
            b"plain payload, no markup",
            headers=("Content-Type: text/plain; charset=utf-8",)),
            uri="https://plain.example")
        + _warc_record("conversion", b"wet text stays verbatim",
                       uri="https://wet.example")
    )
    (tmp_path / "seg.warc").write_bytes(recs)

    rows = {r["source"]: r.asDict()
            for r in corpusio.read_warc_corpus(spark, str(tmp_path)).collect()}
    # redirect + image skipped; html, plain, and conversion land
    assert set(rows) == {"https://page.example/a", "https://plain.example",
                         "https://wet.example"}
    text = rows["https://page.example/a"]["text"]
    assert "HTTP/1.1" not in text and "Content-Type" not in text
    # no live markup survives ("<today>" comes from a DECODED entity — text)
    for tag in ("<p>", "<div", "</", "<h1>", "<script", "<style"):
        assert tag not in text
    assert "var x" not in text and "color: red" not in text
    assert "Café menu" in text and "Fish & chips <today>" in text
    assert "T&C page" in text and "second line" in text  # ws collapsed
    assert "nav boilerplate" not in text  # comments stripped
    assert rows["https://plain.example"]["text"] == "plain payload, no markup"
    assert rows["https://wet.example"]["text"] == "wet text stays verbatim"
    # doc_id is the content hash of the EXTRACTED text
    assert rows["https://page.example/a"]["doc_id"] == _content_id(text)

    # extract_http=False restores the verbatim (polluted) body, explicitly
    raw = {r["source"]: r["text"] for r in corpusio.read_warc_corpus(
        spark, str(tmp_path), extract_http=False).collect()}
    assert raw["https://page.example/a"].startswith("HTTP/1.1 200 OK")


def test_warc_response_chunked_gzip_and_charset(spark, tmp_path):
    """Transfer-Encoding: chunked is de-chunked, Content-Encoding: gzip is
    inflated, and the Content-Type charset is honored (latin-1 page with
    bytes that are NOT valid UTF-8)."""
    import gzip as _gzip

    chunked = b"7\r\n<p>one \r\n7\r\ntwo</p>\r\n0\r\n\r\n"
    gz_body = _gzip.compress("<p>gzipped résumé</p>".encode())
    latin = "café au lait".encode("latin-1")  # 0xe9: invalid UTF-8
    recs = (
        _warc_record("response", _http_response(
            chunked, headers=("Content-Type: text/html",
                              "Transfer-Encoding: chunked")),
            uri="https://chunk.example")
        + _warc_record("response", _http_response(
            gz_body, headers=("Content-Type: text/html; charset=utf-8",
                              "Content-Encoding: gzip")),
            uri="https://gz.example")
        + _warc_record("response", _http_response(
            latin, headers=("Content-Type: text/plain; charset=ISO-8859-1",)),
            uri="https://latin.example")
    )
    (tmp_path / "seg.warc").write_bytes(recs)
    rows = {r["source"]: r["text"]
            for r in corpusio.read_warc_corpus(spark, str(tmp_path)).collect()}
    assert rows["https://chunk.example"] == "one two"
    assert rows["https://gz.example"] == "gzipped résumé"
    assert rows["https://latin.example"] == "café au lait"


def test_http_payload_is_total_on_fuzz():
    """The HTTP extractor is total: any byte string yields exactly one of
    (text, None) / (None, reason) and never raises — the skip contract the
    WARC kernel relies on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pulsar_replay_spark.sources.corpusio import _dechunk, _http_payload

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=512))
    def fuzz(body):
        text, reason = _http_payload(body)
        assert (text is None) != (reason is None)
        assert isinstance(_dechunk(body), bytes)

    fuzz()

    import gzip as _gzip

    whole = _gzip.compress(b"cut off mid transfer " * 20)
    # seeded structured cases the random fuzz rarely hits
    for body in (
        b"HTTP/1.1 200 OK\r\n\r\n",
        b"HTTP/1.1 twohundred OK\r\n\r\nx",
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnot-gzip",
        # truncated gzip raises EOFError, corrupt deflate zlib.error —
        # neither is an OSError; both must degrade, never fail the task
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + whole[: len(whole) // 2],
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
        + whole[:12] + bytes(64) + whole[12:],
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nZZZ\r\nx",
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=bogus-enc\r\n\r\nhi",
        b"\n\n",
    ):
        text, reason = _http_payload(body)
        assert (text is None) != (reason is None)


def test_html_strip_matches_stdlib_parser_oracle():
    """Independent oracle: Python's html.parser (event-driven, shares no
    code with the regex strip) extracts the same whitespace-normalized text
    from the well-formed fixture page."""
    from html.parser import HTMLParser

    from pulsar_replay_spark.sources.corpusio import _strip_html

    class Oracle(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.chunks, self._skip = [], 0

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style"):
                self._skip += 1

        def handle_endtag(self, tag):
            if tag in ("script", "style") and self._skip:
                self._skip -= 1

        def handle_data(self, data):
            if not self._skip:
                self.chunks.append(data)

    o = Oracle()
    o.feed(_HTML_PAGE)
    expected = " ".join(" ".join(o.chunks).split())
    assert " ".join(_strip_html(_HTML_PAGE).split()) == expected


def test_jsonl_quarantine_ids_distinguish_null_patterns(spark, tmp_path):
    """Two corrupt rows whose evidence differs only in WHICH field is null
    must get distinct quarantine doc_ids (concat_ws silently skips nulls;
    each field is sentinel-coalesced first)."""
    lines = [
        json.dumps({"id": "x", "lang": None}),  # missing text; lang null
        json.dumps({"id": None, "lang": "x"}),  # missing text; id null
    ]
    (tmp_path / "p.jsonl").write_text("\n".join(lines))
    docs = corpusio.read_jsonl_corpus(
        spark, str(tmp_path), id_field="id", lang_field="lang", keep_corrupt=True
    )
    ids = [r["doc_id"] for r in docs.collect()]
    assert len(ids) == 2 and ids[0] != ids[1]


# ---------------------------------------------------------------------------
# r8: density-based main-content extraction (html_mode="main") — the
# boilerplate tier above tag-stripping: nav/menu/footer chrome is short and
# link-saturated, body text is neither.
# ---------------------------------------------------------------------------


def _oracle_main_text(markup: str, min_words: int = 5,
                      max_link_density: float = 0.33) -> str:
    """Independent re-derivation with stdlib html.parser (event-driven
    block building — no shared code with the regex kernel): same block
    tags, same word/link-word counts, same keep rule."""
    import html as html_mod
    from html.parser import HTMLParser

    block_tags = {
        "p", "div", "td", "th", "li", "ul", "ol", "dl", "dt", "dd",
        "h1", "h2", "h3", "h4", "h5", "h6", "article", "section", "header",
        "footer", "nav", "aside", "main", "blockquote", "pre", "table",
        "tr", "form", "figure", "br",
    }

    class P(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=False)
            self.blocks = [{"words": [], "link_words": 0}]
            self.in_a = 0
            self.skip = 0  # script/style depth

        def _cut(self):
            self.blocks.append({"words": [], "link_words": 0})

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style"):
                self.skip += 1
            if tag in block_tags:
                self._cut()
            if tag == "a":
                self.in_a += 1

        def handle_endtag(self, tag):
            if tag in ("script", "style"):
                self.skip = max(0, self.skip - 1)
            if tag in block_tags:
                self._cut()
            if tag == "a":
                self.in_a = max(0, self.in_a - 1)

        def handle_data(self, data):
            if self.skip:
                return
            ws = html_mod.unescape(data).split()
            self.blocks[-1]["words"].extend(ws)
            if self.in_a:
                self.blocks[-1]["link_words"] += len(ws)

        def handle_entityref(self, name):
            self.handle_data(html_mod.unescape(f"&{name};"))

        def handle_charref(self, name):
            self.handle_data(html_mod.unescape(f"&#{name};"))

    p = P()
    p.feed(markup)
    kept = []
    for b in p.blocks:
        n = len(b["words"])
        if n > 0 and n >= min_words and b["link_words"] / n <= max_link_density:
            kept.append(" ".join(b["words"]))
    return "\n".join(kept)


_BOILERPLATE_PAGE = """<html><head><title>t</title>
<script>nav_init();</script><style>.x{}</style></head><body>
<nav><a href="/">Home</a> <a href="/news">News</a> <a href="/about">About</a>
<a href="/contact">Contact</a> <a href="/login">Login</a></nav>
<div class="menu"><ul><li><a href="/a">Politics</a></li>
<li><a href="/b">Sports and games</a></li><li><a href="/c">Weather</a></li></ul></div>
<article><p>The quick brown fox jumps over the lazy dog while seventeen
researchers watch the experiment unfold with considerable interest.</p>
<p>A second substantial paragraph follows the first one here, describing
the methodology in enough words to pass any reasonable density floor. See
the <a href="/ref">reference</a> for details.</p></article>
<footer><a href="/tos">Terms</a> <a href="/privacy">Privacy</a>
<a href="/imprint">Imprint</a> &copy; 2026 Example Corp</footer>
</body></html>"""


def test_extract_main_text_drops_chrome_keeps_body():
    from pulsar_replay_spark.sources.corpusio import extract_main_text

    got = extract_main_text(_BOILERPLATE_PAGE)
    assert "quick brown fox" in got and "methodology" in got
    for chrome in ("Home", "Login", "Politics", "Weather", "Terms", "Privacy",
                   "nav_init"):
        assert chrome not in got, chrome
    # the in-body link's text survives (low density within a long block)
    assert "reference" in got


def test_extract_main_text_matches_independent_parser_oracle():
    from pulsar_replay_spark.sources.corpusio import extract_main_text

    pages = [
        _BOILERPLATE_PAGE,
        "<p>one two three four five six</p>",
        "<div><a href=x>all link text here five words</a></div>",
        "plain text with no markup at all in one run",
        "<td>cell one has five words</td><td>x</td>",
        "<p>amp &amp; lt &lt; entities &#65; count as words too</p>",
    ]
    for page in pages:
        assert extract_main_text(page) == _oracle_main_text(page), page[:40]


def test_extract_main_text_total_on_fuzz():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pulsar_replay_spark.sources.corpusio import extract_main_text

    @settings(max_examples=150, deadline=None)
    @given(st.text(max_size=400))
    def fuzz(s):
        assert isinstance(extract_main_text(s), str)

    fuzz()


def test_read_warc_corpus_html_mode_main(spark, tmp_path):
    """End-to-end: html_mode='main' drops the chrome the default strip mode
    keeps (both modes drop tags/headers)."""
    import gzip

    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            + _BOILERPLATE_PAGE.encode())
    rec = _warc_record("response", http, uri="https://x.example/page")
    (tmp_path / "seg.warc.gz").write_bytes(gzip.compress(rec))

    from pulsar_replay_spark.sources.corpusio import read_warc_corpus

    strip = read_warc_corpus(spark, str(tmp_path)).collect()[0]["text"]
    main = read_warc_corpus(spark, str(tmp_path), html_mode="main").collect()[0]["text"]
    assert "Login" in strip and "quick brown fox" in strip  # strip keeps chrome text
    assert "Login" not in main and "quick brown fox" in main
    assert "<" not in main and "nav_init" not in main


def test_read_warc_links_builds_host_graph(spark, tmp_path):
    """Raw WARC → (src_host, dst_host) edges: absolute + protocol-relative
    hrefs resolve to hosts, per-page duplicates collapse to one endorsement,
    same-host/relative/mailto links drop, redirects and damaged archives
    contribute nothing — and the graph composes into domain_rank."""
    import gzip

    page_a = (
        b'<html><body>'
        b'<a href="https://hub.example/x">x</a>'
        b'<a href="https://hub.example/y">same host twice: one edge</a>'
        b'<a href="//cdn.example/lib.js">proto-relative</a>'
        b'<a href="/local">relative: dropped</a>'
        b'<a href="mailto:a@b.c">mailto: dropped</a>'
        b'<a href="https://A.example/self">self link: dropped</a>'
        b"</body></html>"
    )
    page_b = b'<a href="https://hub.example/z">b endorses hub</a>'
    recs = (
        _warc_record("response", _http_response(page_a), uri="https://a.example/p1")
        + _warc_record("response", _http_response(page_b), uri="https://b.example/p2")
        # a redirect and a conversion record: no edges
        + _warc_record("response", _http_response(b"", status="302 Found",
                       headers=("Location: https://x",)),
                       uri="https://r.example/r")
        + _warc_record("conversion", b"plain text, no markup parsing",
                       uri="https://t.example/t")
    )
    (tmp_path / "seg.warc").write_bytes(recs)
    # damaged archive alongside: silently contributes nothing
    whole = gzip.compress(_warc_record("response", _http_response(page_b),
                                       uri="https://c.example/p"))
    (tmp_path / "half.warc.gz").write_bytes(whole[: len(whole) // 2])

    edges = corpusio.read_warc_links(spark, str(tmp_path))
    got = sorted(map(tuple, edges.collect()))
    assert got == [
        ("a.example", "cdn.example"),
        ("a.example", "hub.example"),
        ("b.example", "hub.example"),
    ]

    from pulsar_replay_spark.operators.graph import domain_rank

    ranks = {r["host"]: r["rank_fp"] for r in domain_rank(edges, n_iter=5).collect()}
    assert ranks["hub.example"] == max(ranks.values())


def test_page_link_hosts_is_total_on_fuzz():
    """The href extractor is total and emits only plausible hosts."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pulsar_replay_spark.sources.corpusio import page_link_hosts

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=300), st.none() | st.text(max_size=30))
    def fuzz(html, src):
        out = page_link_hosts(html, src)
        assert out == sorted(set(out))
        for h in out:
            assert h and h == h.lower() and " " not in h

    fuzz()


def test_stream_warc_links_matches_batch_reader(spark, tmp_path):
    """The streaming link-graph twin must produce exactly the batch
    reader's edges for the same drop-folder."""
    page = b'<a href="https://hub.example/x">x</a><a href="//cdn.example/y">y</a>'
    recs = (
        _warc_record("response", _http_response(page), uri="https://a.example/1")
        + _warc_record("response", _http_response(page), uri="https://b.example/2")
    )
    (tmp_path / "seg.warc").write_bytes(recs)
    out_dir = str(tmp_path / "out")

    stream = corpusio.stream_warc_links(spark, str(tmp_path), max_files_per_trigger=1)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish within timeout"

    got = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    want = sorted(map(tuple, corpusio.read_warc_links(spark, str(tmp_path)).collect()))
    assert got == want and len(want) == 4


def test_read_warc_anchors_mines_link_text(spark, tmp_path):
    """(src_host, dst_host, anchor) mining: nested markup stripped,
    entities decoded, image-only/hostless anchors dropped, same-host
    anchors KEPT (navigation text is signal) — and the streaming twin
    produces exactly the batch rows."""
    page = (
        b'<a href="https://t.example/p"><b>Great</b> &amp; useful guide</a>'
        b'<a href="/local">same-host nav</a>'
        b'<a href="https://img.example"><img src="x.png"></a>'
        b'<a href="https://a.example/self">about us</a>'
    )
    recs = _warc_record("response", _http_response(page), uri="https://a.example/p1")
    (tmp_path / "seg.warc").write_bytes(recs)

    got = sorted(map(tuple, corpusio.read_warc_anchors(spark, str(tmp_path)).collect()))
    assert got == [
        ("a.example", "a.example", "about us"),      # same-host kept
        ("a.example", "t.example", "Great & useful guide"),
    ]

    out_dir = str(tmp_path / "out")
    q = (
        corpusio.stream_warc_anchors(spark, str(tmp_path), max_files_per_trigger=1)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    assert sorted(map(tuple, spark.read.parquet(out_dir).collect())) == got


def test_page_anchors_is_total_on_fuzz():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pulsar_replay_spark.sources.corpusio import page_anchors

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=400))
    def fuzz(html):
        for dst, text in page_anchors(html):
            assert dst and text
            assert len(text) <= 256

    fuzz()


# ---------------------------------------------------------------------------
# r9: raw-WARC lang enrichment (multi-language stopword-density guess) and
# the <meta charset> prescan fallback.
# ---------------------------------------------------------------------------

_LANG_TEXTS = {
    "es": "el gato está en la casa y no quiere salir por la puerta para nada con los otros",
    "de": "der hund und die katze sind nicht in dem haus ein tier ist zu laut für den garten",
    "en": "the quick brown fox is one of the animals that it was for with are this",
    None: "zxqv wqpl mntr kjhg qwerty",
}


def _py_lang_guess(text: str, threshold: float = 0.02):
    """Independent python mirror of functions.text.lang_guess: same sets,
    same density arithmetic (double division), same (density, lang)
    max tie-break, same threshold."""
    from pulsar_replay_spark.functions.text import LANG_STOPWORDS

    toks = [t for t in text.lower().split(" ") if t]
    if not toks:
        return None
    best = max(
        (sum(t in set(ws) for t in toks) / len(toks), lang)
        for lang, ws in sorted(LANG_STOPWORDS.items())
    )
    return best[1] if best[0] >= threshold else None


def test_lang_guess_matches_python_mirror(spark):
    from pulsar_replay_spark.functions.text import lang_guess

    rows = [(i, t) for i, t in enumerate(
        [v for v in _LANG_TEXTS.values()]
        + ["", "   ", "the el der le il o", "EL GATO CON LOS OTROS POR ESO"]
    )]
    df = spark.createDataFrame(rows, "i long, text string")
    got = {r.i: r.g for r in df.select("i", lang_guess(F.col("text")).alias("g")).collect()}
    want = {i: _py_lang_guess(t) for i, t in rows}
    assert got == want
    # and the planted texts classify as planted
    for i, (lang, _t) in enumerate(_LANG_TEXTS.items()):
        assert got[i] == lang


def test_warc_response_lang_enrichment(spark, tmp_path):
    """Raw-WARC response records (no WARC-Identified-Content-Language
    header) get the stopword-density guess; gibberish stays NULL; a WET
    conversion record WITHOUT the header is NEVER enriched (path
    unchanged); lang_id=False restores the r8 behavior; stream ≡ batch
    with the enrichment on."""
    recs = b"".join(
        _warc_record(
            "response",
            _http_response(t.encode()),
            uri=f"https://{lang or 'gibberish'}.example/",
        )
        for lang, t in _LANG_TEXTS.items()
    ) + _warc_record(
        "conversion", b"the wet conversion text with the header absent",
        uri="https://wet-nolang.example/",
    )
    (tmp_path / "seg.warc").write_bytes(recs)
    rows = {
        r["source"]: r["lang"]
        for r in corpusio.read_warc_corpus(spark, str(tmp_path)).collect()
    }
    assert rows == {
        "https://es.example/": "es",
        "https://de.example/": "de",
        "https://en.example/": "en",
        "https://gibberish.example/": None,
        # WET row: header absent, heuristic NOT applied (would say 'en')
        "https://wet-nolang.example/": None,
    }
    off = {
        r["source"]: r["lang"]
        for r in corpusio.read_warc_corpus(
            spark, str(tmp_path), lang_id=False
        ).collect()
    }
    assert set(off.values()) == {None}

    out_dir = str(tmp_path / "out")
    q = (
        corpusio.stream_warc_corpus(spark, str(tmp_path), pattern="*.warc")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    streamed = {
        r["source"]: r["lang"] for r in spark.read.parquet(out_dir).collect()
    }
    assert streamed == rows


def test_meta_charset_consulted_when_content_type_lacks_one(spark, tmp_path):
    """A page whose Content-Type carries no charset but declares one via
    <meta charset=...> (or http-equiv) decodes under the declared charset;
    without the declaration the UTF-8-replace fallback stands."""
    body_decl = (
        '<html><head><meta charset="iso-8859-1"></head>'
        "<body>café au lait</body></html>"
    ).encode("iso-8859-1")
    body_equiv = (
        '<html><head><meta http-equiv="Content-Type" '
        'content="text/html; charset=iso-8859-1"></head>'
        "<body>déjà vu</body></html>"
    ).encode("iso-8859-1")
    body_plain = "<html><body>café noir</body></html>".encode("iso-8859-1")
    recs = (
        _warc_record("response", _http_response(body_decl),
                     uri="https://meta.example/")
        + _warc_record("response", _http_response(body_equiv),
                       uri="https://equiv.example/")
        + _warc_record("response", _http_response(body_plain),
                       uri="https://bare.example/")
        # header charset must still WIN over a conflicting meta tag
        + _warc_record(
            "response",
            _http_response(
                body_decl,
                headers=("Content-Type: text/html; charset=iso-8859-1",),
            ),
            uri="https://header-wins.example/",
        )
    )
    (tmp_path / "seg.warc").write_bytes(recs)
    rows = {
        r["source"]: r["text"]
        for r in corpusio.read_warc_corpus(spark, str(tmp_path)).collect()
    }
    assert rows["https://meta.example/"] == "café au lait"
    assert rows["https://equiv.example/"] == "déjà vu"
    assert rows["https://header-wins.example/"] == "café au lait"
    # no declaration anywhere: latin-1 é bytes are invalid UTF-8 → U+FFFD
    assert "caf� noir" == rows["https://bare.example/"]
