"""Corpus ingestion front door: JSONL and plain-text files → the
``documents`` contract (doc_id, text, lang, source, n_chars) every
dedup/quality/curation/tokenizer operator in the engine consumes.

Real pretraining pipelines start from JSONL dumps (one JSON object per
line — the Common Crawl / RedPajama / Dolma interchange shape) or raw
text files, not parquet. These readers normalize either into the
documents schema with STABLE ids, so a re-crawled file keeps its split
(``curation.hash_split``) and its dedup verdicts.

Scale posture:
- explicit schemas only — ``spark.read.json`` with inferred schema scans
  the data TWICE (once to infer); at 100 TB the inference pass alone is
  the bill. ``read_jsonl_corpus`` builds the read schema from the field
  arguments and never infers.
- ids are content hashes (md5-derived 60-bit, the engine-wide discipline:
  DuckDB-reproducible, no monotonically_increasing_id whose values depend
  on partitioning) unless the corpus carries its own id field.
- both readers are pure projections over the file scan — zero shuffles;
  JSONL corruption tolerance is explicit (``_corrupt_record`` routed to a
  quarantine column, never a job abort), matching the reference's
  tolerant-parse posture (the UTF-8-or-base64 fallback in its message
  decode — see envelope.py's citations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# content-addressed ids ARE the engine-wide 60-bit md5 contract the
# dedup/fingerprint operators rely on (DuckDB-reproducible) — one
# implementation, not a re-coding of the same expression
from pulsar_replay_spark.functions.text import token_hash60 as _content_id

CORRUPT_COL = "_corrupt_record"


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    id_field: str | None = None,
    lang_field: str | None = None,
    source_field: str | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """JSONL (one JSON doc per line) → the documents contract.

    Only the named fields are in the read schema — no inference pass, and
    Spark's JSON reader prunes unprojected fields at parse time. Rows that
    fail to parse land in ``_corrupt_record`` (PERMISSIVE mode): dropped by
    default, kept as (doc_id, text=NULL, …, corrupt=<raw line>) rows when
    ``keep_corrupt=True`` so a quality gate can count them — a malformed
    line never aborts the job. ``corrupt`` also flags parseable objects
    MISSING the text field ("missing-text-field"), and the expression
    keeps the scan schema wider than the corrupt column alone, so
    corrupt-only downstream projections don't trip Spark's
    QUERY_ONLY_CORRUPT_RECORD_COLUMN analyzer restriction.

    doc_id: the corpus's own ``id_field`` when given (hashed if non-numeric
    — ids must be joinable longs engine-wide), else the 60-bit content hash
    of the text (content-addressed: exact duplicate lines get equal ids,
    which the exact-dedup tier collapses by design). lang/source default to
    NULL/the file path when the corpus lacks the fields."""
    raw = (
        spark.read.schema(_jsonl_schema(text_field, id_field, lang_field, source_field))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    return _project_documents(
        raw, text_field, id_field, lang_field, source_field, keep_corrupt
    )


def stream_jsonl_corpus(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    id_field: str | None = None,
    lang_field: str | None = None,
    source_field: str | None = None,
    keep_corrupt: bool = False,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of ``read_jsonl_corpus``: a JSONL drop-folder as a
    STREAMING documents frame — the front half of the continuous-curation
    shape (``streaming/pipelines.curation_ingest_sink`` is the back half:
    files land → documents micro-batches → exact-dup + LSH probe + quality
    gate → idempotent accepted-store partitions). Same explicit schema, same
    corrupt-line quarantine, same content-addressed ids as the batch reader
    (gated equal in tests); ``max_files_per_trigger`` bounds micro-batch
    size for backpressure."""
    reader = (
        spark.readStream.schema(
            _jsonl_schema(text_field, id_field, lang_field, source_field)
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return _project_documents(
        reader.json(path), text_field, id_field, lang_field, source_field, keep_corrupt
    )


def _jsonl_schema(text_field, id_field, lang_field, source_field) -> str:
    fields = [f"`{text_field}` STRING"]
    for f_ in (id_field, lang_field, source_field):
        if f_ is not None:
            fields.append(f"`{f_}` STRING")
    return ", ".join(fields) + f", `{CORRUPT_COL}` STRING"


def _field(name: str) -> "F.Column":
    # backtick-quote: the read schema declares these as FLAT columns, so a
    # dotted corpus key ("meta.text") must not parse as struct access
    return F.col(f"`{name}`")


def _project_documents(
    raw: DataFrame, text_field, id_field, lang_field, source_field, keep_corrupt
) -> DataFrame:
    text = _field(text_field)
    if id_field is not None:
        # try_cast, not cast: ANSI raises on non-numeric ids instead of NULL;
        # coalesce so an id-less ROW (merged dumps) falls back to the content
        # hash instead of a silent NULL doc_id
        numeric = _field(id_field).try_cast("long")
        id_col = F.coalesce(numeric, _content_id(_field(id_field)), _content_id(text))
    else:
        id_col = _content_id(text)
    lang = _field(lang_field) if lang_field else F.lit(None).cast("string")
    source = _field(source_field) if source_field else F.input_file_name()
    # quarantine = unparseable line OR parseable-but-text-less object; the
    # text reference also keeps the scan's required schema wider than the
    # corrupt column alone, so corrupt-only downstream projections don't
    # trip Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN analyzer error
    corrupt = F.coalesce(
        F.col(CORRUPT_COL),
        F.when(text.isNull(), F.lit("missing-text-field")),
    )
    # quarantine rows have no text: hash the corrupt payload (the raw line,
    # or the "missing-text-field" marker) so they stay addressable/joinable
    # downstream instead of carrying a NULL doc_id
    id_col = F.coalesce(id_col, _content_id(corrupt))
    out = raw.select(
        id_col.alias("doc_id"),
        text.alias("text"),
        lang.alias("lang"),
        source.alias("source"),
        F.coalesce(F.length(text), F.lit(0)).cast("long").alias("n_chars"),
        corrupt.alias("corrupt"),
    )
    if keep_corrupt:
        return out
    return out.filter(F.col("corrupt").isNull()).drop("corrupt")


def read_text_corpus(
    spark: SparkSession, path: str, whole_files: bool = False
) -> DataFrame:
    """Plain text → the documents contract. ``whole_files=False`` (default):
    one document per LINE (the dump-of-sentences shape; blank lines
    dropped); ``whole_files=True``: one document per FILE via
    ``wholetext`` — files are then the parallelism unit, so individual
    files must fit an executor (the ``read_media_dir`` caveat).

    doc_id is the content hash — identical lines/files collapse under the
    exact-dedup tier rather than masquerading as distinct docs."""
    raw = spark.read.text(path, wholetext=whole_files).select(
        F.col("value").alias("text"), F.input_file_name().alias("source")
    )
    if not whole_files:
        raw = raw.filter(F.length(F.trim(F.col("text"))) > 0)
    return raw.select(
        _content_id(F.col("text")).alias("doc_id"),
        "text",
        F.lit(None).cast("string").alias("lang"),
        "source",
        F.length("text").cast("long").alias("n_chars"),
    )


def write_jsonl_corpus(docs: DataFrame, path: str, n_shards: int = 16) -> None:
    """Documents → sharded JSONL (the interchange format downstream trainers
    read). One file per shard via repartition(n_shards) — a 100 TB corpus
    picks n_shards for the target file size, the write stays parallel."""
    docs.select("doc_id", "text", "lang", "source", "n_chars").repartition(
        n_shards
    ).write.mode("overwrite").json(path)
