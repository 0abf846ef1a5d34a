"""Scalar functions mirroring the reference's string/topic codecs.

All pure built-in expressions (JVM-side, whole-stage codegen) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference: pulsar_backup_restore.py:44-46 — regex `-partition-\d+$`.
PARTITION_SUFFIX_RE = r"-partition-\d+$"


def is_partition_topic(topic: Column) -> Column:
    """True iff the topic is a physical partition child (P1 anti-filter)."""
    return topic.rlike(PARTITION_SUFFIX_RE)


def collapse_partition(topic: Column) -> Column:
    """Collapse `<topic>-partition-N` to its parent (P6; reference
    ``pulsar_remote_inspector.py:437-439``)."""
    return F.regexp_replace(topic, PARTITION_SUFFIX_RE, "")


def extract_project_id(topic: Column) -> Column:
    """`(?:post-)?ingestion-(\\d+)` → int project id (P5; reference
    ``pulsar_remote_inspector.py:188-195``). Null when no match."""
    ex = F.regexp_extract(topic, r"(?:post-)?ingestion-(\d+)", 1)
    return F.when(ex == "", F.lit(None)).otherwise(ex).cast("int")


def topic_to_filename(topic: Column) -> Column:
    """Filesystem-safe topic name: `/` → `_` (P7; reference
    ``pulsar_backup_restore.py:103``) plus `:` → `+` — an engine extension
    because Hadoop's Path/URI layer rejects colons in file names (the
    reference's plain-Python I/O had no such constraint)."""
    return F.translate(topic, "/:", "_+")


def topic_from_filename(name: Column) -> Column:
    """Inverse codec, `_` → `/`, `+` → `:` (reference
    ``pulsar_backup_restore.py:192`` + engine colon extension)."""
    return F.translate(name, "_+", "/:")
