"""Message-envelope data model.

The unit of data in the reference is a row-oriented Pulsar message: an opaque
payload plus a typed metadata envelope (reference:
``pulsar_backup_restore.py:126-133``, ``README.md:63-75``). We model it as a
fixed StructType; the payload is carried losslessly as ``raw: binary`` with a
``content: string`` projection (UTF-8 when valid, base64 otherwise — the
reference's charset-fallback decode at ``pulsar_backup_restore.py:118-124``).

The reference has a bug where ``binary_encoded`` is always False
(``pulsar_backup_restore.py:128``); we implement the *intended* semantics
(the print path at ``:349-357`` sets it correctly) and test them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

MESSAGE_ENVELOPE = StructType(
    [
        StructField("topic", StringType(), False),
        StructField("content", StringType(), True),
        StructField("raw", BinaryType(), True),
        StructField("binary_encoded", BooleanType(), False),
        StructField("properties", MapType(StringType(), StringType()), True),
        StructField("publish_timestamp", TimestampType(), True),
        StructField("event_timestamp", TimestampType(), True),  # 0 → null
        StructField("partition_key", StringType(), True),
    ]
)


def b64(raw: Column) -> Column:
    """base64 without the JVM codec's MIME \\r\\n chunking every 76 chars —
    matches Python's ``base64.b64encode`` (what the reference writes to disk,
    ``pulsar_backup_restore.py:123``) and DuckDB's ``base64``."""
    return F.regexp_replace(F.base64(raw), "[\\r\\n]", "")


def is_valid_utf8(raw: Column) -> Column:
    """True iff ``raw`` decodes as UTF-8.

    Spark 4's ANSI ``decode`` THROWS on malformed input
    (MALFORMED_CHARACTER_CODING), so validity uses the 4.0+ builtin
    ``is_valid_utf8`` over the unchecked ``cast(binary as string)``
    reinterpretation. Pure built-ins — stays in whole-stage codegen (no UDF).
    """
    return F.is_valid_utf8(raw.cast("string"))


def decode_content(raw: Column) -> Column:
    """Charset-fallback decode (reference ``pulsar_backup_restore.py:118-124``):
    UTF-8 when valid, else base64-of-bytes. The valid branch uses the cast
    reinterpretation (never throws), not ANSI ``decode``."""
    return F.when(is_valid_utf8(raw), raw.cast("string")).otherwise(b64(raw))


def encode_content(content: Column, binary_encoded: Column) -> Column:
    """Inverse transform for replay (reference ``pulsar_backup_restore.py:203-208``):
    base64-decode when flagged binary, else UTF-8 bytes of the string."""
    return F.when(binary_encoded, F.unbase64(content)).otherwise(F.encode(content, "UTF-8"))


def with_envelope(df: DataFrame, raw_col: str = "raw") -> DataFrame:
    """Project the content/binary_encoded pair from a raw binary column."""
    raw = F.col(raw_col)
    return df.withColumn("content", decode_content(raw)).withColumn(
        "binary_encoded", ~is_valid_utf8(raw)
    )


def normalize_event_timestamp(col: Column) -> Column:
    """Reference semantics: event_timestamp==0 means unset → null
    (``pulsar_backup_restore.py:131,214``). ``col`` is epoch millis."""
    return F.when(col == 0, F.lit(None)).otherwise(F.timestamp_millis(col))


def synthetic_envelope(spark: SparkSession, n: int = 1000, n_topics: int = 8) -> DataFrame:
    """Deterministic envelope fixture covering every branch FIXTURES.md §B1
    demands: ASCII rows, multibyte-UTF-8 rows, invalid-UTF-8 rows (base64
    branch), empty properties, zero event_timestamp, null partition_key, and
    topics with/without a ``-partition-N`` suffix.

    Pure ``spark.range`` + expressions — distributed, no driver loop.
    """
    df = spark.range(n).withColumnRenamed("id", "i")
    topic = F.concat(
        F.lit("persistent://tenant-"),
        (F.col("i") % 3).cast("string"),
        F.lit("/ns-"),
        (F.col("i") % 2).cast("string"),
        F.lit("/topic-"),
        (F.col("i") % n_topics).cast("string"),
        F.when((F.col("i") % 5) == 0, F.concat(F.lit("-partition-"), (F.col("i") % 4).cast("string"))).otherwise(F.lit("")),
    )
    raw = (
        F.when((F.col("i") % 7) == 3, F.unhex(F.lit("FF80C328")))  # invalid UTF-8
        .when((F.col("i") % 7) == 5, F.encode(F.concat(F.lit("päylöad-世界-"), F.col("i").cast("string")), "UTF-8"))
        .otherwise(F.encode(F.concat(F.lit("payload-"), F.col("i").cast("string")), "UTF-8"))
    )
    return (
        df.withColumn("topic", topic)
        .withColumn("raw", raw)
        .withColumn("content", decode_content(F.col("raw")))
        .withColumn("binary_encoded", ~is_valid_utf8(F.col("raw")))
        .withColumn(
            "properties",
            F.when((F.col("i") % 4) == 0, F.create_map().cast("map<string,string>")).otherwise(
                F.create_map(F.lit("seq"), F.col("i").cast("string"))
            ),
        )
        .withColumn("publish_timestamp", F.timestamp_millis(F.lit(1700000000000) + F.col("i") * 1000))
        .withColumn(
            "event_timestamp",
            normalize_event_timestamp(
                F.when((F.col("i") % 6) == 0, F.lit(0)).otherwise(F.lit(1700000000000) + F.col("i") * 900)
            ),
        )
        .withColumn(
            "partition_key",
            F.when((F.col("i") % 3) == 0, F.lit(None).cast("string")).otherwise(
                F.concat(F.lit("key-"), (F.col("i") % 10).cast("string"))
            ),
        )
        .drop("i")
    )
