"""Console sink (SURVEY §2.1 S8): the reference's pretty-print path
(``pulsar_backup_restore.py:295-382``) — every message with metadata plus
per-topic running counters — expressed as DataFrame show / streaming console
sink rather than a driver loop."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def print_messages(env: DataFrame, n: int = 20, truncate: bool = False) -> None:
    """Batch form: message dump ordered by (topic, publish time) followed by
    the per-topic counter summary (A1, ``pulsar_backup_restore.py:343-378``)."""
    env.orderBy("topic", "publish_timestamp").show(n, truncate=truncate)
    env.groupBy("topic").agg(F.count("*").alias("n_msgs")).orderBy("topic").show(
        n, truncate=truncate
    )


def console_stream(stream_df: DataFrame, checkpoint_dir: str, n: int = 20):
    """Streaming form: console sink with availableNow (bounded print, the
    reference's scan-then-stop behavior)."""
    return (
        stream_df.writeStream.format("console")
        .option("numRows", n)
        .option("truncate", False)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
