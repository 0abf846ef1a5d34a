"""Per-group statistics via the Arrow-batched Python seam (SURVEY §2.10).

The engine's UDF policy: built-in JVM expressions for everything expressible
(the whole correctness corpus), Arrow-batched ``applyInPandas`` /
``mapInPandas`` for logic that genuinely needs Python (model scoring,
tokenizers, decoders) — never row-at-a-time Python UDFs.

``zscore_by_group`` exists as the canonical example of that seam: the same
semantics are expressible with window functions (``zscore_by_group_sql``),
which is exactly what makes it oracle-checkable — the driver compares the
Python path against DuckDB, pinning the Arrow round-trip, grouping, and
NaN/null conventions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ZSCORE_SCHEMA = "event_id long, event_type string, value double, zscore double"


def zscore_by_group(events: DataFrame) -> DataFrame:
    """Per-event_type z-score via applyInPandas (one Arrow batch per group).

    Scale: groups are shuffled by key once; each group must fit an executor's
    memory (event_type cardinality is tiny, rows per group large — for
    high-cardinality keys this is the right shape; for giant single groups
    use the window-function variant below, which streams)."""

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["value"].std(ddof=1)  # sample stddev == stddev_samp
        mean = pdf["value"].mean()
        z = (pdf["value"] - mean) / std if std and std > 0 else pd.Series([None] * len(pdf))
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "value": pdf["value"],
                "zscore": z.round(4),
            }
        )

    return events.select("event_id", "event_type", "value").groupBy("event_type").applyInPandas(
        score, schema=ZSCORE_SCHEMA
    )


def zscore_by_group_sql(events: DataFrame) -> DataFrame:
    """The JVM-side equivalent (window functions, no Python) — the scale path
    when groups are huge, and the oracle twin of ``zscore_by_group``."""
    w = Window.partitionBy("event_type")
    return events.select(
        "event_id",
        "event_type",
        "value",
        F.round(
            (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w), 4
        ).alias("zscore"),
    )
