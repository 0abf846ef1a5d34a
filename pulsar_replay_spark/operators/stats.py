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


def ewma(
    df: DataFrame,
    key: str,
    order_col: str,
    val_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Exponentially-weighted moving average per key series:
    s_t = alpha*x_t + (1-alpha)*s_{t-1}, s_0 = x_0 — the smoothing recursion
    window functions can't express (each value depends on the previous
    OUTPUT). Shape: collect each key's series into one array (sorted
    in-array — no window sort), run the recursion as a single ``aggregate``
    fold (whole-stage codegen, no Python), explode back.

    A key's full series must fit one row — which is the nature of the
    operator (bounded by the time-bucket keyspace, not raw events; at
    100 TB the input should be a rollup/hourly frame, not raw data).
    Returns (key, order_col, val_col, ewma)."""
    series = df.groupBy(key).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(val_col).alias("x")))
        ).alias("s")
    )
    state_t = "array<struct<o:timestamp,x:double,ewma:double>>"
    folded = series.select(
        key,
        F.aggregate(
            "s",
            F.expr(f"cast(array() as {state_t})"),
            lambda acc, e: F.concat(
                acc,
                F.array(
                    F.struct(
                        e["o"].alias("o"),
                        e["x"].cast("double").alias("x"),
                        F.when(
                            F.size(acc) == 0, e["x"].cast("double")
                        )
                        .otherwise(
                            F.lit(alpha) * e["x"].cast("double")
                            + F.lit(1.0 - alpha) * F.element_at(acc, -1)["ewma"]
                        )
                        .alias("ewma"),
                    )
                ),
            ),
        ).alias("f"),
    )
    out = folded.select(key, F.explode("f").alias("e")).select(
        key,
        F.col("e.o").alias(order_col),
        F.col("e.x").alias(val_col),
        F.round("e.ewma", 6).alias("ewma"),
    )
    return out
