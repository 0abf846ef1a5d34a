"""As-of (point-in-time) join.

Spark has no native as-of join; the naive formulation — an equi-join on key
with a time inequality, then "keep latest per left row" — explodes every left
row by all earlier right rows before pruning (O(|L|·|R|/keys) intermediate at
100 TB that AQE cannot save).

The union+window formulation here costs exactly ONE shuffle of (key) and no
join at all:

1. tag left rows 1, right rows 0; union on (key, time, tag);
2. one window sorted by (time, tag) per key; ``last(payload, ignorenulls)``
   over the unbounded-preceding frame carries each right row's payload
   forward to every later left row;
3. keep only left rows.

The window sort is the same work a sort-merge join would do on the right
side, minus the pair explosion. Skewed keys land in one partition each —
the standard mitigation (AQE can't split windows) is a coarser time-bucketed
pre-key when a single key's history outgrows a partition.

Reference parity: the reference has no joins at all (SURVEY.md §2.3); this is
an engine extension in the family the brief names (as-of / range joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_per(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """One row per key-group: the one with the greatest ``order_col``
    (deterministic as-of inputs require right-side uniqueness per
    (key, time))."""
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return df.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: attach ``payload`` from the right row with the
    greatest ``right_time`` <= ``left_time`` (direction="backward", inclusive)
    or smallest >= (direction="forward"), matched per ``key``.

    ``right`` must be unique per (key, right_time) — pre-reduce with
    :func:`latest_per` otherwise. Unmatched left rows keep null payload
    (left-join semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    out_cols = [c for c in left.columns]
    l2 = (
        left.withColumn("_asof_t", F.col(left_time))
        .withColumn("_is_left", F.lit(1))
    )
    # Payload rides as ONE struct so the matched right row is atomic: a right
    # row whose payload fields are legitimately NULL must not be stitched with
    # fields from an older row (struct is non-null whenever a right row
    # exists, so last(ignorenulls) picks whole rows, never per-field).
    r2 = right.select(
        F.col(key),
        F.col(right_time).alias("_asof_t"),
        F.struct(*[F.col(c) for c in payload]).alias("_asof_p"),
    ).withColumn("_is_left", F.lit(0))
    u = l2.unionByName(r2, allowMissingColumns=True)

    t = F.col("_asof_t").asc() if direction == "backward" else F.col("_asof_t").desc()
    w = (
        Window.partitionBy(key)
        .orderBy(t, F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.select(
            *[F.col(c) for c in out_cols],
            F.col("_is_left"),
            F.last(F.col("_asof_p"), ignorenulls=True).over(w).alias("_asof_p"),
        )
        .filter("_is_left = 1")
    )
    return matched.select(
        *[F.col(c) for c in out_cols],
        *[F.col("_asof_p").getField(c).alias(c) for c in payload],
    )
