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


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    fact_time: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    payload: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension (Type 2) enrichment: attach the dimension
    version whose validity interval covers each fact's timestamp — the
    warehouse pattern behind "what was this customer's segment WHEN the
    order happened".

    Pure composition over :func:`asof_join` (same one-shuffle union+window
    plan, no interval pair explosion): pick the latest version with
    ``valid_from <= fact_time``, then null the payload out when the fact
    falls at/after that version's ``valid_to`` (a gap between versions —
    with the standard gapless open-ended SCD2 dim, the filter never fires).
    NULL ``valid_to`` = current open version.
    """
    if payload is None:
        payload = [c for c in dim.columns if c not in (key, valid_from, valid_to)]
    joined = asof_join(
        facts,
        dim,
        key=key,
        left_time=fact_time,
        right_time=valid_from,
        payload=payload + [valid_to],
    )
    in_window = F.col(valid_to).isNull() | (F.col(fact_time) < F.col(valid_to))
    out = joined
    for c in payload:
        out = out.withColumn(c, F.when(in_window, F.col(c)))
    return out.drop(valid_to)
