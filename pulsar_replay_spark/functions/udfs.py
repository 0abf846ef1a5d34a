"""Vectorized (Arrow) scalar UDF seams for logic that needs Python libraries
at runtime — tokenizer / embedding-model calls plug in here. Everything in
the correctness corpus stays on JVM built-ins; these exist as the documented
extension point and are pinned against their JVM twins in tests."""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("int")
def ws_token_count_udf(text: pd.Series) -> pd.Series:
    """Whitespace token count — the Python twin of
    ``functions.text.token_count`` (Arrow-batched; a real BPE tokenizer call
    would replace the split)."""
    return text.str.split(" ").map(len).astype("int32")


@pandas_udf("double")
def quality_score_udf(text: pd.Series) -> pd.Series:
    """Toy quality score (type-token ratio damped by length) — the seam where
    a learned quality model would run."""
    toks = text.str.split(" ")
    ttr = toks.map(lambda t: len(set(t)) / len(t) if t else 0.0)
    length_penalty = toks.map(len).clip(upper=200) / 200.0
    return (ttr * length_penalty).round(4)


def topic_parts_udtf():
    """Python UDTF (Spark ≥3.5): one topic string → one row per path segment
    with its role (domain/tenant/namespace/topic). UDTFs are the engine's
    table-function seam (SURVEY §2.10) — the row-generating analog of the
    scalar seams above; a real use is exploding a raw crawl record into
    per-asset rows.

    Returns the class for ``udtf()`` registration (kept lazy so importing
    this module never requires a live session).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="segment_idx int, role string, segment string")
    class TopicParts:
        ROLES = ["domain", "tenant", "namespace", "topic"]

        def eval(self, topic: str):
            if topic is None:
                return
            # persistent://tenant/namespace/topic
            head, _, rest = topic.partition("://")
            parts = [head] + rest.split("/") if rest else [head]
            for i, seg in enumerate(parts):
                role = self.ROLES[i] if i < len(self.ROLES) else "extra"
                yield i, role, seg

    return TopicParts


@pandas_udf("double")
def weighted_avg_udf(value: pd.Series, weight: pd.Series) -> float:
    """Grouped-aggregate Pandas UDF (Arrow series-to-scalar): weighted mean.
    The custom-UDAF seam — where a numpy/scipy reduction (e.g. a learned
    calibration curve) would run per group. Spark computes it per shuffle
    partition group; unlike scalar UDFs it participates in hash aggregation
    directly."""
    w = weight.sum()
    return float((value * weight).sum() / w) if w else 0.0
