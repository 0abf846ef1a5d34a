"""Vocabulary Zipf/coverage report + CCNet perplexity buckets.

Gates: exact DuckDB-twin equality for vocab_stats (counts, rank order,
cumulative coverage), coverage monotonicity, CCNet bucket partition
invariants (ordering between tiers, ~1/3 shares, short==NULL surfacing),
prebuilt-LM reuse equality, and the broadcast-threshold plan shape.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from pulsar_replay_spark.operators import quality

from tests.conftest import SF_SMOKE


def test_vocab_stats_matches_duckdb(spark, documents):
    got = [tuple(r) for r in quality.vocab_stats(documents, top_k=50).orderBy("rank").collect()]
    con = duckdb.connect()
    expect = con.execute(
        f"""
        WITH toks AS (
          SELECT unnest(string_split(text, ' ')) AS word
          FROM read_parquet('{SF_SMOKE}/documents.parquet')
        ),
        counts AS (SELECT word, count(*)::BIGINT AS cnt FROM toks GROUP BY word),
        tot AS (SELECT sum(cnt)::DOUBLE AS t FROM counts),
        ranked AS (
          SELECT row_number() OVER (ORDER BY cnt DESC, word) AS rank, word, cnt
          FROM counts
        )
        SELECT rank::INT, word, cnt,
               round(sum(cnt) OVER (ORDER BY rank) / (SELECT t FROM tot), 6)
                 AS cum_share
        FROM ranked WHERE rank <= 50 ORDER BY rank
        """
    ).fetchall()
    assert got == [tuple(r) for r in expect]


def test_vocab_stats_coverage_monotone_and_bounded(spark, documents):
    rows = quality.vocab_stats(documents, top_k=30).orderBy("rank").collect()
    shares = [r["cum_share"] for r in rows]
    assert all(b > a for a, b in zip(shares, shares[1:]))
    assert 0 < shares[0] and shares[-1] <= 1.0
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)


@pytest.fixture(scope="module")
def buckets(spark, documents):
    return quality.ccnet_buckets(documents).localCheckpoint(eager=True)


def test_ccnet_buckets_partition_and_ordering(spark, documents, buckets):
    rows = buckets.collect()
    assert len(rows) == documents.count()
    assert {r["bucket"] for r in rows} <= {"head", "middle", "tail", "short"}
    for r in rows:
        assert (r["bucket"] == "short") == (r["nll"] is None)
    by_lang: dict[str, dict[str, list[float]]] = {}
    for r in rows:
        if r["nll"] is not None:
            by_lang.setdefault(r["lang"], {}).setdefault(r["bucket"], []).append(r["nll"])
    for lang, tiers in by_lang.items():
        if "head" in tiers and "middle" in tiers:
            assert max(tiers["head"]) <= min(tiers["middle"])
        if "middle" in tiers and "tail" in tiers:
            assert max(tiers["middle"]) <= min(tiers["tail"])
        # tiers are ~tertiles of each language's own distribution
        n = sum(len(v) for v in tiers.values())
        for tier, vals in tiers.items():
            assert abs(len(vals) / n - 1 / 3) < 0.2, (lang, tier, len(vals), n)


def test_ccnet_buckets_reuse_prebuilt_lm(spark, documents, buckets):
    scores = quality.lm_doc_scores(documents)
    reused = quality.ccnet_buckets(documents, scores=scores)
    assert sorted(map(tuple, reused.collect())) == sorted(
        map(tuple, buckets.collect())
    )


def test_ccnet_threshold_join_is_broadcast(spark, documents):
    plan = (
        quality.ccnet_buckets(documents)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
