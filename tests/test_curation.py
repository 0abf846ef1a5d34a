"""Token-budget curation gates: the two-phase scale path must equal the
one-window spec twin AND the DuckDB oracle; invariants (budget respected,
selection is score-dominant, determinism); plan gate (corpus window
partitions on (source, score), never source alone)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from pulsar_replay_spark.operators import curation
from tests.conftest import SF_SMOKE

BUDGET = 20_000

_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')), 4) AS score
  FROM documents
),
cum AS (
  SELECT *, CAST(SUM(n_tokens) OVER (
      PARTITION BY source ORDER BY score DESC, doc_id) AS BIGINT) AS cum_tokens
  FROM scored
)
SELECT doc_id, source, n_tokens, score, cum_tokens
FROM cum WHERE cum_tokens <= {BUDGET}
"""


@pytest.fixture(scope="module")
def selected(documents):
    return sorted(
        map(tuple, curation.select_within_token_budget(documents, BUDGET).collect())
    )


def test_scale_path_equals_spec_twin(documents, selected):
    naive = sorted(
        map(
            tuple,
            curation.select_within_token_budget_naive(documents, BUDGET).collect(),
        )
    )
    assert selected == naive


def test_matches_duckdb_oracle(selected):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    assert selected == sorted(map(tuple, con.execute(_ORACLE).fetchall()))


def test_budget_respected_and_maximal(documents, selected):
    per_source: dict[str, int] = {}
    floor: dict[str, float] = {}
    for _, src, n, score, _cum in selected:
        per_source[src] = per_source.get(src, 0) + n
        floor[src] = min(floor.get(src, 1.0), score)
    assert per_source and all(v <= BUDGET for v in per_source.values())
    # score-dominance: every unselected doc scoring above the source's floor
    # would overflow the budget (the prefix is maximal, not arbitrary)
    kept_ids = {t[0] for t in selected}
    rows = curation._scored(documents, None).collect()
    for r in rows:
        if r.doc_id not in kept_ids and r.source in floor and r.score > floor[r.source]:
            assert per_source[r.source] + r.n_tokens > BUDGET


def test_deterministic_under_repartition(documents):
    a = sorted(
        map(tuple, curation.select_within_token_budget(documents, BUDGET).collect())
    )
    b = sorted(
        map(
            tuple,
            curation.select_within_token_budget(
                documents.repartition(13), BUDGET
            ).collect(),
        )
    )
    assert a == b


def test_corpus_window_partitions_on_source_and_score(documents):
    plan = (
        curation.select_within_token_budget(documents, BUDGET)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(source" in plan and "score" in plan.split(
        "hashpartitioning(source", 1
    )[1][:60]


def test_mixture_summary(documents):
    sel = curation.select_within_token_budget(documents, BUDGET)
    rows = curation.mixture_summary(sel, BUDGET).collect()
    assert rows
    for r in rows:
        assert 0 < r.budget_util <= 1.0
        assert 0 < r.score_floor <= 1.0
