"""Feature-hashed document vectors (the hashing trick).

Gates: exact DuckDB-twin equality of every component, planted near-dup
docs rank closest under cosine, composition with the vector tier
(brute-force top-k + semantic dedup run unchanged), empty-doc zeros, and
repartition determinism.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from pulsar_replay_spark.operators import quality, similarity

from tests.conftest import SF_SMOKE

DIM = 64


@pytest.fixture(scope="module")
def vecs(spark, documents):
    return quality.hashed_doc_vectors(documents, dim=DIM).localCheckpoint(eager=True)


def test_components_match_duckdb(spark, vecs):
    got = {r["vec_id"]: list(r["embedding"]) for r in vecs.collect()}
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w
          FROM read_parquet('{SF_SMOKE}/documents.parquet')
        ),
        hashed AS (
          SELECT doc_id,
                 ('0x' || substr(md5(w), 1, 4))::BIGINT % {DIM} AS b,
                 CASE WHEN ('0x' || substr(md5(w), 5, 1))::BIGINT < 8
                      THEN 1 ELSE -1 END AS s
          FROM tok WHERE w <> ''
        )
        SELECT doc_id, b, SUM(s)::BIGINT AS v FROM hashed GROUP BY 1, 2
        """
    ).fetchall()
    expect: dict[int, list] = {}
    for doc_id, b, v in rows:
        expect.setdefault(doc_id, [0.0] * DIM)[int(b)] = float(v)
    all_ids = [
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        ).fetchall()
    ]
    assert set(got) == set(all_ids)
    for doc_id in all_ids:
        assert got[doc_id] == expect.get(doc_id, [0.0] * DIM), doc_id


def test_planted_near_dup_ranks_first(spark, documents):
    """A doc and its lightly-edited clone must be each other's nearest
    hashed-vector neighbors."""
    clone = documents.filter(F.col("doc_id") == 3).select(
        F.lit(9_000_003).cast("bigint").alias("doc_id"),
        F.concat("text", F.lit(" tail")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    vecs = quality.hashed_doc_vectors(documents.unionByName(clone))
    q = vecs.filter(F.col("vec_id") == 9_000_003)
    top = similarity.brute_force_topk(vecs, q, k=1).collect()
    assert top[0]["neighbor_id"] == 3


def test_composes_with_vector_tier(spark, vecs):
    verdicts = similarity.semantic_dedup(vecs, threshold=0.95, n_cells=8)
    assert verdicts.count() == vecs.count()
    assert verdicts.filter(~F.col("keep")).count() < vecs.count()


def test_empty_doc_gets_zero_vector(spark, documents):
    empty = documents.limit(1).select(
        F.lit(9_000_001).cast("bigint").alias("doc_id"),
        F.lit("").alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    v = (
        quality.hashed_doc_vectors(documents.unionByName(empty))
        .filter(F.col("vec_id") == 9_000_001)
        .collect()[0]["embedding"]
    )
    assert list(v) == [0.0] * 64


def test_deterministic_under_repartition(spark, documents, vecs):
    again = quality.hashed_doc_vectors(documents.repartition(7), dim=DIM)
    assert sorted((r["vec_id"], tuple(r["embedding"])) for r in again.collect()) == sorted(
        (r["vec_id"], tuple(r["embedding"])) for r in vecs.collect()
    )
