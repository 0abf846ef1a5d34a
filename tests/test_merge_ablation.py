"""CDC merge_upsert + embedding dim-ablation recall.

Gates: merge vs an exact DuckDB MERGE twin, latest-change-wins and
delete/insert/passthrough invariants, idempotent re-application, and the
ablation report's monotonicity + full-dim-perfect-recall anchors.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from pulsar_replay_spark.operators import curation, similarity


@pytest.fixture(scope="module")
def feed(spark, documents):
    """Change feed: delete ids %11==0; upsert (rewrite) ids %13==0 at seq 1;
    a CONFLICTING later change for ids %143==0 (both 11|id and 13|id) at
    seq 2 — upsert wins over the earlier delete for exactly those keys;
    plus 10 brand-new inserts."""
    dels = documents.filter(F.col("doc_id") % 11 == 0).select(
        "doc_id",
        F.lit("delete").alias("op"),
        F.lit(1).alias("seq"),
        *[F.lit(None).cast("string").alias(c) for c in ["text", "lang", "source"]],
        F.lit(None).cast("bigint").alias("n_chars"),
    )
    ups = documents.filter(F.col("doc_id") % 13 == 0).select(
        "doc_id",
        F.lit("upsert").alias("op"),
        F.lit(1).alias("seq"),
        F.concat(F.col("text"), F.lit(" v2")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    late = documents.filter(F.col("doc_id") % 143 == 0).select(
        "doc_id",
        F.lit("upsert").alias("op"),
        F.lit(2).alias("seq"),
        F.concat(F.col("text"), F.lit(" v3")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    ins = documents.limit(10).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.lit("upsert").alias("op"),
        F.lit(1).alias("seq"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    return dels.unionByName(ups).unionByName(late).unionByName(ins).localCheckpoint(
        eager=True
    )


def test_merge_matches_duckdb(spark, documents, feed, tmp_path):
    base_p, feed_p = str(tmp_path / "base.parquet"), str(tmp_path / "feed.parquet")
    documents.write.mode("overwrite").parquet(base_p)
    feed.write.mode("overwrite").parquet(feed_p)
    got = sorted(map(tuple, curation.merge_upsert(documents, feed).collect()))
    con = duckdb.connect()
    expect = con.execute(
        f"""
        WITH latest AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY seq DESC, op DESC) AS rn
            FROM read_parquet('{feed_p}/*.parquet')
          ) WHERE rn = 1
        )
        SELECT b.* FROM read_parquet('{base_p}/*.parquet') b
        WHERE b.doc_id NOT IN (SELECT doc_id FROM latest)
        UNION ALL
        SELECT doc_id, text, lang, source, n_chars FROM latest WHERE op = 'upsert'
        """
    ).fetchall()
    assert got == sorted(tuple(r) for r in expect)


def test_merge_semantics_and_idempotence(spark, documents, feed):
    merged = curation.merge_upsert(documents, feed).localCheckpoint(eager=True)
    ids = {r["doc_id"] for r in merged.select("doc_id").collect()}
    base_ids = {r["doc_id"] for r in documents.select("doc_id").collect()}
    for i in base_ids:
        if i % 143 == 0:
            assert i in ids  # later upsert beat the seq-1 delete
        elif i % 11 == 0:
            assert i not in ids  # deleted
        else:
            assert i in ids
    assert all(i + 2_000_000 in ids for r in [0] for i in
               [r2["doc_id"] for r2 in documents.limit(10).collect()])
    texts = {r["doc_id"]: r["text"] for r in merged.collect()}
    for i in base_ids:
        if i % 143 == 0:
            assert texts[i].endswith(" v3")
        elif i % 13 == 0:
            assert texts[i].endswith(" v2")
    again = curation.merge_upsert(merged, feed)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, merged.collect()))


def test_dim_ablation_recall(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") % 100 == 0)
    rep = {
        r["dim"]: r["recall_at_k"]
        for r in similarity.dim_ablation_recall(
            embeddings, queries, dims=[8, 32, 64], k=5
        ).collect()
    }
    assert rep[64] == 1.0  # full dim reproduces the ground truth exactly
    assert rep[8] <= rep[32] + 0.05 <= 1.05  # ~monotone in dim
    assert 0.0 <= rep[8] < 1.0  # truncation must actually cost something


# --- property-based merge model check --------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_CHANGE = st.tuples(
    st.integers(0, 9),  # key
    st.sampled_from(["upsert", "delete"]),
    st.integers(0, 5),  # seq
    st.text("ab", min_size=0, max_size=3),  # payload
)


@settings(max_examples=15, deadline=None)
@given(
    base=st.dictionaries(st.integers(0, 9), st.text("ab", max_size=3), max_size=6),
    # a CDC feed's (key, seq, op) identifies a change — equal triples with
    # different payloads are out of contract (no deterministic winner exists)
    changes=st.lists(_CHANGE, max_size=12, unique_by=lambda c: (c[0], c[2], c[1])),
)
def test_merge_upsert_matches_dict_model(spark_global, base, changes):
    """merge_upsert == a driver-side replay model: per key, the (seq, op)
    max change wins ('upsert' > 'delete' lexicographically — the operator's
    documented tie-break); upserts write the dict, deletes remove."""
    spark = spark_global
    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()] or [(None, None)],
        "doc_id long, payload string",
    ).filter(F.col("doc_id").isNotNull())
    ch_df = spark.createDataFrame(
        changes or [(None, None, None, None)],
        "doc_id long, op string, seq long, payload string",
    ).filter(F.col("doc_id").isNotNull())

    got = {
        r["doc_id"]: r["payload"]
        for r in curation.merge_upsert(base_df, ch_df).collect()
    }

    model = dict(base)
    winners: dict[int, tuple] = {}
    for k, op, seq, payload in changes:
        if k not in winners or (seq, op) > winners[k][:2]:
            winners[k] = (seq, op, payload)
    for k, (seq, op, payload) in winners.items():
        if op == "delete":
            model.pop(k, None)
        else:
            model[k] = payload
    assert got == model


@pytest.fixture(scope="session")
def spark_global(spark):
    return spark
