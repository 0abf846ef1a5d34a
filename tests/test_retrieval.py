"""BM25 lexical retrieval (operators/retrieval.py): exact equality against
an independent pure-python BM25 mirror on a planted corpus, textbook ranking
behavior, the df-cap skew lever, lexical decontamination semantics, and the
no-cartesian plan gate. The DuckDB oracle gate lives in test_oracle_parity
(test_bm25_matches_oracle) + parity --extras (x_bm25)."""

from __future__ import annotations

import math

import pytest

from pulsar_replay_spark.operators import retrieval

K1, B, SCALE = retrieval.K1, retrieval.B, retrieval.SCALE


def _naive_bm25(doc_rows, query_rows, k1=K1, b=B, max_df_ratio=None):
    """Independent mirror: dict-and-loop BM25 in micro-units. Returns
    {(query_id, doc_id): score_u} over docs sharing ≥1 query term."""
    toks = {d: [t for t in text.split(" ") if t] for d, text in doc_rows}
    n_docs = len(doc_rows)
    avgdl = sum(len(ts) for ts in toks.values()) / n_docs
    df: dict[str, int] = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out: dict[tuple[int, int], int] = {}
    for qid, qtext in query_rows:
        qterms = {t for t in qtext.split(" ") if t}
        for d, ts in toks.items():
            score_u = 0
            for t in qterms & set(ts):
                if max_df_ratio is not None and df[t] > n_docs * max_df_ratio:
                    continue
                tf, dl = ts.count(t), len(ts)
                idf = math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
                tf_norm = (tf * (k1 + 1.0)) / (
                    tf + k1 * ((1.0 - b) + b * dl / avgdl)
                )
                score_u += int(round(idf * tf_norm * SCALE))
            if score_u or qterms & set(ts):
                out[(qid, d)] = score_u
    return out


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog chased the cat across the yard"),
    (3, "quantum entanglement links distant particles"),
    (4, "the the the the the the the the"),
    (5, "a cat a mat a cat"),
    (6, "dogs and cats living together"),
]
QUERIES = [(100, "cat mat"), (200, "quantum particles"), (300, "the dog")]


@pytest.fixture(scope="module")
def planted(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(QUERIES, "query_id long, query string")
    return docs, queries


def test_bm25_scores_match_naive_python(spark, planted):
    docs, queries = planted
    got = {
        (r.query_id, r.doc_id): r.score_u
        for r in retrieval.bm25_scores(docs, queries).collect()
    }
    want = _naive_bm25(DOCS, QUERIES)
    assert got == want


def test_bm25_topk_ranking_is_textbook(spark, planted):
    docs, queries = planted
    top = retrieval.bm25_topk(docs, queries, k=3).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r.query_id, []).append((r.rk, r.doc_id, r.score))
    # "cat mat": doc 5 (cat x2 + mat, short) beats doc 1 (cat + mat) beats
    # doc 2 (cat only)
    assert [d for _, d, _ in sorted(by_q[100])] == [5, 1, 2]
    # the rare-vocabulary query hits ONLY its doc
    assert [d for _, d, _ in sorted(by_q[200])] == [3]
    # scores strictly descend with rank (ties impossible here)
    for q in by_q:
        scores = [s for _, _, s in sorted(by_q[q])]
        assert scores == sorted(scores, reverse=True)


def test_bm25_df_cap_drops_stopword_postings(spark, planted):
    docs, queries = planted
    # 'the' appears in 3/6 docs; cap at 0.4 kills it, so the all-'the' doc 4
    # leaves query 300's candidate set entirely while 'dog' hits survive
    got = {
        (r.query_id, r.doc_id)
        for r in retrieval.bm25_scores(docs, queries, max_df_ratio=0.4)
        .filter("score_u > 0")
        .collect()
    }
    assert (300, 4) not in got
    assert (300, 2) in got
    want = {
        k for k, v in _naive_bm25(DOCS, QUERIES, max_df_ratio=0.4).items() if v > 0
    }
    assert got == want


def test_lexical_decontaminate_flags_shared_rare_vocab(spark):
    train = spark.createDataFrame(
        [
            (1, "the mitochondria is the powerhouse of the cell"),
            (2, "photosynthesis converts sunlight into chemical energy"),
            (3, "completely unrelated text about sailing boats"),
        ],
        "doc_id long, text string",
    )
    eval_docs = spark.createDataFrame(
        # paraphrase sharing rare vocabulary with train doc 1, no exact 5-gram
        [(900, "which organelle is called powerhouse of a cell mitochondria")],
        "doc_id long, text string",
    )
    flagged = retrieval.lexical_decontaminate(
        train, eval_docs, k=1, min_score=0.1
    ).collect()
    assert [(r.doc_id, r.eval_id) for r in flagged] == [(1, 900)]


def test_bm25_plan_has_no_cartesian_and_broadcasts_query_side(spark, planted):
    docs, queries = planted
    plan = retrieval.bm25_topk(docs, queries, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the 1-row stats frame joins as BroadcastNestedLoopJoin (no key — the
    # engine-wide stats-crossJoin pattern); any OTHER nested-loop join would
    # be a regression, so pin the count to exactly that one
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "BroadcastHashJoin" in plan


def _naive_rrf(rankings, k=10, c=60):
    """Independent RRF mirror in micro-units."""
    acc: dict[tuple[int, int], int] = {}
    for ranking in rankings:
        for qid, did, rk in ranking:
            acc[(qid, did)] = acc.get((qid, did), 0) + int(round(SCALE / (c + rk)))
    out = {}
    for (qid, did), s in acc.items():
        out.setdefault(qid, []).append((-s, did))
    fused = []
    for qid, lst in out.items():
        for i, (neg_s, did) in enumerate(sorted(lst)[:k], start=1):
            # mirror the operator's display scaling: micro-unit sum → /1e6,
            # rounded to 4 (the RANKING was already decided on exact ints)
            fused.append((qid, did, round(-neg_s / SCALE, 4), i))
    return sorted(fused)


def test_rrf_fuse_matches_naive_python(spark):
    sparse = [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1), (2, 21, 2)]
    dense = [(1, 11, 1), (1, 13, 2), (1, 10, 3), (2, 22, 1), (2, 20, 2)]
    frames = [
        spark.createDataFrame(rows, "query_id long, doc_id long, rk int")
        for rows in (sparse, dense)
    ]
    got = sorted(
        (r.query_id, r.doc_id, round(r.score, 4), r.rk)
        for r in retrieval.rrf_fuse(frames, k=3).collect()
    )
    assert got == _naive_rrf([sparse, dense], k=3)
    # doc 11 (rk2 + rk1) must beat doc 10 (rk1 + rk3): fusion rewards
    # agreement across lists, not one strong list
    by_rank = {rk: d for q, d, s, rk in got if q == 1}
    assert by_rank[1] == 11 and by_rank[2] == 10


def test_rrf_fuse_single_list_preserves_order_and_validates(spark):
    only = spark.createDataFrame(
        [(1, 5, 1), (1, 6, 2)], "query_id long, doc_id long, rk int"
    )
    got = {r.doc_id: r.rk for r in retrieval.rrf_fuse([only], k=10).collect()}
    assert got == {5: 1, 6: 2}
    with pytest.raises(ValueError):
        retrieval.rrf_fuse([])


def test_hybrid_bm25_plus_dense_shape(spark, planted):
    """End-to-end hybrid: BM25 hits fused with a (stub) dense ranking over
    the same ids — the operator the module exists to feed."""
    docs, queries = planted
    sparse = retrieval.bm25_topk(docs, queries, k=3)
    dense = spark.createDataFrame(
        [(100, 6, 1), (100, 5, 2), (200, 3, 1), (300, 2, 1)],
        "query_id long, doc_id long, rk int",
    )
    fused = retrieval.rrf_fuse([sparse, dense], k=3).collect()
    by_q = {}
    for r in fused:
        by_q.setdefault(r.query_id, []).append((r.rk, r.doc_id))
    # doc 5: BM25 rk1 + dense rk2 — beats doc 6 (dense rk1 only) and
    # doc 1 (BM25 rk2 only)
    assert sorted(by_q[100])[0] == (1, 5)
    # rare-vocab query: doc 3 tops both lists, stays rk1
    assert sorted(by_q[200])[0] == (1, 3)


def test_bm25_shuffle_join_path_equals_broadcast_path(spark, planted):
    """broadcast_queries=False (the huge-eval-suite escape hatch) must
    produce the identical micro-unit scores — the flag changes join
    strategy, never semantics."""
    docs, queries = planted
    bc = {
        (r.query_id, r.doc_id): r.score_u
        for r in retrieval.bm25_scores(docs, queries).collect()
    }
    sh = {
        (r.query_id, r.doc_id): r.score_u
        for r in retrieval.bm25_scores(
            docs, queries, broadcast_queries=False
        ).collect()
    }
    assert bc == sh and bc


def test_anchor_retrieval_pairs_mines_triplets(spark):
    """Anchor triplet mining: the anchor's positive is the best same-host
    BM25 hit, negatives are lexically-similar other-host hits, anchors
    whose target host has no qualifying hit yield nothing, and the same
    anchor text toward two hosts makes two queries with two positives."""
    docs = spark.createDataFrame(
        [
            (1, "solar panel installation guide for homes", "https://energy.example/guide"),
            (2, "solar panel pricing and cost comparison", "https://energy.example/prices"),
            (3, "solar panel installation tips and tricks blog", "https://blogspam.example/p1"),
            (4, "fishing rod maintenance manual", "https://fish.example/rods"),
            (5, "panel installation for aquarium solar lights", "https://aquarium.example/diy"),
        ],
        "doc_id long, text string, source string",
    )
    anchors = spark.createDataFrame(
        [
            ("ref.example", "energy.example", "solar panel installation guide"),
            ("ref.example", "aquarium.example", "solar panel installation guide"),
            # target host absent from the corpus: no triplet
            ("ref.example", "nowhere.example", "solar panel installation guide"),
            # duplicate anchor rows collapse to one query
            ("other.example", "energy.example", "solar panel installation guide"),
        ],
        "src_host string, dst_host string, anchor string",
    )
    rows = retrieval.anchor_retrieval_pairs(
        docs, anchors, k=5, n_negatives=2, min_score=0.1
    ).collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r.dst_host, []).append(r)
    assert set(by_host) == {"energy.example", "aquarium.example"}
    # energy's positive is doc 1 (best same-host lexical match), negatives
    # are other-host docs, ranked, never the positive's host
    e = sorted(by_host["energy.example"], key=lambda r: r.neg_rank)
    assert all(r.pos_doc_id == 1 for r in e)
    assert [r.neg_rank for r in e] == [1, 2]
    assert {r.neg_doc_id for r in e}.isdisjoint({1, 2})
    # same anchor text toward aquarium.example gets ITS host's positive
    a = by_host["aquarium.example"]
    assert all(r.pos_doc_id == 5 for r in a)
    # two distinct query_ids for the two hosts
    assert len({r.query_id for r in rows}) == 2
