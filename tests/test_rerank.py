"""Retrieval post-processing: MMR diversified rerank + hard-negative mining.

Gates: exact numpy-mirror equality of the whole greedy MMR selection,
lam=1 degenerates to relevance order, diversity actually bites on planted
near-duplicate candidates, no cross join in either plan, repartition
determinism, and hard-negative exclusion equals a brute-force mirror.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pulsar_replay_spark.operators import similarity


@pytest.fixture(scope="module")
def emb_np(embeddings):
    rows = embeddings.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, mat


@pytest.fixture(scope="module")
def pool(spark, embeddings):
    """A candidate pool from the exact path (pool size 15 per query) —
    the shared input to both post-processing operators."""
    queries = embeddings.filter(F.col("vec_id") % 100 == 0)
    return (
        similarity.brute_force_topk(embeddings, queries, k=15)
        .localCheckpoint(eager=True),
        queries,
    )


def _mmr_numpy(ids, mat, pool_rows, k, lam):
    """Pure-python mirror of the greedy MMR selection, per query."""
    by_q: dict[int, list] = {}
    for r in pool_rows:
        by_q.setdefault(r["q_id"], []).append((r["neighbor_id"], r["sim"]))
    expect = {}
    for q_id, cands in by_q.items():
        cands = sorted(cands)  # neighbor_id asc, matching the operator
        cid = np.array([c for c, _ in cands])
        rel = np.array([s for _, s in cands], dtype=np.float64)
        vecs = np.stack([mat[int(np.where(ids == c)[0][0])] for c, _ in cands])
        unit = vecs / np.linalg.norm(vecs, axis=1)[:, None]
        pair = unit @ unit.T
        selected, remaining = [], list(range(len(cands)))
        for _ in range(min(k, len(cands))):
            red = (
                pair[np.ix_(remaining, selected)].max(axis=1)
                if selected
                else np.zeros(len(remaining))
            )
            mmr = np.round(lam * rel[remaining] - (1 - lam) * red, 6)
            best = remaining[int(np.argmax(mmr))]
            selected.append(best)
            remaining.remove(best)
        expect[q_id] = [int(cid[i]) for i in selected]
    return expect


def test_mmr_matches_numpy_mirror(spark, embeddings, emb_np, pool):
    ids, mat = emb_np
    topk, queries = pool
    got = similarity.mmr_rerank(embeddings, topk, k=5, lam=0.7).collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r["q_id"], []).append((r["mmr_rank"], r["neighbor_id"]))
    expect = _mmr_numpy(ids, mat, topk.collect(), k=5, lam=0.7)
    assert set(by_q) == set(expect)
    for q_id, lst in by_q.items():
        assert [n for _, n in sorted(lst)] == expect[q_id]


def test_mmr_lam_one_is_relevance_order(spark, embeddings, pool):
    """lam=1 removes the redundancy term: MMR must equal the pool's own
    relevance order (sim desc, neighbor_id tie-break)."""
    topk, queries = pool
    got = similarity.mmr_rerank(embeddings, topk, k=5, lam=1.0).collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r["q_id"], []).append((r["mmr_rank"], r["neighbor_id"]))
    pool_rows = topk.collect()
    for q_id, lst in by_q.items():
        cands = sorted(
            [(r["neighbor_id"], r["sim"]) for r in pool_rows if r["q_id"] == q_id]
        )
        order = sorted(cands, key=lambda c: (-c[1], c[0]))[:5]
        assert [n for _, n in sorted(lst)] == [c for c, _ in order]


def test_mmr_diversity_bites_on_planted_duplicates(spark):
    """Anchor q; candidates a ~ b (near-identical, both highly relevant),
    c orthogonal-ish but still relevant. Relevance order is a, b, c; MMR
    with lam=0.5 must pick a then SKIP the duplicate b in favor of c."""
    d = 8
    a = [1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    b = [1.0, 0.999, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    c = [1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    q = [1.0, 0.5, 0.2, 0.0, 0.0, 0.0, 0.0, 0.0]
    emb = spark.createDataFrame(
        [(0, q), (1, a), (2, b), (3, c)], "vec_id long, embedding array<float>"
    )
    queries = emb.filter(F.col("vec_id") == 0)
    topk = similarity.brute_force_topk(emb, queries, k=3)
    out = similarity.mmr_rerank(emb, topk, k=2, lam=0.5).collect()
    picked = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["mmr_rank"])]
    assert picked[0] == 1  # most relevant first, always
    assert picked[1] == 3  # duplicate (2) skipped for the diverse candidate


def test_mmr_plan_no_cartesian_and_deterministic(spark, embeddings, pool):
    topk, queries = pool
    out = similarity.mmr_rerank(embeddings, topk, k=5, lam=0.7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, similarity.mmr_rerank(
        embeddings.repartition(7), topk.repartition(5), k=5, lam=0.7
    ).collect()))
    assert a == b


def test_hard_negatives_mirror_and_pair_exclusion(spark, pool):
    topk, _ = pool
    rows = topk.collect()
    thresh = 0.9

    got = {
        (r["q_id"], r["neg_rank"]): r["neighbor_id"]
        for r in similarity.hard_negatives(topk, k=5, dup_threshold=thresh).collect()
    }
    by_q: dict[int, list] = {}
    for r in rows:
        if r["sim"] < thresh:
            by_q.setdefault(r["q_id"], []).append((-r["sim"], r["neighbor_id"]))
    for q_id, cands in by_q.items():
        for rank, (_, n_id) in enumerate(sorted(cands)[:5], start=1):
            assert got[(q_id, rank)] == n_id

    # pair rule: ban one specific surviving (q, n) pair via dup_pairs in the
    # REVERSED orientation — it must disappear and ranks must close up.
    q0, n0 = next(iter(got.keys()))[0], got[next(iter(got.keys()))]
    banned = spark.createDataFrame([(n0, q0)], "vec_a long, vec_b long")
    got2 = similarity.hard_negatives(
        topk, k=5, dup_threshold=thresh, dup_pairs=banned
    ).collect()
    assert (q0, n0) not in {(r["q_id"], r["neighbor_id"]) for r in got2}
    ranks = sorted(r["neg_rank"] for r in got2 if r["q_id"] == q0)
    assert ranks == list(range(1, len(ranks) + 1))
