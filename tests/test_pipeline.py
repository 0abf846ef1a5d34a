"""End-to-end curation funnel gates: the composition must satisfy the
cross-stage invariants no single-operator gate can see — the funnel only
shrinks, no near-dup loser or contaminated doc survives its stage, the
budget holds per source, the split partitions the selection, and packing
conserves exactly the train split's tokens."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pulsar_replay_spark import pipeline
from pulsar_replay_spark.operators import dedup

BUDGET = 15_000


@pytest.fixture(scope="module")
def result(documents):
    benchmark = documents.filter(F.col("doc_id") % 40 == 0).select(
        (F.col("doc_id") + 500_000).alias("doc_id"), "text"
    )
    target = documents.filter(F.col("lang") == "es")
    return (
        pipeline.curate_corpus(
            documents, benchmark=benchmark, target=target, budget_tokens=BUDGET
        ),
        documents,
        benchmark,
    )


def test_funnel_is_monotone_and_complete(result):
    res, docs, _ = result
    rows = sorted(
        ((r.stage_idx, r.stage, r.n_docs) for r in res["report"].collect())
    )
    names = [r[1] for r in rows]
    assert names == [
        "input",
        "deduped",
        "decontaminated",
        "filtered",
        "selected",
        "train",
    ]
    counts = [r[2] for r in rows]
    assert counts[0] == docs.count()
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert counts[-1] > 0  # the funnel must not starve


def test_no_near_dup_loser_survives(result):
    res, docs, _ = result
    cc = dedup.connected_components(dedup.minhash_candidate_pairs(docs))
    losers = {
        r.doc_id for r in cc.filter(F.col("doc_id") != F.col("cluster_id")).collect()
    }
    for frame in ("deduped", "selected"):
        ids = {r.doc_id for r in res[frame].select("doc_id").collect()}
        assert not (ids & losers), frame


def test_no_contaminated_doc_survives(result):
    res, _, benchmark = result
    flagged = {
        r.doc_id
        for r in dedup.benchmark_overlap(res["deduped"], benchmark)
        .filter("contaminated")
        .collect()
    }
    ids = {r.doc_id for r in res["decontaminated"].select("doc_id").collect()}
    assert not (ids & flagged)
    assert flagged  # the planted benchmark must actually flag something


def test_budget_respected_per_source(result):
    res, _, _ = result
    per_source = (
        res["selected"].groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
    )
    assert per_source and all(r.t <= BUDGET for r in per_source)


def test_split_partitions_selection(result):
    res, _, _ = result
    sel = {r.doc_id for r in res["selected"].select("doc_id").collect()}
    split_rows = res["split"].select("doc_id", "split").collect()
    assert {r.doc_id for r in split_rows} == sel
    assert len(split_rows) == len(sel)
    assert {r.split for r in split_rows} <= {"train", "val", "test"}


def test_packing_conserves_train_tokens(result):
    res, _, _ = result
    train = {
        r.doc_id
        for r in res["split"].filter("split = 'train'").select("doc_id").collect()
    }
    packed = res["packed"].collect()
    assert {r.doc_id for r in packed} == train
    expect_tokens = sum(
        r.n_tokens
        for r in res["selected"].collect()
        if r.doc_id in train
    )
    assert sum(r.end_tok - r.start_tok for r in packed) == expect_tokens


def test_funnel_lm_tail_filter(spark, documents):
    from pulsar_replay_spark.operators import quality

    out = pipeline.curate_corpus(documents, drop_lm_tail=True, budget_tokens=10_000)
    report = {r["stage"]: r["n_docs"] for r in out["report"].collect()}
    assert "lm_filtered" in report
    assert report["lm_filtered"] <= report["filtered"]
    assert report["lm_filtered"] < report["filtered"]  # the tier filter bites
    # no surviving doc may sit in its language's tail tier OF THE FILTERED
    # set the LM was trained on
    filtered_before = out["decontaminated"].join(
        quality.drop_bottom_quantile(
            out["decontaminated"].select(
                "doc_id", "source",
                __import__("pulsar_replay_spark.operators.curation",
                           fromlist=["default_quality_score"])
                .default_quality_score(F.col("text")).alias("score"),
            ),
            0.25,
        ).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    buckets = {
        r["doc_id"]: r["bucket"]
        for r in quality.ccnet_buckets(filtered_before).collect()
    }
    survivors = {r["doc_id"] for r in out["filtered"].select("doc_id").collect()}
    assert survivors and all(buckets[i] != "tail" for i in survivors)


def test_funnel_leakage_check_is_empty_after_dedup(spark, documents):
    out = pipeline.curate_corpus(documents, check_leakage=True, budget_tokens=10_000)
    leaks = out["leakage"]
    assert set(leaks.columns) == {"doc_a", "split_a", "doc_b", "split_b"}
    # the funnel deduped before splitting — no near-dup pair should cross
    assert leaks.count() == 0


def test_funnel_semantic_stage(spark, documents):
    """semantic=True adds the hashed-vector SemDeDup stage: the funnel
    reports it, planted paraphrase-heavy clones get collapsed (only one of
    each identical-text pair survives), and every survivor is a keep
    verdict of the stage's own dedup run."""
    clones = documents.limit(8).select(
        (F.col("doc_id") + 4_000_000).alias("doc_id"),
        "text",  # identical text == cosine 1.0 in hashed space
        "lang",
        "source",
        "n_chars",
    )
    corpus = documents.unionByName(clones)
    out = pipeline.curate_corpus(corpus, semantic=True, budget_tokens=10_000)
    report = {r["stage"]: r["n_docs"] for r in out["report"].collect()}
    assert "semantic_deduped" in report
    assert report["semantic_deduped"] <= report["filtered"]
    ids = {r["doc_id"] for r in out["filtered"].select("doc_id").collect()}
    for i in range(8):
        orig = documents.limit(8).collect()[i]["doc_id"]
        # identical-text pair: at most one of (orig, clone) survives
        assert not ({orig, orig + 4_000_000} <= ids)
