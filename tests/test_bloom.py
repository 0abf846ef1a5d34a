"""Bloom-filter incremental-dedup gates.

The contract under test: no false negatives ever (every true duplicate is
caught), measured false-positive rate within the configured bound, exact
equality with the plain anti-join when confirm=True, and a zero-Exchange
probe plan (the whole point of the structure is that the new batch never
joins the history).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from pulsar_replay_spark.operators import bloom


def _docs(spark, keys):
    return spark.createDataFrame(
        [(i, k) for i, k in enumerate(keys)], "doc_id int, content_key string"
    )


@pytest.fixture(scope="module")
def corpus(spark):
    history = _docs(spark, [f"hist-{i}" for i in range(2000)])
    # 300 new docs: 100 true dups of history, 200 genuinely new.
    new = spark.createDataFrame(
        [(10_000 + i, f"hist-{i * 20}") for i in range(100)]
        + [(20_000 + i, f"fresh-{i}") for i in range(200)],
        "doc_id int, content_key string",
    )
    return history, new


def test_no_false_negatives_and_fpp_bound(spark, corpus):
    history, new = corpus
    n_bits, n_hashes = bloom.bloom_params(2000, fpp=0.01)
    bitmap = bloom.bloom_build(history, "content_key", n_bits, n_hashes)
    probed = bloom.bloom_might_contain(new, "content_key", bitmap, n_hashes)
    hits = {r["doc_id"] for r in probed.filter("might_contain").collect()}
    # Every true dup hits (Bloom guarantees no false negatives) …
    assert set(range(10_000, 10_100)) <= hits
    # … and spurious hits among the 200 clean docs stay near the 1 % target
    # (generous 5× slack: 200 trials is a small sample).
    false_pos = len(hits - set(range(10_000, 10_100)))
    assert false_pos <= 10, f"fpp blew the bound: {false_pos}/200"


def test_confirm_mode_equals_exact_anti_join(spark, corpus):
    history, new = corpus
    got = bloom.bloom_dedup_new_batch(new, history, fpp=0.05, confirm=True)
    want = new.join(history.select("content_key"), on="content_key", how="left_anti")
    assert {r["doc_id"] for r in got.collect()} == {r["doc_id"] for r in want.collect()}


def test_pure_bloom_mode_is_clean_subset(spark, corpus):
    history, new = corpus
    got = {
        r["doc_id"]
        for r in bloom.bloom_dedup_new_batch(new, history, fpp=0.01, confirm=False).collect()
    }
    exact = {
        r["doc_id"]
        for r in new.join(
            history.select("content_key"), on="content_key", how="left_anti"
        ).collect()
    }
    # Never keeps a true duplicate; may over-drop up to ~fpp of the clean set.
    assert got <= exact
    assert len(got) >= len(exact) - 10


def test_positions_match_reference_double_hashing():
    key, n_bits, k = "hist-42", 1 << 16, 7
    d = hashlib.md5(key.encode()).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1
    want = [(h1 + i * h2) % n_bits for i in range(k)]
    assert list(bloom._positions(key, n_bits, k)) == want


def test_probe_plan_has_no_exchange(spark, corpus):
    history, new = corpus
    n_bits, n_hashes = bloom.bloom_params(2000, fpp=0.01)
    bitmap = bloom.bloom_build(history, "content_key", n_bits, n_hashes)
    probed = bloom.bloom_might_contain(new, "content_key", bitmap, n_hashes).filter(
        ~F.col("might_contain")
    )
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:3000]


def test_build_is_deterministic_under_repartitioning(spark, corpus):
    history, _ = corpus
    n_bits, n_hashes = bloom.bloom_params(2000, fpp=0.01)
    a = bloom.bloom_build(history, "content_key", n_bits, n_hashes)
    b = bloom.bloom_build(history.repartition(13), "content_key", n_bits, n_hashes)
    assert a == b
