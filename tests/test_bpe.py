"""BPE trainer gates: the distributed trainer must equal a pure-Python
reference implementation of Sennrich-style BPE (exact merge-list equality,
on the paper's toy corpus AND the documents fixture); segmentation must
reproduce training's final symbol state and round-trip to the word;
corpus token counts must equal the per-word sums; training is
deterministic under repartition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pulsar_replay_spark.operators import bpe

N_MERGES = 15


# --- pure-Python reference (Sennrich et al. 2016, algorithm 1) -------------


def ref_train(freqs: dict[str, int], n_merges: int, min_pair_freq: int = 2):
    vocab = {w: list(w) + [bpe.EOW] for w in freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freqs[w]
        if not counts:
            break
        best_cnt = max(counts.values())
        if best_cnt < min_pair_freq:
            break
        pair = min(p for p, c in counts.items() if c == best_cnt)
        merges.append(pair)
        vocab = {w: ref_merge(syms, pair) for w, syms in vocab.items()}
    return merges, vocab


def ref_merge(syms: list[str], pair: tuple[str, str]) -> list[str]:
    a, b = pair
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def ref_segment(word: str, merges: list[tuple[str, str]]) -> list[str]:
    syms = list(word) + [bpe.EOW]
    for pair in merges:
        syms = ref_merge(syms, pair)
    return syms


# --- gates -----------------------------------------------------------------


@pytest.fixture(scope="module")
def fixture_freqs(documents):
    return {
        r.word: r.freq for r in bpe.word_freqs(documents).collect()
    }


@pytest.fixture(scope="module")
def merges(spark, documents):
    return bpe.bpe_train(bpe.word_freqs(documents), N_MERGES)


def test_trainer_matches_reference_on_paper_toy(spark):
    # the corpus from the paper's running example
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    wf = spark.createDataFrame(list(freqs.items()), "word string, freq long")
    got = bpe.bpe_train(wf, 10)
    expect, _ = ref_train(freqs, 10)
    assert got == expect
    # the famous first merges: 'es' (9), then 'est' (9)
    assert got[0] == ("e", "s") and got[1] == ("es", "t")


def test_trainer_matches_reference_on_fixture(merges, fixture_freqs):
    expect, _ = ref_train(fixture_freqs, N_MERGES)
    assert merges == expect
    assert len(merges) == N_MERGES  # fixture vocab is rich enough to go deep


def test_segmentation_reproduces_training_state(documents, merges, fixture_freqs):
    seg = {
        r.word: list(r.bpe)
        for r in bpe.bpe_segment_words(
            bpe.word_freqs(documents), merges
        ).collect()
    }
    assert set(seg) == set(fixture_freqs)
    for w, got in seg.items():
        assert got == ref_segment(w, merges), w
        # round-trip: symbols concatenate back to the word + marker
        assert "".join(got) == w + bpe.EOW


def test_token_counts_match_per_word_sums(documents, merges):
    got = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe.bpe_token_counts(documents, merges).collect()
    }
    docs = documents.select("doc_id", "text").collect()
    for r in docs:
        words = [w for w in r.text.split(" ") if w != ""]
        expect = sum(len(ref_segment(w, merges)) for w in words)
        assert got[r.doc_id] == expect, r.doc_id
    assert len(got) == len(docs)


def test_deterministic_under_repartition(documents, merges):
    again = bpe.bpe_train(bpe.word_freqs(documents.repartition(7)), N_MERGES)
    assert again == merges


def test_local_trainer_matches_reference_and_distributed(
    spark, documents, merges, fixture_freqs
):
    """bpe_train_local (driver-side delta trainer) must produce the IDENTICAL
    merge list as both the pure-Python Sennrich reference and the
    distributed trainer — on the paper toy, the fixture, and a deep run
    the distributed path would pay one job per merge for."""
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    wf = spark.createDataFrame(list(freqs.items()), "word string, freq long")
    assert bpe.bpe_train_local(wf, 10) == ref_train(freqs, 10)[0]

    wf_fix = bpe.word_freqs(documents)
    assert bpe.bpe_train_local(wf_fix, N_MERGES) == merges

    deep = bpe.bpe_train_local(wf_fix, 300)
    expect, _ = ref_train(fixture_freqs, 300)
    assert deep == expect

    # early stop: min_pair_freq above every count -> empty merge list
    assert bpe.bpe_train_local(wf, 10, min_pair_freq=10**9) == []


def test_speculative_batching_equals_serial_on_conflict_heavy_vocabs(spark):
    """r13: bpe_train accepts a provably-serial-equal PREFIX of the round's
    top candidates (speculative multi-merge). Tiny-alphabet randomized
    vocabs make every hazard common — symbol conflicts, window-floor ties,
    created-pair preemption, merges whose concatenation already exists as
    a symbol ('aa' + 'a a' words) — and the batched list must equal both
    the forced-serial path (batch_candidates=1) and the local trainer on
    every draw."""
    import random

    rnd = random.Random(1234)
    for trial in range(6):
        alpha = "ab" if trial % 2 == 0 else "abc"
        vocab: dict[str, int] = {}
        for _ in range(rnd.randint(4, 14)):
            w = "".join(rnd.choice(alpha) for _ in range(rnd.randint(1, 7)))
            vocab[w] = vocab.get(w, 0) + rnd.randint(1, 9)
        wf = spark.createDataFrame(
            sorted(vocab.items()), "word string, freq long"
        ).localCheckpoint(eager=True)
        mpf = 1 if trial % 2 == 0 else 2  # mpf=1 maximizes tie hazards
        batched = bpe.bpe_train(wf, 12, min_pair_freq=mpf)
        serial = bpe.bpe_train(wf, 12, min_pair_freq=mpf, batch_candidates=1)
        local = bpe.bpe_train_local(wf, 12, min_pair_freq=mpf)
        assert batched == serial == local, (trial, mpf, sorted(vocab.items()))


def test_local_trainer_vocab_gate(spark, documents):
    import pytest as _pytest

    wf = bpe.word_freqs(documents)
    with _pytest.raises(ValueError, match="max_vocab_rows"):
        bpe.bpe_train_local(wf, 5, max_vocab_rows=10)


def test_encode_docs_matches_reference_segmentation(spark, documents, merges):
    """bpe_encode_docs: per-doc token-id sequences rebuilt independently —
    ref_segment every word in python, number pieces lexicographically, and
    the flattened id sequence must match EXACTLY (order included); n_tokens
    agrees with bpe_token_counts; empty/whitespace docs encode empty."""
    docs = documents.limit(40)
    encoded = {
        r.doc_id: (list(r.token_ids), r.n_tokens)
        for r in bpe.bpe_encode_docs(docs, merges).collect()
    }

    rows = docs.select("doc_id", "text").collect()
    pieces = set()
    seg_cache: dict[str, list[str]] = {}
    for r in rows:
        for w in r.text.split(" "):
            if w and w not in seg_cache:
                seg_cache[w] = ref_segment(w, merges)
                pieces.update(seg_cache[w])
    pid = {p: i for i, p in enumerate(sorted(pieces))}
    for r in rows:
        want = [pid[p] for w in r.text.split(" ") if w for p in seg_cache[w]]
        got_ids, got_n = encoded[r.doc_id]
        assert got_ids == want, r.doc_id
        assert got_n == len(want)

    counts = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe.bpe_token_counts(docs, merges).collect()
    }
    assert all(encoded[d][1] == counts[d] for d in encoded)

    empty = spark.createDataFrame([(1, ""), (2, "  ")], "doc_id long, text string")
    enc = {r.doc_id: list(r.token_ids) for r in bpe.bpe_encode_docs(empty, merges).collect()}
    assert enc == {1: [], 2: []}


def test_piece_ids_are_dense_and_stable(spark, documents, merges):
    """bpe_piece_ids: a bijection onto 0..n-1 in lexicographic piece order,
    identical under repartitioning, and reusable as the frozen table for
    encoding a NEW batch (ids stay stable across ingests)."""
    docs = documents.limit(40)
    tbl = bpe.bpe_piece_ids(docs, merges)
    rows = sorted((r.piece, r.piece_id) for r in tbl.collect())
    assert [i for _, i in rows] == list(range(len(rows)))
    assert [p for p, _ in rows] == sorted(p for p, _ in rows)
    again = sorted(
        (r.piece, r.piece_id)
        for r in bpe.bpe_piece_ids(docs.repartition(7), merges).collect()
    )
    assert again == rows

    # frozen-table encoding of a sub-batch agrees with whole-corpus encoding
    sub = docs.filter("doc_id % 2 = 0")
    with_frozen = {
        r.doc_id: list(r.token_ids)
        for r in bpe.bpe_encode_docs(sub, merges, piece_ids=tbl).collect()
    }
    whole = {
        r.doc_id: list(r.token_ids)
        for r in bpe.bpe_encode_docs(docs, merges, piece_ids=tbl).collect()
    }
    assert all(with_frozen[d] == whole[d] for d in with_frozen)
