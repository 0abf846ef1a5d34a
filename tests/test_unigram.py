"""Unigram-LM (SentencePiece-style) tokenizer trainer.

Gates: Viterbi optimality vs a brute-force all-segmentations mirror,
corpus token-count plumbing vs a pure-python recomputation, segmentation
reassembly, compression vs the character baseline, repartition
determinism, Arrow-only plan gate, and artifact round-trip.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pulsar_replay_spark.operators import artifacts, bpe, unigram


@pytest.fixture(scope="module")
def wf(spark, documents):
    return bpe.word_freqs(documents).localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def model(spark, wf):
    return unigram.unigram_train(wf, vocab_size=100, n_iters=2)


@pytest.fixture(scope="module")
def model_dict(model):
    return {r["piece"]: r["logp"] for r in model.collect()}


def _brute_force_segmentations(word):
    if not word:
        yield []
        return
    for cut in range(1, len(word) + 1):
        for rest in _brute_force_segmentations(word[cut:]):
            yield [word[:cut]] + rest


def test_viterbi_is_optimal_vs_brute_force(spark, wf, model, model_dict):
    """For every short vocab word, the served segmentation must achieve the
    max (score, -n_pieces) over ALL possible segmentations under the same
    model (unknown single chars at UNK_LOGP, multi-char unknowns invalid)."""
    short = wf.filter(F.length("word") <= 6).limit(40)
    seg = {r["word"]: r["pieces"] for r in unigram.unigram_segment_words(short, model).collect()}
    assert seg

    def score(pieces):
        s = 0.0
        for p in pieces:
            if p in model_dict:
                s += model_dict[p]
            elif len(p) == 1:
                s += unigram.UNK_LOGP
            else:
                return None
        return (s, -len(pieces))

    for word, pieces in seg.items():
        got = score(pieces)
        best = max(s for s in map(score, _brute_force_segmentations(word)) if s)
        assert got is not None
        assert abs(got[0] - best[0]) < 1e-9 and got[1] == best[1], (word, pieces)


def test_segmentation_reassembles_and_uses_inventory(spark, wf, model, model_dict):
    rows = unigram.unigram_segment_words(wf, model).collect()
    assert len(rows) == wf.count()
    for r in rows:
        assert "".join(r["pieces"]) == r["word"]
        for p in r["pieces"]:
            assert p in model_dict or len(p) == 1


def test_token_counts_match_pure_python(spark, documents, model, model_dict):
    max_len = max(len(p) for p in model_dict)
    got = {
        r["doc_id"]: r["n_pieces"]
        for r in unigram.unigram_token_counts(documents, model).collect()
    }
    seg_cache: dict[str, int] = {}
    for row in documents.select("doc_id", "text").collect():
        n = 0
        for w in row["text"].split(" "):
            if not w:
                continue
            if w not in seg_cache:
                seg_cache[w] = len(unigram._viterbi(w, model_dict, max_len))
            n += seg_cache[w]
        assert got[row["doc_id"]] == n, row["doc_id"]


def test_compression_beats_character_baseline(spark, documents, model):
    n_pieces = (
        unigram.unigram_token_counts(documents, model).agg(F.sum("n_pieces")).first()[0]
    )
    n_chars = documents.select(
        F.sum(F.length(F.regexp_replace("text", " ", ""))).alias("c")
    ).first()["c"]
    assert n_pieces < n_chars / 2  # trained pieces compress well past chars


def test_train_deterministic_under_repartition(spark, wf):
    a = sorted(map(tuple, unigram.unigram_train(wf, 60, n_iters=1).collect()))
    b = sorted(
        map(tuple, unigram.unigram_train(wf.repartition(7), 60, n_iters=1).collect())
    )
    assert [(p, round(l, 10)) for p, l in a] == [(p, round(l, 10)) for p, l in b]


def test_probs_normalize_and_size_bounded(spark, model):
    rows = model.collect()
    assert sum(math.exp(r["logp"]) for r in rows) == pytest.approx(1.0, abs=1e-9)
    assert model.filter(F.length("piece") > 1).count() <= 100


def test_token_counts_plan_is_arrow_only(spark, documents, model):
    plan = (
        unigram.unigram_token_counts(documents, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan
    assert "CartesianProduct" not in plan


def test_artifact_round_trip(spark, model, wf, tmp_path):
    path = str(tmp_path / "unigram")
    artifacts.save_unigram_model(model, path)
    loaded = artifacts.load_unigram_model(spark, path)
    assert sorted(map(tuple, loaded.collect())) == sorted(map(tuple, model.collect()))
    a = unigram.unigram_segment_words(wf.limit(50), model).collect()
    b = unigram.unigram_segment_words(wf.limit(50), loaded).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_tokenizer_report_consistent(spark, documents, wf, model):
    """The report's totals must equal the two counters' own sums per source,
    and fertility must sit in (0, chars-per-word] for both tokenizers."""
    merges = bpe.bpe_train(wf, 15)
    rep = {r["source"]: r for r in unigram.tokenizer_report(documents, merges, model).collect()}
    b = bpe.bpe_token_counts(documents, merges)
    u = unigram.unigram_token_counts(documents, model)
    per_src_b = {
        r["source"]: r["s"]
        for r in documents.select("doc_id", "source")
        .join(b, "doc_id")
        .groupBy("source")
        .agg(F.sum("n_bpe_tokens").alias("s"))
        .collect()
    }
    per_src_u = {
        r["source"]: r["s"]
        for r in documents.select("doc_id", "source")
        .join(u, "doc_id")
        .groupBy("source")
        .agg(F.sum("n_pieces").alias("s"))
        .collect()
    }
    assert rep and set(rep) == set(per_src_b)
    for src, row in rep.items():
        assert row["bpe_tokens"] == per_src_b[src]
        assert row["unigram_tokens"] == per_src_u[src]
        assert 0 < row["unigram_fertility"] <= row["unigram_chars_per_token"] * row["unigram_fertility"] + 1
        assert row["bpe_fertility"] >= 1.0  # BPE never merges across words


def test_tokenizer_report_with_wordpiece_column(spark, documents, wf, model):
    """The optional WordPiece leg: report totals must equal the counter's
    own per-source sums, and fertility must be >= 1 (greedy longest-match
    never merges across whitespace words)."""
    from pulsar_replay_spark.operators import wordpiece

    merges = bpe.bpe_train(wf, 15)
    vocab = wordpiece.wordpiece_vocab(wf, vocab_size=200).localCheckpoint(eager=True)
    rep = {
        r["source"]: r
        for r in unigram.tokenizer_report(
            documents, merges, model, wp_vocab=vocab
        ).collect()
    }
    w = wordpiece.wordpiece_token_counts(documents, vocab)
    per_src = {
        r["source"]: r["s"]
        for r in documents.select("doc_id", "source")
        .join(w, "doc_id")
        .groupBy("source")
        .agg(F.sum("n_wp_tokens").alias("s"))
        .collect()
    }
    assert rep and set(rep) == set(per_src)
    for src, row in rep.items():
        assert row["wordpiece_tokens"] == per_src[src]
        assert row["wordpiece_fertility"] >= 1.0


def test_local_trainer_bit_equals_distributed(spark, documents):
    """unigram_train_local must return the IDENTICAL (piece, logp) artifact
    as the distributed EM — same seed cut, same Viterbi E-step, same prune
    tie-breaks, same float op sequence (bit equality, not tolerance) — and
    raise past its vocab gate, where the distributed trainer remains the
    path (the bpe_train_local precedent)."""
    import pytest as _pytest

    from pulsar_replay_spark.operators import bpe

    wf = bpe.word_freqs(documents).localCheckpoint(eager=True)
    dist = unigram.unigram_train(wf, vocab_size=150, n_iters=2)
    local = unigram.unigram_train_local(wf, vocab_size=150, n_iters=2)
    d = sorted(map(tuple, dist.collect()))
    l = sorted(map(tuple, local.collect()))
    assert l == d  # exact, including every logp bit

    with _pytest.raises(ValueError, match="unigram_train"):
        unigram.unigram_train_local(wf, 50, max_vocab_rows=10)


def test_unigram_encode_docs_matches_python_assembly(spark, documents):
    """unigram_encode_docs: the shared id reassembly under Viterbi
    segmentation — python mirror per word (the module's own _viterbi over
    the collected model: the segmentation itself is gated elsewhere; this
    pins the NEW id-numbering and order-preserving assembly)."""
    from pulsar_replay_spark.operators import bpe, unigram

    docs = documents.limit(30)
    wf = bpe.word_freqs(docs).localCheckpoint(eager=True)
    model = unigram.unigram_train(wf, vocab_size=150, n_iters=1)
    logp, max_len = unigram._model_dict(model)

    encoded = {
        r.doc_id: (list(r.token_ids), r.n_tokens)
        for r in unigram.unigram_encode_docs(docs, model).collect()
    }
    rows = docs.select("doc_id", "text").collect()
    seg_cache, pieces = {}, set()
    for r in rows:
        for w in r.text.split(" "):
            if w and w not in seg_cache:
                seg_cache[w] = unigram._viterbi(w, logp, max_len)
                pieces.update(seg_cache[w])
    pid = {p: i for i, p in enumerate(sorted(pieces))}
    for r in rows:
        want = [pid[p] for w in r.text.split(" ") if w for p in seg_cache[w]]
        got_ids, got_n = encoded[r.doc_id]
        assert got_ids == want, r.doc_id
        assert got_n == len(want)
