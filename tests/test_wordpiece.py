"""WordPiece gates: vocab construction vs a pure-Python mirror (exact),
greedy longest-match segmentation vs an independent reference scan, total
coverage (segmentation never fails), and corpus token counts vs a
driver-side recount — the test discipline of the BPE/unigram siblings."""

from __future__ import annotations

import pytest
from collections import Counter

from pyspark.sql import functions as F

from pulsar_replay_spark.operators import bpe, wordpiece
from tests.conftest import SF_SMOKE


def _py_vocab(word_freqs, vocab_size, max_len=8):
    counts = Counter()
    for word, freq in word_freqs:
        for i in range(len(word)):
            for j in range(i + 1, min(len(word), i + max_len) + 1):
                piece = word[i:j] if i == 0 else "##" + word[i:j]
                counts[piece] += freq
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    vocab = dict(top)
    for word, _ in word_freqs:
        for c in word:
            for p in (c, "##" + c):
                vocab.setdefault(p, counts.get(p, 0))
    return vocab


def _py_segment(word, vset, max_len=8):
    out, pos = [], 0
    while pos < len(word):
        end = min(len(word), pos + max_len)
        while end > pos:
            piece = word[pos:end] if pos == 0 else "##" + word[pos:end]
            if piece in vset:
                out.append(piece)
                break
            end -= 1
        pos = max(end, pos + 1)
    return out


def test_wordpiece_vocab_matches_python_mirror(spark, documents):
    wf = bpe.word_freqs(documents)
    pairs = [(r["word"], r["freq"]) for r in wf.collect()]
    expect = _py_vocab(pairs, vocab_size=200)
    got = {
        r["piece"]: r["cnt"]
        for r in wordpiece.wordpiece_vocab(wf, vocab_size=200).collect()
    }
    assert got == expect


def test_wordpiece_segmentation_greedy_and_total(spark, documents):
    wf = bpe.word_freqs(documents).localCheckpoint(eager=True)
    vocab = wordpiece.wordpiece_vocab(wf, vocab_size=200).localCheckpoint(eager=True)
    vset = {r["piece"] for r in vocab.select("piece").collect()}
    seg = wordpiece.wordpiece_segment_words(wf, vocab).collect()
    assert len(seg) == wf.count()  # total: every word segments
    for r in seg:
        word, pieces = r["word"], r["pieces"]
        assert pieces == _py_segment(word, vset)
        # reassembly: pieces concatenate back to the word exactly
        assert "".join(p.removeprefix("##") for p in pieces) == word
        assert all(
            (i == 0) != p.startswith("##") or (i > 0 and p.startswith("##"))
            for i, p in enumerate(pieces)
        )


def test_wordpiece_token_counts_match_recount(spark, documents):
    docs = documents.limit(50).localCheckpoint(eager=True)
    wf = bpe.word_freqs(docs)
    vocab = wordpiece.wordpiece_vocab(wf, vocab_size=300).localCheckpoint(eager=True)
    vset = {r["piece"] for r in vocab.select("piece").collect()}
    got = {
        r["doc_id"]: r["n_wp_tokens"]
        for r in wordpiece.wordpiece_token_counts(docs, vocab).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        n = sum(
            len(_py_segment(w, vset)) for w in r["text"].split(" ") if w != ""
        )
        assert got[r["doc_id"]] == n


def test_wordpiece_deterministic_across_repartition(spark, documents):
    wf = bpe.word_freqs(documents)
    a = sorted(map(tuple, wordpiece.wordpiece_vocab(wf, 150).collect()))
    b = sorted(
        map(tuple, wordpiece.wordpiece_vocab(wf.repartition(7), 150).collect())
    )
    assert a == b


def test_wordpiece_vocab_artifact_roundtrip(spark, documents, tmp_path):
    """serve-from-loaded == serve-from-built (the artifacts-tier contract)."""
    from pulsar_replay_spark.operators import artifacts

    wf = bpe.word_freqs(documents).localCheckpoint(eager=True)
    vocab = wordpiece.wordpiece_vocab(wf, vocab_size=150)
    path = str(tmp_path / "wp")
    artifacts.save_wordpiece_vocab(vocab, path)
    loaded = artifacts.load_wordpiece_vocab(spark, path)
    assert sorted(map(tuple, loaded.collect())) == sorted(map(tuple, vocab.collect()))
    a = wordpiece.wordpiece_segment_words(wf.limit(40), vocab).collect()
    b = wordpiece.wordpiece_segment_words(wf.limit(40), loaded).collect()
    assert sorted((r["word"], tuple(r["pieces"])) for r in a) == sorted(
        (r["word"], tuple(r["pieces"])) for r in b
    )


def _py_wp_train(word_freqs, n_merges, min_pair_freq=2):
    """Naive reference: full recount every round, same score and tie-break."""
    from collections import Counter
    from fractions import Fraction

    syms = {w: list(w) for w, _ in word_freqs}
    freqs = dict(word_freqs)
    merges = []
    for _ in range(n_merges):
        pc, sc = Counter(), Counter()
        for w, s in syms.items():
            for x in s:
                sc[x] += freqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += freqs[w]
        best, best_key = None, None
        for p, c in pc.items():
            if c < min_pair_freq:
                continue
            key = (Fraction(c, sc[p[0]] * sc[p[1]]), c)
            if best is None or key > best_key or (key == best_key and p < best):
                best, best_key = p, key
        if best is None:
            break
        a, b = best
        merges.append((a, b))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def test_wordpiece_train_matches_naive_reference(spark, documents):
    """The delta-updated trainer must equal a full-recount reference exactly
    — likelihood score, count tie-break, lexicographic tie-break, early
    stop — at a depth where deltas have compounded many times."""
    wf = bpe.word_freqs(documents).localCheckpoint(eager=True)
    pairs = [(r["word"], r["freq"]) for r in wf.collect()]
    got = wordpiece.wordpiece_train_local(wf, 100)
    assert got == _py_wp_train(pairs, 100)
    assert len(got) > 10  # fixture is rich enough for the gate to bite

    # score rule differs from BPE: rare-symbol pairs can beat frequent ones
    assert got != bpe.bpe_train_local(wf, len(got))


def test_wordpiece_train_vocab_gate(spark, documents):
    wf = bpe.word_freqs(documents)
    with pytest.raises(ValueError, match="max_vocab_rows"):
        wordpiece.wordpiece_train_local(wf, 5, max_vocab_rows=10)


def test_default_scan_bound_matches_long_trained_pieces(spark):
    """Regression pin for the r5 fix at wordpiece_segment_words: a
    merge-trained vocab containing pieces LONGER than MAX_PIECE_LEN must
    still match under the DEFAULT max_piece_len (derived from the vocab) —
    the old fixed bound of 8 silently never matched them."""
    spark_wf = spark.createDataFrame(
        [("overrepresentation", 40), ("overreach", 9), ("presentation", 7)],
        "word string, freq int",
    ).localCheckpoint(eager=True)
    merges = wordpiece.wordpiece_train_local(spark_wf, 60)
    pieces = wordpiece.pieces_from_merges(spark_wf, merges).localCheckpoint(
        eager=True
    )
    plens = [
        len(p.removeprefix("##"))
        for (p,) in pieces.select("piece").collect()
    ]
    assert max(plens) > wordpiece.MAX_PIECE_LEN  # long pieces really trained

    seg = {
        r["word"]: r["pieces"]
        for r in wordpiece.wordpiece_segment_words(spark_wf, pieces).collect()
    }
    # the dominant word segments into few long pieces, not 8-char shards
    assert any(
        len(p.removeprefix("##")) > wordpiece.MAX_PIECE_LEN
        for p in seg["overrepresentation"]
    )
    for w, ps in seg.items():
        assert "".join(p.removeprefix("##") for p in ps) == w
    # equality vs the pure-python greedy scan at the derived bound
    vset = {p for (p,) in pieces.select("piece").collect()}
    bound = max(plens)
    for w in seg:
        assert seg[w] == _py_segment(w, vset, max_len=bound)


def test_distributed_trainer_matches_local_and_reference(spark, documents):
    """wordpiece_train (distributed, no vocab collect) must produce the
    IDENTICAL merge list as wordpiece_train_local and the naive full-recount
    reference — likelihood score, exact-rational argmax, count tie-break,
    lexicographic tie-break — deep enough for folds + checkpoints to have
    compounded (ckpt_every=3 forces mid-run plan truncation)."""
    wf = bpe.word_freqs(documents).localCheckpoint(eager=True)
    pairs = [(r["word"], r["freq"]) for r in wf.collect()]
    n = 25
    got = wordpiece.wordpiece_train(wf, n, ckpt_every=3)
    assert got == wordpiece.wordpiece_train_local(wf, n)
    assert got == _py_wp_train(pairs, n)
    assert len(got) == n

    # stops early (not raises) when nothing reaches min_pair_freq
    assert wordpiece.wordpiece_train(wf, 3, min_pair_freq=10**9) == []


def test_distributed_trainer_is_the_past_gate_path(spark, documents):
    """Past the driver gate the local trainer raises but the distributed
    trainer still trains — the gate is a routing hint, not a capability
    wall (the r4/r5 verdict's top gap)."""
    wf = bpe.word_freqs(documents).localCheckpoint(eager=True)
    with pytest.raises(ValueError, match="wordpiece_train"):
        wordpiece.wordpiece_train_local(wf, 3, max_vocab_rows=10)
    pairs = [(r["word"], r["freq"]) for r in wf.collect()]
    assert wordpiece.wordpiece_train(wf, 3) == _py_wp_train(pairs, 3)


def test_pieces_from_merges_serve_loop(spark, documents):
    """train -> pieces -> greedy serving closes: the induced inventory
    segments every vocab word (totality via char union), reassembles it
    exactly, and compresses vs the char baseline; piece counts equal a
    driver-side recount of the merge-folded vocab."""
    wf = bpe.word_freqs(documents).localCheckpoint(eager=True)
    merges = wordpiece.wordpiece_train_local(wf, 60)
    pieces = wordpiece.pieces_from_merges(wf, merges).localCheckpoint(eager=True)

    # counts mirror a pure-python fold over the collected vocab
    from collections import Counter

    expect = Counter()
    seen_chars = set()
    for r in wf.collect():
        s = list(r["word"])
        seen_chars.update(s)
        for a, b in merges:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        for i, x in enumerate(s):
            expect[x if i == 0 else "##" + x] += r["freq"]
    for c in seen_chars:
        for p in (c, "##" + c):
            expect.setdefault(p, 0)
    got = {r["piece"]: r["cnt"] for r in pieces.collect()}
    assert got == dict(expect)

    # DEFAULT max_piece_len (the r5 serve-loop fix): the scanner derives its
    # bound from the vocab, so no explicit workaround is needed here
    seg = wordpiece.wordpiece_segment_words(wf, pieces).collect()
    n_pieces = n_chars = 0
    for r in seg:
        assert "".join(p.removeprefix("##") for p in r["pieces"]) == r["word"]
        n_pieces += len(r["pieces"])
        n_chars += len(r["word"])
    assert n_pieces < n_chars  # trained merges actually compress


def test_distributed_trainer_mass_tie_fallback_exact(spark):
    """When >top_k pairs tie at the max score, the top-K cut can't prove it
    saw the whole tie class and wordpiece_train must fall back to the exact
    epsilon-filter collect — still choosing the same winner as the local
    trainer (higher cnt, then lexicographically smallest pair). 150 words of
    two unique symbols each -> 150 pairs all scoring 2/(2*2), spilling past
    the 128-row cut."""
    words = []
    for i in range(150):
        a, b = chr(0x4E00 + 2 * i), chr(0x4E00 + 2 * i + 1)  # unique symbols
        words.append((a + b, 2))
    wf = spark.createDataFrame(words, "word string, freq int").localCheckpoint(
        eager=True
    )
    got = wordpiece.wordpiece_train(wf, 3)
    assert got == wordpiece.wordpiece_train_local(wf, 3)
    # after a merge, the merged word has one symbol (no pairs); remaining
    # 149 still tie -> the fallback fires every round; winners are the
    # lexicographically smallest remaining pairs in order
    assert got == [
        (chr(0x4E00), chr(0x4E01)),
        (chr(0x4E02), chr(0x4E03)),
        (chr(0x4E04), chr(0x4E05)),
    ]


def test_inventory_gate_fallback_matches_primary_path(spark, documents):
    """r13: wordpiece_train collects the (a, b, cnt) adjacency inventory
    and computes the exact argmax on the driver; past ``max_inventory_rows``
    it falls back to the r12 distributed scoring. Forcing the gate to 1
    makes EVERY round take the fallback — the merge list must be identical
    to the primary path and the local trainer."""
    from pulsar_replay_spark.operators import bpe

    wf = bpe.word_freqs(documents.limit(60)).localCheckpoint(eager=True)
    primary = wordpiece.wordpiece_train(wf, 6)
    fallback = wordpiece.wordpiece_train(wf, 6, max_inventory_rows=1)
    assert primary == fallback
    assert primary == wordpiece.wordpiece_train_local(wf, 6)


def test_trainer_equality_on_randomized_tie_heavy_vocabs(spark):
    """Randomized small-alphabet vocabs (seeded): tiny alphabets make score
    ties pervasive, so this stresses the exact-rational argmax and both
    tie-break levels far harder than the natural fixture. The delta trainer
    must equal the naive full-recount reference on every draw."""
    import random

    rnd = random.Random(99)
    for trial in range(12):
        n_words = rnd.randint(3, 12)
        alpha = "abcd"[: rnd.randint(2, 4)]
        vocab = {}
        for _ in range(n_words):
            w = "".join(rnd.choice(alpha) for _ in range(rnd.randint(1, 6)))
            vocab[w] = vocab.get(w, 0) + rnd.randint(1, 9)
        pairs = sorted(vocab.items())
        wf = spark.createDataFrame(pairs, "word string, freq int")
        for mpf in (1, 2):
            got = wordpiece.wordpiece_train_local(wf, 12, min_pair_freq=mpf)
            assert got == _py_wp_train(pairs, 12, min_pair_freq=mpf), (
                trial,
                mpf,
                pairs,
            )


def test_wordpiece_encode_docs_matches_python_assembly(spark, documents):
    """wordpiece_encode_docs: id sequences rebuilt independently — python
    greedy segmentation per word, lexicographic piece numbering, flattened
    in word order — must match exactly; n_tokens agrees with the
    per-doc sum of piece counts."""
    docs = documents.limit(30)
    wf = bpe.word_freqs(docs)
    vocab = wordpiece.wordpiece_vocab(wf, vocab_size=200).localCheckpoint(
        eager=True
    )
    vset = {r["piece"] for r in vocab.select("piece").collect()}

    encoded = {
        r.doc_id: (list(r.token_ids), r.n_tokens)
        for r in wordpiece.wordpiece_encode_docs(docs, vocab).collect()
    }
    rows = docs.select("doc_id", "text").collect()
    seg_cache, pieces = {}, set()
    for r in rows:
        for w in r.text.split(" "):
            if w and w not in seg_cache:
                seg_cache[w] = _py_segment(w, vset)
                pieces.update(seg_cache[w])
    pid = {p: i for i, p in enumerate(sorted(pieces))}
    for r in rows:
        want = [pid[p] for w in r.text.split(" ") if w for p in seg_cache[w]]
        got_ids, got_n = encoded[r.doc_id]
        assert got_ids == want, r.doc_id
        assert got_n == len(want)
