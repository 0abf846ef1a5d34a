"""Unigram-LM tokenizer training (Kudo 2018, arXiv:1804.10959 — the
SentencePiece unigram model), distributed with the same trainer trick as BPE:
every statistic is a function of the WORD-FREQUENCY table, so the corpus is
touched exactly once (``bpe.word_freqs``) and all EM rounds run over the
vocab-sized (word, freq) frame — bounded and zipfian however large the corpus.

Algorithm (hard-EM variant — Viterbi counts in the E-step instead of
forward–backward marginals; deterministic, and the standard simplification
when the goal is the piece inventory + serving segmentation):

1. seed: candidate pieces = all substrings (≤ ``max_piece_len``) of vocab
   words, scored by freq-weighted occurrence; keep the top ``seed_size``
   plus every single character (coverage guarantee).
2. E-step: Viterbi-segment each VOCAB WORD under current piece log-probs
   (one Arrow batch pandas UDF over the vocab — Python cost is vocab-sized,
   never corpus-sized; the model rides the closure, bounded by seed_size).
3. M-step: piece counts = Σ_word freq(word)·uses(word, piece) — a
   vocab-frame explode + groupBy; log-probs renormalize from the counts.
4. prune: drop the lowest-count multi-char pieces (never single chars)
   until the inventory reaches ``vocab_size``.

Serving mirrors BPE: ``unigram_segment_words`` over the vocab,
``unigram_token_counts`` equi-joins the segmented vocab on the word so no
corpus row ever enters Python.

No reference analog (the reference moves opaque messages); this is the
second tokenizer-training path of the LLM data tier, next to operators/bpe.
"""

from __future__ import annotations

import math

import pandas as pd  # module-scope so pandas_udf type hints resolve
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNK_LOGP = -100.0  # fallback for characters outside the piece inventory


def seed_vocab(wf: DataFrame, seed_size: int, max_piece_len: int = 8) -> DataFrame:
    """(piece, cnt): the top ``seed_size`` substrings of vocab words by
    freq-weighted occurrence count, unioned with every single character —
    the EM starting inventory. Substring generation is a pure HOF explode
    over the vocab frame (O(len·max_piece_len) pieces per word, JVM-side);
    the cut is a distributed TakeOrdered, not a global sort."""
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.transform(
                F.sequence(
                    i, F.least(F.length("word"), i + F.lit(max_piece_len - 1))
                ),
                lambda j: F.col("word").substr(i, j - i + 1),
            ),
        )
    )
    counts = (
        wf.select("freq", F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
        .localCheckpoint(eager=True)  # feeds the top cut AND the char floor
    )
    top = counts.filter(F.length("piece") > 1).orderBy(
        F.desc("cnt"), "piece"
    ).limit(seed_size)
    chars = counts.filter(F.length("piece") == 1)
    return top.unionByName(chars).dropDuplicates(["piece"])


def _viterbi(word: str, logp: dict[str, float], max_len: int) -> list[str]:
    """Deterministic max-log-prob segmentation: ties prefer FEWER pieces,
    then the segmentation reached via the longest final piece (start index
    asc relax with strict improvement). Unknown single chars segment at
    UNK_LOGP so every word segments."""
    n = len(word)
    # (score, -n_pieces) lexicographic maximization
    best: list[tuple[float, int]] = [(0.0, 0)] + [(-math.inf, 0)] * n
    back: list[int] = [0] * (n + 1)
    for end in range(1, n + 1):
        for start in range(max(0, end - max_len), end):
            piece = word[start:end]
            lp = logp.get(piece)
            if lp is None:
                if end - start > 1:
                    continue
                lp = UNK_LOGP
            cand = (best[start][0] + lp, best[start][1] - 1)
            if cand > best[end]:
                best[end] = cand
                back[end] = start
    out: list[str] = []
    end = n
    while end > 0:
        start = back[end]
        out.append(word[start:end])
        end = start
    return out[::-1]


def _model_dict(model: DataFrame) -> tuple[dict[str, float], int]:
    """Collect the bounded (piece, logp) artifact for closure shipping —
    the same posture as BPE's merge list (the model IS broadcast-sized by
    construction: ≤ seed_size + |alphabet| rows)."""
    rows = model.collect()
    return {r["piece"]: r["logp"] for r in rows}, max(
        (len(r["piece"]) for r in rows), default=1
    )


def unigram_segment_words(words: DataFrame, model: DataFrame) -> DataFrame:
    """(word, pieces: array<string>) under a trained model — one Arrow batch
    pandas UDF over the VOCAB frame (serving twin of the E-step)."""
    from pyspark.sql.functions import pandas_udf

    logp, max_len = _model_dict(model)

    @pandas_udf("array<string>")
    def seg(col: pd.Series) -> pd.Series:
        return col.map(lambda w: _viterbi(w, logp, max_len))

    return words.withColumn("pieces", seg(F.col("word")))


def _logp_model(spark, rows) -> DataFrame:
    """Bounded (piece, cnt) rows → the (piece, logp) model artifact, with
    the log computed DRIVER-side via CPython ``math.log`` — the one float
    op sequence both trainers share. Renormalizing through JVM ``F.log``
    here would couple the local trainer's bit-equality gate to
    java.lang.Math.log and libm agreeing in the last ulp (each is only
    "within 1 ulp of correctly rounded", and a 1-ulp logp split can flip a
    Viterbi tie, changing the inventory — r6 review). The rows are the
    model artifact (≤ seed size + |alphabet|), the same bounded payload
    ``_model_dict`` collects for closure shipping every round."""
    total = sum(r["cnt"] for r in rows)
    return spark.createDataFrame(
        sorted((r["piece"], math.log(r["cnt"] / float(total))) for r in rows),
        "piece string, logp double",
    ) if rows else spark.createDataFrame([], "piece string, logp double")


def unigram_train(
    wf: DataFrame,
    vocab_size: int,
    n_iters: int = 3,
    seed_mult: int = 4,
    prune_frac: float = 0.25,
    max_piece_len: int = 8,
) -> DataFrame:
    """Train a unigram piece inventory from a (word, freq) table; returns
    the model artifact (piece, logp) with ≤ max(vocab_size, |alphabet|)
    rows (single chars are never PRUNED — though a char no Viterbi path
    uses drops out of the counts naturally; serving then falls back to
    ``UNK_LOGP``, so every word still segments).

    Per-round ``localCheckpoint`` keeps each EM round's plan flat (the BPE
    discipline); the argsorts are TakeOrdered cuts, never global sorts.
    Deterministic: count ties break lexicographically on the piece
    everywhere a cut happens. Counting stays distributed; only the
    renormalization over the bounded artifact runs on the driver
    (``_logp_model``), so logp bits are platform-stable vs the local twin.
    """
    spark = wf.sparkSession
    seeded = seed_vocab(wf, vocab_size * seed_mult, max_piece_len)
    model = _logp_model(spark, seeded.collect())
    vocab_words = wf.select("word", "freq").localCheckpoint(eager=True)

    for it in range(n_iters):
        seg = unigram_segment_words(vocab_words, model)
        counts = (
            seg.select("freq", F.explode("pieces").alias("piece"))
            .groupBy("piece")
            .agg(F.sum("freq").alias("cnt"))
            .localCheckpoint(eager=True)
        )
        # prune toward vocab_size: multi-char pieces ranked by expected
        # count (ties: piece asc); chars always survive. Pieces the E-step
        # never used drop out naturally (absent from counts).
        n_multi = counts.filter(F.length("piece") > 1).count()
        keep_multi = max(
            vocab_size, int(n_multi * (1.0 - prune_frac))
        ) if it < n_iters - 1 else vocab_size
        kept = (
            counts.filter(F.length("piece") > 1)
            .orderBy(F.desc("cnt"), "piece")
            .limit(keep_multi)
            .unionByName(counts.filter(F.length("piece") == 1))
        )
        model = _logp_model(spark, kept.collect())
    return model


def unigram_train_local(
    wf: DataFrame,
    vocab_size: int,
    n_iters: int = 3,
    seed_mult: int = 4,
    prune_frac: float = 0.25,
    max_piece_len: int = 8,
    max_vocab_rows: int = 5_000_000,
) -> DataFrame:
    """Driver-side exact twin of ``unigram_train`` — the ``bpe_train_local``
    precedent applied to the EM trainer: unigram state is VOCAB-sized (the
    corpus was already reduced to (word, freq) by the one distributed pass),
    so under the explicit ``max_vocab_rows`` gate the optimal execution is
    one collect + in-memory EM rounds instead of one Spark job per round.

    Exact-equal to the distributed trainer by construction (equality-gated
    in tests): the same ``_viterbi`` E-step, the same (cnt desc, piece asc)
    prune cuts, and the same CPython ``math.log(cnt / float(total))`` op
    sequence (the distributed path renormalizes driver-side in
    ``_logp_model`` for exactly this reason), so logp values are
    bit-identical on any platform, not merely close. Returns the same
    (piece, logp) DataFrame artifact; ``unigram_train`` remains the path for
    vocabularies past the gate."""
    from collections import Counter

    n_rows = wf.count()
    if n_rows > max_vocab_rows:
        raise ValueError(
            f"vocab has {n_rows} rows > max_vocab_rows={max_vocab_rows}; "
            "use the distributed unigram_train (or raise the gate)"
        )
    words = [(r["word"], int(r["freq"])) for r in wf.select("word", "freq").collect()]

    # seed: freq-weighted substring counts; top multi-char + every char
    counts: Counter = Counter()
    for w, f in words:
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + max_piece_len) + 1):
                counts[w[i : j]] += f
    seeded = dict(
        sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )[: vocab_size * seed_mult]
    )
    seeded.update({p: c for p, c in counts.items() if len(p) == 1})
    total = sum(seeded.values())
    logp = {p: math.log(c / float(total)) for p, c in seeded.items()}

    for it in range(n_iters):
        max_len = max((len(p) for p in logp), default=1)
        cnt: Counter = Counter()
        for w, f in words:
            for piece in _viterbi(w, logp, max_len):
                cnt[piece] += f
        n_multi = sum(1 for p in cnt if len(p) > 1)
        keep_multi = (
            max(vocab_size, int(n_multi * (1.0 - prune_frac)))
            if it < n_iters - 1
            else vocab_size
        )
        kept = dict(
            sorted(
                ((p, c) for p, c in cnt.items() if len(p) > 1),
                key=lambda kv: (-kv[1], kv[0]),
            )[:keep_multi]
        )
        kept.update({p: c for p, c in cnt.items() if len(p) == 1})
        total = sum(kept.values())
        logp = {p: math.log(c / float(total)) for p, c in kept.items()}

    return wf.sparkSession.createDataFrame(
        sorted(logp.items()), "piece string, logp double"
    )


def unigram_token_counts(docs: DataFrame, model: DataFrame) -> DataFrame:
    """(doc_id, n_pieces) under a trained model — corpus explodes to
    (doc_id, word) and equi-joins the segmented VOCAB on the word
    (vocabulary-keyspace shuffle, hot words combine map-side; no corpus row
    enters Python). Same contract as ``bpe.bpe_token_counts``."""
    from pulsar_replay_spark.functions.text import tokens
    from pulsar_replay_spark.operators.bpe import word_freqs

    vocab = word_freqs(docs)
    seg = unigram_segment_words(vocab, model).select(
        "word", F.size("pieces").alias("n_word_pieces")
    )
    doc_words = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("word")
    ).filter(F.col("word") != "")
    return (
        docs.select("doc_id")
        .join(
            doc_words.join(seg, "word")
            .groupBy("doc_id")
            .agg(F.sum("n_word_pieces").alias("n_pieces")),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce(F.col("n_pieces"), F.lit(0)).cast("bigint").alias("n_pieces"),
        )
    )


def tokenizer_report(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    model: DataFrame,
    wp_vocab: DataFrame | None = None,
) -> DataFrame:
    """Side-by-side tokenizer evaluation: per source, corpus fertility
    (pieces per whitespace word) and chars-per-piece under the trained BPE
    merge list vs the trained unigram model (vs a WordPiece vocab when
    given) — the comparison a tokenizer choice is actually made from. All
    counting paths share the segmented-VOCAB equi-join shape, so the report
    costs one vocab segmentation + one corpus join per tokenizer, never a
    corpus-sized Python pass."""
    from pulsar_replay_spark.functions.text import token_count
    from pulsar_replay_spark.operators.bpe import bpe_token_counts

    base = docs.select(
        "doc_id",
        "source",
        token_count(F.col("text")).cast("bigint").alias("n_words"),
        F.length(F.regexp_replace("text", " ", "")).cast("bigint").alias("n_chars"),
    )
    b = bpe_token_counts(docs, merges).withColumnRenamed("n_bpe_tokens", "bpe")
    u = unigram_token_counts(docs, model).withColumnRenamed("n_pieces", "uni")
    joined = base.join(b, "doc_id").join(u, "doc_id")
    aggs = [
        F.sum("n_words").alias("n_words"),
        F.sum("bpe").alias("bpe_tokens"),
        F.sum("uni").alias("unigram_tokens"),
        F.round(F.sum("bpe") / F.sum("n_words"), 4).alias("bpe_fertility"),
        F.round(F.sum("uni") / F.sum("n_words"), 4).alias("unigram_fertility"),
        F.round(F.sum("n_chars") / F.sum("bpe"), 4).alias("bpe_chars_per_token"),
        F.round(F.sum("n_chars") / F.sum("uni"), 4).alias("unigram_chars_per_token"),
    ]
    if wp_vocab is not None:
        from pulsar_replay_spark.operators.wordpiece import wordpiece_token_counts

        w = wordpiece_token_counts(docs, wp_vocab).withColumnRenamed(
            "n_wp_tokens", "wp"
        )
        joined = joined.join(w, "doc_id")
        aggs += [
            F.sum("wp").alias("wordpiece_tokens"),
            F.round(F.sum("wp") / F.sum("n_words"), 4).alias("wordpiece_fertility"),
            F.round(F.sum("n_chars") / F.sum("wp"), 4).alias(
                "wordpiece_chars_per_token"
            ),
        ]
    return joined.groupBy("source").agg(*aggs)


def unigram_encode_docs(
    docs: DataFrame, model: DataFrame, piece_ids: DataFrame | None = None
) -> DataFrame:
    """(doc_id, token_ids array<long>, n_tokens): the corpus encoded under a
    trained unigram-LM model — Viterbi segmentation over the word-frequency
    table, then the engine's shared order-preserving id reassembly
    (``bpe.encode_docs_from_segmented``). Freeze ``piece_ids`` from the
    training corpus for stable ids across ingests."""
    from pulsar_replay_spark.operators.bpe import (
        encode_docs_from_segmented,
        word_freqs,
    )

    seg = unigram_segment_words(word_freqs(docs), model)
    return encode_docs_from_segmented(docs, seg, "pieces", piece_ids)
