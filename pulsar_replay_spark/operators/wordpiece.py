"""WordPiece tokenizer: greedy longest-match-first segmentation (Wu et al.
2016, arXiv:1609.08144 — the BERT tokenizer family), completing the trained-
tokenizer tier next to ``operators/bpe`` (merge-list BPE) and
``operators/unigram`` (unigram-LM).

Same trainer trick as both siblings: the vocabulary is a function of the
WORD-FREQUENCY table, so the corpus is touched exactly once
(``bpe.word_freqs``) and everything else runs over the vocab-sized frame.

- ``wordpiece_vocab``: frequency-ranked piece inventory — word-initial
  substrings rank as-is, word-internal substrings rank with the ``##``
  continuation prefix; every single character (both forms) is always
  included so segmentation can never fail, exactly like BERT's vocab
  construction guarantees coverage.
- ``wordpiece_segment_words``: the canonical greedy longest-match scan per
  VOCAB WORD via one Arrow batch UDF (the vocab set rides the closure;
  Python cost is vocab-sized, never corpus-sized).
- ``wordpiece_token_counts``: corpus counts by equi-joining the segmented
  vocab on the word — the ``bpe_token_counts`` discipline; no corpus row
  ever enters Python.

No reference analog (the reference moves opaque messages); engine extension
for the LLM-training data tier.
"""

from __future__ import annotations

import pandas as pd  # module-scope so pandas_udf type hints resolve
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_PIECE_LEN = 8

# Relative slack for the double-precision score prefilter in
# ``wordpiece_train``. The true score is the exact rational cnt/den; the
# distributed plan computes it in float64, whose accumulated relative
# rounding error is < 4·2⁻⁵³ ≈ 4.5e-16, so any pair whose TRUE score ties
# the max has a double score within this band of the double max. 1e-9 is
# seven orders of magnitude of headroom; the driver finish re-compares the
# survivors exactly, so a too-wide band costs candidates, never correctness.
_SCORE_EPS = 1e-9


def wordpiece_vocab(
    wf: DataFrame, vocab_size: int = 1000, max_piece_len: int = MAX_PIECE_LEN
) -> DataFrame:
    """(piece, cnt): frequency-ranked WordPiece inventory from a (word, freq)
    table. A substring starting at position 1 contributes its plain form;
    any other start contributes the ``##``-prefixed continuation form —
    mirroring how matches may actually be used by the greedy scanner. The
    top ``vocab_size`` by (cnt desc, piece asc — deterministic tie-break)
    are kept, then unioned with every single-character piece in both forms
    (cnt from the same counts, 0 if unseen) so coverage is total.

    Scale shape: substring generation is a pure HOF explode over the VOCAB
    frame; the count reduce keyspace is the piece inventory (map-side
    combined); the cut is a distributed TakeOrdered via orderBy+limit —
    Spark plans it as TakeOrderedAndProject, never a global sort."""
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.transform(
                F.sequence(i, F.least(F.length("word"), i + F.lit(max_piece_len - 1))),
                lambda j: F.when(
                    i == 1, F.col("word").substr(i, j - i + 1)
                ).otherwise(F.concat(F.lit("##"), F.col("word").substr(i, j - i + 1))),
            ),
        )
    )
    counts = (
        wf.select("freq", F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )
    top = counts.orderBy(F.desc("cnt"), "piece").limit(vocab_size)
    chars = (
        wf.select(F.explode(F.split("word", "")).alias("c"))
        .filter(F.col("c") != "")
        .distinct()
        .select(F.explode(F.array(F.col("c"), F.concat(F.lit("##"), F.col("c")))).alias("piece"))
    )
    char_rows = chars.join(counts, "piece", "left").select(
        "piece", F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("cnt")
    )
    return top.unionByName(char_rows).groupBy("piece").agg(F.max("cnt").alias("cnt"))


def wordpiece_train(
    wf: DataFrame,
    n_merges: int,
    min_pair_freq: int = 2,
    ckpt_every: int = 2,
    max_inventory_rows: int = 2_000_000,
) -> list[tuple[str, str]]:
    """Distributed likelihood-scored WordPiece merge training — the
    ``bpe_train`` shape (per-round vocab-sized aggs, lazy merge folds,
    periodic ``localCheckpoint``) under the BERT trainer rule

        score(a, b) = count(ab) / (count(a) · count(b))

    so vocabularies past ``wordpiece_train_local``'s driver gate train
    without ever collecting the vocab. Exact-equal to the local trainer by
    construction (equality-gated in tests, the ``bpe_train`` discipline).

    Per round (r13, guide §1.2/§2.3), ONE job with ONE scan of the
    vocab-sized (word, freq, syms) frame: every position emits
    (sym, next-sym-or-NULL), one map-side-combined groupBy counts the
    (a, b) adjacencies, and that INVENTORY-scale relation (distinct
    adjacent symbol pairs — vocabulary-like, never corpus-like; row count
    gated by ``max_inventory_rows``) collects to the driver, where symbol
    counts fall out of the same rows (scnt(s) = Σ cnt over a = s — each
    position emits exactly one row, the trailing NULL row covering last
    positions) and the argmax is EXACT Fraction cross-multiplication,
    ties on (higher cnt, then lexicographically smallest pair) — the same
    rule as the local trainer, so no float-ordering ambiguity can leak
    into the merge list. The r12 shape ran TWO vocab scans per round
    (pair agg + symbol agg — each re-evaluating the pending lazy merge
    folds) plus broadcast-join/TakeOrdered machinery with a float score
    band re-verified in Fractions; collecting the inventory removes the
    second scan, both broadcasts, and the band entirely.

    Past the inventory gate (pathological alphabets — the distinct-pair
    inventory is bounded by the live symbol alphabet squared) the round
    falls back to the r12 distributed scoring over the same single-scan
    relation, so training still never collects more than
    ``max_inventory_rows`` rows.

    ``ckpt_every`` defaults to 2, not ``bpe_train``'s 4: the merge fold
    is DOUBLE work here (syms from character split — longer arrays than
    BPE's EOW form); measured 8.8 s (K=2) vs 12.1 s (K=4) vs 9.5 s (K=1)
    for 20 merges at bench scale (r12 shape). Checkpoint frequency never
    changes the merge list (equality tests force K=3)."""
    from fractions import Fraction

    vocab = wf.select(
        "word", "freq", F.split("word", "").alias("syms")
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    pending = 0  # lazy folds since the last plan truncation
    for _ in range(n_merges):
        # one scan: position i emits (sym_i, sym_{i+1} or NULL) — pair
        # adjacencies AND per-symbol occurrence counts from one relation
        adj = (
            vocab.select(
                "freq",
                F.explode(
                    F.when(
                        F.size("syms") >= 1,
                        F.transform(
                            F.sequence(F.lit(0), F.size("syms") - 1),
                            lambda i: F.struct(
                                F.element_at(F.col("syms"), i + 1).alias("a"),
                                F.when(
                                    i + 2 <= F.size("syms"),
                                    F.element_at(F.col("syms"), i + 2),
                                ).alias("b"),
                            ),
                        ),
                    ).otherwise(
                        F.array().cast("array<struct<a:string,b:string>>")
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
        )
        rows = adj.limit(max_inventory_rows + 1).collect()
        if not rows:
            break
        if len(rows) > max_inventory_rows:
            best = _distributed_round_argmax(adj, min_pair_freq)
        else:
            scnt: dict[str, int] = {}
            for r in rows:
                scnt[r["a"]] = scnt.get(r["a"], 0) + int(r["cnt"])
            best, best_key = None, None
            for r in rows:
                b_sym = r["b"]
                cnt = int(r["cnt"])
                if b_sym is None or cnt < min_pair_freq:
                    continue
                key = (Fraction(cnt, scnt[r["a"]] * scnt[b_sym]), cnt)
                p = (r["a"], b_sym)
                if (
                    best is None
                    or key > best_key
                    or (key == best_key and p < best)
                ):
                    best, best_key = p, key
        if best is None:
            break
        a, b = best
        merges.append((a, b))
        from pulsar_replay_spark.operators.bpe import _merge_fold

        vocab = vocab.withColumn("syms", _merge_fold(F.col("syms"), a, b))
        pending += 1
        if pending >= ckpt_every:
            vocab = vocab.localCheckpoint(eager=True)
            pending = 0
    return merges


def _distributed_round_argmax(
    adj: DataFrame, min_pair_freq: int
) -> "tuple[str, str] | None":
    """The r12 distributed argmax, kept as ``wordpiece_train``'s fallback
    when the adjacency inventory exceeds the driver gate: score every pair
    from the SAME single-scan (a, b, cnt) relation (scnt = Σ cnt over
    a = s), TakeOrdered the top-K float scores, exact-Fraction re-compare
    on the driver; if the _SCORE_EPS band fills all K rows, an exact
    epsilon-filter collect (candidates can be missed by the cut, never by
    the band — float rounding is ≲4.5e-16 relative)."""
    from fractions import Fraction

    symc = adj.groupBy("a").agg(
        F.sum("cnt").cast("decimal(19,0)").alias("scnt")
    )
    sa = symc.select(F.col("a"), F.col("scnt").alias("scnt_a"))
    sb = symc.select(F.col("a").alias("b"), F.col("scnt").alias("scnt_b"))
    scored = (
        adj.filter(F.col("b").isNotNull() & (F.col("cnt") >= min_pair_freq))
        .join(F.broadcast(sa), "a")
        .join(F.broadcast(sb), "b")
        .select(
            "a",
            "b",
            "cnt",
            (F.col("scnt_a") * F.col("scnt_b")).alias("den"),
            (
                F.col("cnt").cast("double")
                / (F.col("scnt_a") * F.col("scnt_b")).cast("double")
            ).alias("score"),
        )
    )
    top_k = 128
    top = scored.orderBy(
        F.desc("score"), F.desc("cnt"), "a", "b"
    ).limit(top_k).collect()
    if not top:
        return None
    m = top[0]["score"]
    cands = [r for r in top if r["score"] >= m * (1 - _SCORE_EPS)]
    if len(cands) == top_k:
        # mass tie spilling past the cut: exact epsilon filter (rare)
        cands = scored.filter(
            F.col("score") >= F.lit(m * (1 - _SCORE_EPS))
        ).collect()
    best, best_key = None, None
    for r in cands:
        key = (Fraction(int(r["cnt"]), int(r["den"])), int(r["cnt"]))
        p = (r["a"], r["b"])
        if best is None or key > best_key or (key == best_key and p < best):
            best, best_key = p, key
    return best


def wordpiece_train_local(
    wf: DataFrame,
    n_merges: int,
    min_pair_freq: int = 2,
    max_vocab_rows: int = 5_000_000,
) -> list[tuple[str, str]]:
    """Likelihood-scored WordPiece merge training — the actual BERT trainer
    rule: each round merges the adjacent pair maximizing

        score(a, b) = count(ab) / (count(a) · count(b))

    (the pair whose merge most improves a unigram LM's corpus likelihood),
    vs BPE's raw count(ab). Driver-side under the same explicit
    ``max_vocab_rows`` gate as ``bpe.bpe_train_local`` — state is
    vocab-sized — with the same delta machinery: pair AND symbol counts
    update only for words containing the merged pair. Scores change
    globally when a SYMBOL count changes, so the argmax is a full scan of
    the live pair table per round (P is vocab-bounded; no heap since a
    heap would be invalidated by every symbol-count change).

    Deterministic: ties break on (higher pair count, then lexicographically
    smallest pair). Stops when the best pair's count < ``min_pair_freq``.
    Returns the ordered merge list; feed the resulting symbol inventory to
    ``wordpiece_segment_words`` via the pieces it induces."""
    from collections import Counter
    from fractions import Fraction

    n_rows = wf.count()
    if n_rows > max_vocab_rows:
        raise ValueError(
            f"vocab has {n_rows} rows > max_vocab_rows={max_vocab_rows}; "
            "use the distributed wordpiece_train (or raise the gate)"
        )
    rows = wf.select("word", "freq").collect()
    syms = [list(r["word"]) for r in rows]
    freqs = [int(r["freq"]) for r in rows]

    pair_counts: Counter = Counter()
    sym_counts: Counter = Counter()
    index: dict[tuple[str, str], set[int]] = {}
    for w, s in enumerate(syms):
        for x in s:
            sym_counts[x] += freqs[w]
        for i in range(len(s) - 1):
            p = (s[i], s[i + 1])
            pair_counts[p] += freqs[w]
            index.setdefault(p, set()).add(w)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        # exact rational scores: no float-ordering ambiguity in the argmax
        best, best_key = None, None
        for p, c in pair_counts.items():
            if c < min_pair_freq:
                continue
            score = Fraction(c, sym_counts[p[0]] * sym_counts[p[1]])
            key = (score, c)
            if best is None or key > best_key or (key == best_key and p < best):
                best, best_key = p, key
        if best is None:
            break
        a, b = best
        merges.append((a, b))
        merged = a + b
        for w in list(index.get((a, b), ())):
            s = syms[w]
            old_pairs = Counter(
                (s[i], s[i + 1]) for i in range(len(s) - 1)
            )
            old_syms = Counter(s)
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
            new_pairs = Counter((out[i], out[i + 1]) for i in range(len(out) - 1))
            new_syms = Counter(out)
            for x in old_syms.keys() | new_syms.keys():
                d = new_syms.get(x, 0) - old_syms.get(x, 0)
                if d:
                    sym_counts[x] += d * freqs[w]
            for p in old_pairs.keys() | new_pairs.keys():
                d = new_pairs.get(p, 0) - old_pairs.get(p, 0)
                if d:
                    pair_counts[p] += d * freqs[w]
                if new_pairs.get(p, 0):
                    index.setdefault(p, set()).add(w)
                elif p in index:
                    index[p].discard(w)
        pair_counts.pop((a, b), None)
        index.pop((a, b), None)
    return merges


def pieces_from_merges(
    wf: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(piece, cnt): the serving inventory a trained merge list induces —
    apply the merges to every vocab word (one Arrow batch UDF; the merge
    list rides the closure) and emit each surviving symbol in the form the
    greedy scanner will look it up: plain at word start, ``##``-prefixed
    inside. Single characters in both forms are unioned in (cnt 0 if never
    surviving) so segmentation stays total. Feed the result straight to
    ``wordpiece_segment_words`` — the train→serve bridge."""
    from pyspark.sql.functions import pandas_udf

    ranks = list(merges)

    @pandas_udf("array<string>")
    def apply_merges(col: pd.Series) -> pd.Series:
        def one(word: str) -> list[str]:
            s = list(word)
            for a, b in ranks:
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                s = out
            return [x if i == 0 else "##" + x for i, x in enumerate(s)]

        return col.map(one)

    counts = (
        wf.withColumn("pieces", apply_merges(F.col("word")))
        .select("freq", F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )
    chars = (
        wf.select(F.explode(F.split("word", "")).alias("c"))
        .filter(F.col("c") != "")
        .distinct()
        .select(
            F.explode(F.array(F.col("c"), F.concat(F.lit("##"), F.col("c")))).alias(
                "piece"
            )
        )
    )
    char_rows = chars.join(counts, "piece", "left").select(
        "piece", F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("cnt")
    )
    return counts.unionByName(char_rows).groupBy("piece").agg(
        F.max("cnt").alias("cnt")
    )


def _greedy_segment(word: str, vocab: set[str], max_len: int) -> list[str]:
    """BERT's WordPieceTokenizer scan: at each position take the LONGEST
    vocab match (## form after the first piece); single-char coverage makes
    failure impossible by construction."""
    out, pos = [], 0
    while pos < len(word):
        end = min(len(word), pos + max_len)
        while end > pos:
            piece = word[pos:end] if pos == 0 else "##" + word[pos:end]
            if piece in vocab:
                out.append(piece)
                break
            end -= 1
        else:  # no match even at length 1 — unreachable with char coverage
            out.append(word[pos] if pos == 0 else "##" + word[pos])
            end = pos + 1
        pos = end
    return out


def wordpiece_segment_words(
    words: DataFrame, vocab: DataFrame, max_piece_len: int | None = None
) -> DataFrame:
    """(word, pieces: array<string>): greedy longest-match segmentation of
    each vocab word — one Arrow batch UDF; the piece set rides the closure
    (it IS the tokenizer artifact, bounded by vocab_size).

    ``max_piece_len`` defaults to the LONGEST piece actually in the vocab
    (``##`` prefix excluded), so a merge-trained inventory whose pieces
    exceed ``MAX_PIECE_LEN`` still matches — a fixed default scanner bound
    shorter than the vocab's pieces would silently never match them."""
    from pyspark.sql.functions import pandas_udf

    vset = {r["piece"] for r in vocab.select("piece").collect()}
    if max_piece_len is None:
        max_piece_len = max(
            (len(p[2:]) if p.startswith("##") else len(p) for p in vset), default=1
        )

    @pandas_udf("array<string>")
    def seg(col: pd.Series) -> pd.Series:
        return col.map(lambda w: _greedy_segment(w, vset, max_piece_len))

    return words.withColumn("pieces", seg(F.col("word")))


def wordpiece_token_counts(
    docs: DataFrame, vocab: DataFrame, max_piece_len: int | None = None
) -> DataFrame:
    """(doc_id, n_wp_tokens) under a trained WordPiece vocab — corpus side
    is explode + vocab equi-join, the ``bpe_token_counts`` shape."""
    from pulsar_replay_spark.functions.text import tokens
    from pulsar_replay_spark.operators.bpe import word_freqs

    wf = word_freqs(docs)
    seg = wordpiece_segment_words(wf, vocab, max_piece_len).select(
        "word", F.size("pieces").alias("n_word_tokens")
    )
    doc_words = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("word")
    ).filter(F.col("word") != "")
    return (
        docs.select("doc_id")
        .join(
            doc_words.join(seg, "word")
            .groupBy("doc_id")
            .agg(F.sum("n_word_tokens").alias("n_wp_tokens")),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce(F.col("n_wp_tokens"), F.lit(0)).cast("bigint").alias(
                "n_wp_tokens"
            ),
        )
    )


def wordpiece_encode_docs(
    docs: DataFrame,
    vocab: DataFrame,
    piece_ids: DataFrame | None = None,
    max_piece_len: int | None = None,
) -> DataFrame:
    """(doc_id, token_ids array<long>, n_tokens): the corpus encoded under a
    trained WordPiece vocabulary — greedy longest-match segmentation over
    the word-frequency table, then the engine's shared order-preserving
    id reassembly (``bpe.encode_docs_from_segmented``). Freeze ``piece_ids``
    from the training corpus for stable ids across ingests (the
    ``bpe_encode_docs`` contract)."""
    from pulsar_replay_spark.operators.bpe import (
        encode_docs_from_segmented,
        word_freqs,
    )

    seg = wordpiece_segment_words(word_freqs(docs), vocab, max_piece_len)
    return encode_docs_from_segmented(docs, seg, "pieces", piece_ids)
