"""BPE tokenizer training at corpus scale (Sennrich et al. 2016,
arXiv:1508.07909) — learn the merge table an LLM tokenizer ships with.

Scale shape — the classic trainer trick, distributed: BPE statistics are a
function of the WORD FREQUENCY table, not the corpus. The corpus is touched
exactly once (`word_freqs`: explode + count, map-side combined into the
vocabulary keyspace); every merge iteration then runs over the vocab-sized
(word, freq, syms) frame — bounded and zipfian however large the corpus.
Each iteration is: adjacent-pair count (groupBy over ≤ Σ|word| pairs),
argmax (driver scalar — same posture as k-means' per-round action), and an
in-place HOF merge fold (whole-stage codegen, no Python). Per-round eager
``localCheckpoint`` keeps the logical plan flat (see ``bpe_train``).

Segmentation (`bpe_segment_words`) applies a learned merge list with one
Arrow-batched Pandas UDF over the VOCAB — Python cost is vocab-sized, never
corpus-sized; corpus token counts then equi-join the segmented vocab on the
word (`bpe_token_counts`).

No reference analog (the reference moves opaque messages); this is the
tokenizer-training step of the LLM data pipeline, next to packing/curation.
"""

from __future__ import annotations

import pandas as pd  # module-scope so pandas_udf type hints resolve
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EOW = "</w>"  # end-of-word marker symbol (Sennrich's original formulation)


def word_freqs(docs: DataFrame, min_freq: int = 1) -> DataFrame:
    """(word, freq) over whitespace tokens — the ONLY corpus-scale job in
    training. ``min_freq`` prunes hapax noise (standard trainer knob); empty
    tokens are dropped."""
    from pulsar_replay_spark.functions.text import tokens

    wf = (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    return wf.filter(F.col("freq") >= min_freq) if min_freq > 1 else wf


def _initial_syms(word: Column) -> Column:
    """word → its character symbols + the end-of-word marker."""
    return F.concat(F.split(word, ""), F.array(F.lit(EOW)))


def _merge_fold(syms: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping merge of adjacent (a, b) → a+b inside a
    symbol array — a single ``aggregate`` fold, pure codegen. Matches the
    reference scan exactly, including runs ("a a a" under (a,a) → "aa a")."""
    merged = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    wf: DataFrame,
    n_merges: int,
    min_pair_freq: int = 2,
    ckpt_every: int = 4,
    batch_candidates: int = 16,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from a (word, freq) table.

    Deterministic: the winning pair each round is (max total freq, then
    lexicographically smallest (a, b)) — stable across partitionings and
    retries. Stops early when no adjacent pair reaches ``min_pair_freq``.
    Returns the ordered merge list (the tokenizer artifact).

    Job shape: ONE Spark job per ACCEPTED BATCH of merges — the round's
    count job TakeOrdereds the top ``batch_candidates`` pairs, and the
    driver accepts a PREFIX of that list whose serial equivalence is
    provable from the collected counts alone (r13 speculative multi-merge,
    verdict #6; ``batch_candidates=1`` degenerates to the r12
    one-job-per-merge shape). Candidate i is accepted after candidates
    1..i-1 iff every check below holds; the batch STOPS at the first
    failure (never skips), so the accepted prefix replays the serial
    argmax exactly — equality with the serial/local trainer is gated in
    tests, including conflict-heavy randomized vocabs:

    - its symbols are disjoint from every earlier accepted merge's
      {a, b, a+b} (its count is provably unchanged, and disjoint
      left-to-right folds commute);
    - its count strictly exceeds the collected window's floor (a pair
      BELOW the window could tie otherwise);
    - its count strictly exceeds every earlier accepted merge's
      new-pair bound: a merge (a, b) → s creates only pairs involving s,
      with count_new(x·s) ≤ count_orig(x·a), count_new(s·y) ≤
      count_orig(b·y), count_new(s·s) ≤ count_orig(b·a) — all bounded by
      the max collected count matching (·, a) / (b, ·), or the window
      floor for pairs below it;
    - the merged string s is NOT an existing live symbol (tracked
      driver-side: initial inventory + created merges): merging into an
      existing symbol can BOOST unknown existing-pair counts, so such a
      merge is accepted but ends its batch.

    ``ckpt_every``: the merge fold is a LARGE expression (aggregate + when
    + slice per element), so an unbounded lazy chain makes analysis/codegen
    re-walk every previous fold and training grows superlinearly in merges
    (measured 5.6× on the 15-merge suite). A ``localCheckpoint`` every K
    rounds truncates the logical plan, bounding every job to ≤ K folds —
    K couples plan depth against job count (K=1 is the old
    checkpoint-per-round shape)."""
    vocab = wf.select(
        "word", "freq", _initial_syms(F.col("word")).alias("syms")
    ).localCheckpoint(eager=True)
    # live symbol inventory (chars + EOW now, + every created merge): one
    # bounded job, amortized over every round the batching saves
    alphabet = {
        r.s
        for r in vocab.select(F.explode("syms").alias("s")).distinct().collect()
    }
    merges: list[tuple[str, str]] = []
    pending = 0  # lazy folds since the last plan truncation
    while len(merges) < n_merges:
        pairs = (
            vocab.select(
                "freq",
                F.explode(
                    F.when(
                        F.size("syms") >= 2,
                        F.transform(
                            F.sequence(F.lit(0), F.size("syms") - 2),
                            lambda i: F.struct(
                                F.element_at(F.col("syms"), i + 1).alias("a"),
                                F.element_at(F.col("syms"), i + 2).alias("b"),
                            ),
                        ),
                    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
        )
        t = max(1, int(batch_candidates))
        top = pairs.orderBy(F.desc("cnt"), "a", "b").limit(t).collect()
        if not top or top[0].cnt < min_pair_freq:
            break
        # floor: counts at/below it are not provably absent BELOW the
        # window (0 = the whole relation is in hand)
        floor = top[-1].cnt if len(top) == t else 0
        accepted: list[tuple[str, str]] = []
        used: set[str] = set()
        bound = 0
        for r in top:
            a, b, cnt = r.a, r.b, int(r.cnt)
            if cnt < min_pair_freq:
                break
            if accepted and (
                cnt <= floor
                or cnt <= bound
                or a in used
                or b in used
                or (a + b) in used
            ):
                break
            s = a + b
            accepted.append((a, b))
            if len(merges) + len(accepted) >= n_merges:
                break
            if s in alphabet:
                # boosts unknown existing-pair counts — recount next round
                break
            used.update((a, b, s))
            bound = max(
                bound,
                floor,
                max(
                    (int(q.cnt) for q in top if q.b == a or q.a == b),
                    default=0,
                ),
            )
        for a, b in accepted:
            merges.append((a, b))
            alphabet.add(a + b)
            vocab = vocab.withColumn("syms", _merge_fold(F.col("syms"), a, b))
            pending += 1
            if pending >= ckpt_every:
                vocab = vocab.localCheckpoint(eager=True)
                pending = 0
    return merges


def bpe_train_local(
    wf: DataFrame,
    n_merges: int,
    min_pair_freq: int = 2,
    max_vocab_rows: int = 5_000_000,
) -> list[tuple[str, str]]:
    """Driver-side exact BPE trainer with delta-updated pair counts — the
    production path for realistic merge counts (30k merges are seconds
    here vs one Spark job per merge in ``bpe_train``), exact-equal to it
    by construction (same argmax rule, same left-to-right non-overlapping
    fold; equality gated in tests).

    Rationale (the union-find-hybrid precedent): BPE state is VOCAB-sized
    — the corpus was already reduced to (word, freq) by the one distributed
    pass in ``word_freqs`` — so once the vocab fits the driver (gate:
    ``max_vocab_rows``, explicit like the CC small-graph gate) the optimal
    algorithm is the in-memory delta trainer: each merge touches only the
    words containing the merged pair (tracked by an inverted index), and
    the argmax is a lazy-deletion heap, so total work is
    O(Σ touched-word lengths + merges·log P) instead of
    O(merges · vocab). ``bpe_train`` remains the path for vocabularies
    past the gate."""
    import heapq
    from collections import Counter

    n_rows = wf.count()
    if n_rows > max_vocab_rows:
        raise ValueError(
            f"vocab has {n_rows} rows > max_vocab_rows={max_vocab_rows}; "
            "use the distributed bpe_train (or raise the gate)"
        )
    rows = wf.select("word", "freq").collect()
    syms = [list(r["word"]) + [EOW] for r in rows]
    freqs = [int(r["freq"]) for r in rows]

    def word_pairs(s: list[str]) -> Counter:
        c: Counter = Counter()
        for i in range(len(s) - 1):
            c[(s[i], s[i + 1])] += 1
        return c

    counts: Counter = Counter()
    index: dict[tuple[str, str], set[int]] = {}
    for w, s in enumerate(syms):
        for p, k in word_pairs(s).items():
            counts[p] += k * freqs[w]
            index.setdefault(p, set()).add(w)

    heap = [(-c, p) for p, c in counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        while heap:
            negc, p = heapq.heappop(heap)
            if counts.get(p, 0) == -negc and -negc > 0:
                best = (p, -negc)
                break
        if best is None or best[1] < min_pair_freq:
            break
        (a, b), _c = best
        merges.append((a, b))
        merged = a + b
        touched = set()
        for w in list(index.get((a, b), ())):
            s = syms[w]
            old = word_pairs(s)
            # left-to-right non-overlapping merge (the _merge_fold scan)
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
            new = word_pairs(out)
            for p in old.keys() | new.keys():
                d = new.get(p, 0) - old.get(p, 0)
                if d:
                    counts[p] += d * freqs[w]
                    touched.add(p)
                if new.get(p, 0):
                    index.setdefault(p, set()).add(w)
                elif p in index:
                    index[p].discard(w)
        counts.pop((a, b), None)
        index.pop((a, b), None)
        for p in touched:
            if counts.get(p, 0) > 0:
                heapq.heappush(heap, (-counts[p], p))
    return merges


def bpe_segment_words(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """(word, bpe: array<string>): apply a learned merge list to each word.

    One Arrow-batched Pandas UDF over the vocab frame — the merge table
    rides the closure (broadcast-sized: it IS the tokenizer artifact), and
    the per-word scan is the same left-to-right fold as training, so
    ``bpe_segment_words(vocab, bpe_train(vocab, n))`` reproduces training's
    final symbol state exactly (pinned in tests)."""
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("array<string>")
    def seg(col: pd.Series) -> pd.Series:
        def one(word: str) -> list[str]:
            syms = list(word) + [EOW]
            while len(syms) >= 2:
                # lowest-rank (earliest-learned) applicable merge first —
                # exactly the order training applied them
                cand = [
                    (ranks[(syms[i], syms[i + 1])], i)
                    for i in range(len(syms) - 1)
                    if (syms[i], syms[i + 1]) in ranks
                ]
                if not cand:
                    break
                rank = min(c[0] for c in cand)
                a, b = merges[rank]
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        return col.map(one)

    return words.withColumn("bpe", seg(F.col("word")))


def bpe_token_counts(docs: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """(doc_id, n_bpe_tokens) under a TRAINED tokenizer (the honest version
    of the regex stand-in in ``queries_functions.q_bpe_token_counts``).

    Corpus side: explode to (doc_id, word) and equi-join the segmented
    vocab on the word — a vocabulary-keyspace shuffle (hot words combine
    map-side), never a Python call per corpus row."""
    from pulsar_replay_spark.functions.text import tokens

    vocab = word_freqs(docs)
    seg = bpe_segment_words(vocab, merges).select(
        "word", F.size("bpe").alias("n_word_tokens")
    )
    doc_words = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("word")
    ).filter(F.col("word") != "")
    return (
        docs.select("doc_id")
        .join(
            doc_words.join(seg, "word")
            .groupBy("doc_id")
            .agg(F.sum("n_word_tokens").alias("n_bpe_tokens")),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce(F.col("n_bpe_tokens"), F.lit(0)).cast("bigint").alias(
                "n_bpe_tokens"
            ),
        )
    )


def piece_ids_from_segmented(seg: DataFrame, pieces_col: str = "bpe") -> DataFrame:
    """(piece, piece_id) from ANY (word, pieces array<string>) segmented
    vocabulary — lexicographic 0-based numbering over the
    tokenizer-artifact-sized distinct-piece frame (see ``bpe_piece_ids``'s
    determinism note). Shared by the BPE/WordPiece/unigram encoders."""
    from pyspark.sql.window import Window

    pieces = seg.select(F.explode(pieces_col).alias("piece")).distinct()
    w = Window.orderBy("piece")
    return pieces.select(
        "piece", (F.row_number().over(w) - 1).cast("long").alias("piece_id")
    )


def encode_docs_from_segmented(
    docs: DataFrame,
    seg: DataFrame,
    pieces_col: str = "bpe",
    piece_ids: DataFrame | None = None,
) -> DataFrame:
    """The tokenizer-agnostic tail of ``bpe_encode_docs``: given ANY
    (word, pieces array<string>) segmented vocabulary (BPE merges,
    WordPiece greedy longest-match, unigram Viterbi — every trainer here
    emits this shape), produce (doc_id, token_ids array<long>, n_tokens).
    Same plan: vocab-scale piece→id join, corpus posexplode ⋈ word→ids,
    one doc_id-keyed order-preserving reassembly. See ``bpe_encode_docs``
    for the frozen-``piece_ids`` contract."""
    from pulsar_replay_spark.functions.text import tokens

    if piece_ids is None:
        piece_ids = piece_ids_from_segmented(seg, pieces_col)
    word_ids = (
        seg.select("word", F.posexplode(pieces_col).alias("pos", "piece"))
        .join(F.broadcast(piece_ids), "piece")
        .groupBy("word")
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "piece_id"))),
                    lambda s: F.array(s["piece_id"]),
                )
            ).alias("word_token_ids")
        )
    )
    doc_words = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("wpos", "word")
    ).filter(F.col("word") != "")
    encoded = (
        doc_words.join(word_ids, "word")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("wpos", "word_token_ids"))),
                    lambda s: s["word_token_ids"],
                )
            ).alias("token_ids")
        )
    )
    return (
        docs.select("doc_id")
        .join(encoded, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("token_ids", F.array().cast("array<long>")).alias(
                "token_ids"
            ),
            F.coalesce(F.size("token_ids"), F.lit(0)).cast("long").alias("n_tokens"),
        )
    )


def bpe_piece_ids(docs: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """(piece, piece_id): the deterministic id table of a trained BPE
    tokenizer over a corpus — every piece the merge list produces on the
    corpus vocabulary, numbered by lexicographic order (0-based). The table
    is tokenizer-artifact-sized (≤ base alphabet + |merges| + residual
    symbols), so the global row_number window is a bounded sort of a tiny
    frame, and the result persists/broadcasts like every other model
    artifact (``operators/artifacts.py``). Lexicographic numbering makes
    ids reproducible across engines and runs — no dependence on partition
    order."""
    return piece_ids_from_segmented(
        bpe_segment_words(word_freqs(docs), merges), "bpe"
    )


def bpe_encode_docs(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    piece_ids: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, token_ids array<long>, n_tokens): the corpus ENCODED under a
    trained BPE tokenizer — the id sequences a trainer actually consumes
    (``bpe_token_counts`` reports sizes; this materializes the tokens).

    Plan shape: segmentation runs over the VOCABULARY (one Arrow pass per
    distinct word, never per corpus row), per-word id arrays come from one
    vocab-scale explode + broadcast join against the piece table, and the
    corpus side is posexplode(words) ⋈ word→ids (vocabulary-keyspace join)
    followed by ONE doc_id-keyed reassembly — word order restored via
    sort_array over (position, ids) structs, a pure JVM expression. The
    output shuffle carries the encoded ids themselves; that is the product,
    not overhead. Pass a persisted ``piece_ids`` (from ``bpe_piece_ids``,
    built on the TRAINING corpus) when encoding new batches so ids stay
    stable across ingests; by default the table derives from ``docs``
    itself. Words whose pieces are absent from the provided table (unseen
    alphabet) drop those pieces' ids — filter with ``n_tokens`` vs
    ``bpe_token_counts`` when that matters; with the default table the
    situation cannot arise. Empty docs encode to an empty array."""
    vocab = word_freqs(docs)
    seg = bpe_segment_words(vocab, merges)
    if piece_ids is None:
        piece_ids = piece_ids_from_segmented(seg, "bpe")
    return encode_docs_from_segmented(docs, seg, "bpe", piece_ids)
