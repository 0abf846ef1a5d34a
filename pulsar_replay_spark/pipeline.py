"""End-to-end corpus curation — the composition a training-data user
actually runs, wiring the engine's stages in their production order:

    near-dup dedup → decontamination → per-source quality-quantile filter
    → scoring (DSIR when a target corpus is given, else type-token ratio)
    → per-source token-budget selection → leakage-safe hash split
    → sequence packing of the train split

Every stage is an existing gated operator; this module adds the glue, the
stage-by-stage funnel report, and nothing else — so the composition's
correctness follows from the per-stage gates plus the invariants pinned in
``tests/test_pipeline.py`` (monotone funnel, no loser/contaminated doc
survives, budget respected, splits partition the selection, packed tokens
conserve the train split).

Scale posture: stages communicate by doc_id frames (anti-join / semi-join
joins on the primary key); no stage re-reads text it does not need, and the
expensive artifacts (dedup clusters, DSIR ratio) are built once by their
own operators' cache discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pulsar_replay_spark.operators import curation, dedup, packing, quality


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    target: DataFrame | None = None,
    drop_quantile: float = 0.25,
    drop_lm_tail: bool = False,
    semantic: bool = False,
    check_leakage: bool = False,
    budget_tokens: int = 20_000,
    seq_len: int = 64,
    n_shards: int = 8,
    min_overlap: int = 8,
    domain_ranks: DataFrame | None = None,
    domain_floor_quantile: float = 0.25,
    url_dedup: bool = False,
    lexical_decontaminate: bool = False,
    lexical_min_score: float = 2.0,
    lexical_k: int = 5,
    lexical_broadcast_queries: bool = True,
    lexical_max_df_ratio: float | None = None,
    compression_filter: bool = False,
    compression_bounds: tuple[float, float] = (0.15, 0.95),
    fix_text: bool = False,
    decontaminate_policy: str = "drop",
    dup_span_tokens: int | None = None,
    lang_model: dict | None = None,
) -> dict:
    """Run the full funnel; returns every stage frame plus a funnel report.

    Keys: deduped, decontaminated, filtered, scored, selected, split,
    packed, report (stage, n_docs rows in pipeline order)."""
    stages: list[tuple[str, DataFrame]] = [("input", docs)]

    # optional Unicode repair FIRST (r9): mojibake fix + NFC so every
    # downstream hash/quality/lang stage sees the text one clean decode
    # would have produced — a mangled copy of a clean doc re-collides in
    # exact dedup only if repair runs before hashing. Row count never
    # changes, so the stage is reported for lineage, not as a filter.
    if fix_text:
        from pulsar_replay_spark.operators.textnorm import repair_corpus

        docs = repair_corpus(docs)
        stages.append(("text_repaired", docs))

    # optional lang enrichment (r10): fill NULL lang rows under a trained
    # char-n-gram model (classifier.lang_classifier_train artifact) BEFORE
    # any per-language stage — raw-WARC corpora land lang-less, and both
    # ccnet_buckets(by=lang) here and data_card's per-lang shares read this
    # column. Row count never changes (low-coverage/OOV rows stay NULL);
    # reported for lineage, not as a filter.
    if lang_model is not None:
        from pulsar_replay_spark.operators.classifier import enrich_lang

        docs = enrich_lang(docs, lang_model)
        stages.append(("lang_enriched", docs))

    # optional URL-level pre-dedup: canonicalized source URLs shed exact
    # re-fetches BEFORE any text is hashed (the crawl pipeline's cheapest
    # stage — one shuffle on the canonical-url key, no text movement)
    if url_dedup:
        from pulsar_replay_spark.functions.urls import url_dedup_marks

        keep_ids = url_dedup_marks(docs).filter(F.col("keep")).select("doc_id")
        docs = docs.join(keep_ids, "doc_id", "left_semi")
        stages.append(("url_deduped", docs))

    deduped = dedup.dedup_corpus(docs)
    stages.append(("deduped", deduped))

    # optional any-length exact-substring scrub (r10, Lee et al.
    # arXiv:2107.06499): after doc-level dedup, remove every duplicated
    # token span of length >= dup_span_tokens (keep-first) — the repeated
    # boilerplate/quotation tail doc-level dedup can't see. Docs scrubbed
    # to nothing leave the corpus; n_chars recomputed over surviving text.
    if dup_span_tokens is not None:
        scrubbed = dedup.dup_span_scrub(deduped, min_tokens=dup_span_tokens)
        deduped = (
            deduped.drop("text", "n_chars")
            .join(
                scrubbed.filter(F.length("cleaned_text") > 0).select(
                    "doc_id", F.col("cleaned_text").alias("text")
                ),
                "doc_id",
            )
            .withColumn("n_chars", F.length("text").cast("long"))
        )
        stages.append(("dup_span_scrubbed", deduped))

    if benchmark is not None and decontaminate_policy == "scrub":
        # r9 span policy: remove only the contaminated token spans and keep
        # the rest of the doc — a page QUOTING one eval question loses the
        # quote, not the page. Fully-scrubbed docs (nothing but the quote)
        # leave the corpus; n_chars recomputed over the scrubbed text.
        scrubbed = dedup.span_decon_scrub(deduped, benchmark)
        decontaminated = (
            deduped.drop("text", "n_chars")
            .join(
                scrubbed.select(
                    "doc_id", F.col("cleaned_text").alias("text")
                ),
                "doc_id",
            )
            .filter(F.length("text") > 0)
            .withColumn("n_chars", F.length("text").cast("long"))
        )
    elif benchmark is not None:
        overlap = dedup.benchmark_overlap(deduped, benchmark, min_overlap)
        clean_ids = overlap.filter(~F.col("contaminated")).select("doc_id")
        decontaminated = deduped.join(clean_ids, "doc_id", "left_semi")
    else:
        decontaminated = deduped
    stages.append(("decontaminated", decontaminated))

    # optional second decontamination lever: BM25 against the benchmark —
    # catches the paraphrase that shares its RARE VOCABULARY with an eval
    # doc but no exact 3-shingle run (the shingle stage's blind spot).
    # lexical_min_score is corpus-dependent: a strong multi-rare-term match
    # sums well above 2.0 at realistic corpus sizes; tune on a held-out
    # sample before trusting the floor. lexical_broadcast_queries=False is
    # the escape hatch for benchmark suites whose DISTINCT vocabulary
    # outgrows an executor broadcast (see retrieval.query_postings);
    # lexical_max_df_ratio caps stopword posting lists at web scale.
    if benchmark is not None and lexical_decontaminate:
        from pulsar_replay_spark.operators import retrieval

        flagged = retrieval.lexical_decontaminate(
            decontaminated,
            benchmark,
            k=lexical_k,
            min_score=lexical_min_score,
            max_df_ratio=lexical_max_df_ratio,
            broadcast_queries=lexical_broadcast_queries,
        )
        decontaminated = decontaminated.join(
            flagged.select("doc_id"), "doc_id", "left_anti"
        )
        stages.append(("lexically_decontaminated", decontaminated))

    # optional host-authority floor (graph.domain_rank over the crawl's
    # link graph): drop docs whose source host sits in the bottom
    # domain_floor_quantile of HOSTS by rank. The threshold is an exact
    # percentile over the host-scale rank table (corpus/10³–10⁴ rows — a
    # bounded scalar collect, the funnel's established pattern); docs whose
    # host the graph never saw PASS — a missing prior is absence of
    # evidence, not low quality.
    if domain_ranks is not None:
        from pulsar_replay_spark.operators import graph

        thr = domain_ranks.agg(
            F.expr(f"percentile(rank_fp, {float(domain_floor_quantile)})")
        ).collect()[0][0]
        pri = graph.with_domain_prior(decontaminated, domain_ranks)
        keep_ids = pri.filter(
            F.col("domain_rank_fp").isNull() | (F.col("domain_rank_fp") >= thr)
        ).select("doc_id")
        decontaminated = decontaminated.join(keep_ids, "doc_id", "left_semi")
        stages.append(("domain_filtered", decontaminated))

    # optional compression gate: deflate-ratio outliers (templated spam /
    # encoded junk) out before the quantile floor — a junk-heavy source
    # would otherwise drag its own TTR threshold down and sneak junk past a
    # PER-SOURCE quantile. Two-sided; see quality.compression_signals for
    # the short-doc caveat (pair with a length floor).
    if compression_filter:
        lo, hi = compression_bounds
        decontaminated, _rej = quality.compression_gate(
            decontaminated, min_ratio=lo, max_ratio=hi
        )
        stages.append(("compression_filtered", decontaminated))

    # per-source quality floor on TTR — cheap, text-local, runs before any
    # model scoring so the scorer never sees the bottom tail
    ttr = decontaminated.select(
        "doc_id",
        "source",
        curation.default_quality_score(F.col("text")).alias("score"),
    )
    kept_ids = quality.drop_bottom_quantile(ttr, drop_quantile).select("doc_id")
    filtered = decontaminated.join(kept_ids, "doc_id", "left_semi")
    stages.append(("filtered", filtered))

    # optional CCNet LM tier filter: train a corpus bigram LM over the
    # surviving docs and drop each language's least-fluent tertile ('tail');
    # 'short' (unscoreable) docs pass through — surfaced, never dropped
    if drop_lm_tail:
        buckets = quality.ccnet_buckets(filtered)
        keep_ids = buckets.filter(F.col("bucket") != "tail").select("doc_id")
        filtered = filtered.join(keep_ids, "doc_id", "left_semi")
        stages.append(("lm_filtered", filtered))

    # optional SemDeDup stage without a learned encoder: feature-hashed doc
    # vectors feed the embedding-level semantic dedup (the bootstrap
    # composition the hashing trick exists for) — catches paraphrase-level
    # redundancy MinHash's shingle overlap misses
    if semantic:
        from pulsar_replay_spark.operators import similarity

        vecs = quality.hashed_doc_vectors(filtered)
        verdicts = similarity.semantic_dedup(vecs, threshold=0.95)
        keep_vec = verdicts.filter(F.col("keep")).select(
            F.col("vec_id").alias("doc_id")
        )
        filtered = filtered.join(keep_vec, "doc_id", "left_semi")
        stages.append(("semantic_deduped", filtered))

    # selection score: DSIR log importance weight against the target corpus
    # when given (round to 4 decimals — the bounded-cardinality property
    # select_within_token_budget's phase-1 bucketing relies on), else TTR
    if target is not None:
        w = curation.dsir_log_weights(filtered, target)
        scored = filtered.join(
            w.select("doc_id", F.round("logw", 4).alias("_score")), "doc_id"
        )
        score_col = F.col("_score")
    else:
        scored = filtered
        score_col = None
    selected = curation.select_within_token_budget(
        scored, budget_tokens, score=score_col
    )
    stages.append(("selected", selected))

    split = curation.hash_split(selected)
    train_ids = split.filter(F.col("split") == "train").select("doc_id")
    train_docs = filtered.join(train_ids, "doc_id", "left_semi")
    packed = packing.pack_token_stream(train_docs, seq_len=seq_len, n_shards=n_shards)

    report = _funnel_report(stages + [("train", train_docs)])
    out = {
        "deduped": deduped,
        "decontaminated": decontaminated,
        "filtered": filtered,
        "selected": selected,
        "split": split,
        "packed": packed,
        "report": report,
    }
    if check_leakage:
        # eval hygiene: near-dup pairs crossing the split boundary among the
        # SELECTED docs (post-dedup this should be empty — surfacing it is
        # the point: a nonzero row here means a leaked eval). The selection
        # frame is budget-shaped (no text), so re-attach text via semi-join.
        sel_docs = filtered.join(selected.select("doc_id"), "doc_id", "left_semi")
        out["leakage"] = curation.split_leakage_report(sel_docs, split)
    return out


def _funnel_report(stages: list[tuple[str, DataFrame]]) -> DataFrame:
    """(stage_idx, stage, n_docs): one count per stage, unioned in pipeline
    order — the curation funnel a data card reports."""
    parts = [
        df.agg(
            F.lit(i).alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count("*").cast("bigint").alias("n_docs"),
        )
        for i, (name, df) in enumerate(stages)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# Containers the library-free header decoder can actually verify
# (multimodal._parse_one_media). Other recognized media types (jpeg, gif,
# webm, …) have no parser here — the gate must not conflate "no parser for
# this container" with "corrupt blob".
_VERIFIABLE_CONTAINERS = ("image/png", "audio/wav", "video/mp4")


def media_parse_gate(media: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(parsed, passthrough): the media funnel's admission gate, shared by
    the one-shot ``curate_media`` and the streaming ``media_ingest_sink``
    so both admit EXACTLY the same rows. ``parsed`` = rows whose sniffed
    headers parse (corrupt blobs leave here) — including unrecognized
    media_types (e.g. an extensionless PNG) whose magic bytes verify, with
    media_type repaired from the sniffed container; ``passthrough`` =
    recognized media types the header decoder has no parser for
    (jpeg/gif/webm/…) — their own accounted lane, never conflated with
    corrupt blobs. Row-local per doc: the gate commutes with any batching,
    which is what makes the streaming twin exactly equal."""
    from pulsar_replay_spark.operators import multimodal as mm

    recognized = (
        F.col("media_type").startswith("image/")
        | F.col("media_type").startswith("audio/")
        | F.col("media_type").startswith("video/")
    )
    passthrough = media.filter(
        ~F.col("media_type").isin(*_VERIFIABLE_CONTAINERS) & recognized
    )
    # Everything else — verifiable containers AND unrecognized media_types —
    # is admitted by CONTENT: media_type is a routing hint only
    # (read_media_dir's contract), so an extensionless PNG whose magic bytes
    # sniff fine belongs in `parsed`, not the corrupt lane. The passthrough
    # lane skips the header kernel entirely (its result was never consulted
    # for those rows — no full-payload Arrow pass wasted on them).
    candidates = media.filter(
        F.col("media_type").isin(*_VERIFIABLE_CONTAINERS) | ~recognized
    )
    # distinct: the sink's stream (and read_media_dir(dedupe_content=False))
    # can carry the same content-hash doc_id on several rows — container is
    # content-determined, so the fold is exact, and it keeps the admission
    # join 1:n (like the old left_semi) instead of n:n row multiplication
    sniffed_ok = (
        mm.parse_media_headers(candidates)
        .filter(F.col("parse_ok"))
        .select("doc_id", "container")
        .distinct()
    )
    sniffed_mime = (
        F.when(F.col("container") == "png", F.lit("image/png"))
        .when(F.col("container") == "wav", F.lit("audio/wav"))
        .when(F.col("container") == "mp4", F.lit("video/mp4"))
    )
    # doc_id is the media contract's unique key (content-hash, deduped at
    # ingest), so this inner join is 1:1 admission. Rows admitted by sniff
    # alone get media_type repaired from the container so the downstream
    # prefix-keyed stages (thumbnails, fingerprints, frames) cover them.
    parsed = (
        candidates.join(sniffed_ok, "doc_id")
        .withColumn(
            "media_type",
            F.when(recognized, F.col("media_type")).otherwise(sniffed_mime),
        )
        .drop("container")
    )
    return parsed, passthrough


def curate_media(
    media: DataFrame,
    max_hamming: int = 4,
    n_frames: int = 4,
    grid: int = 8,
    fake: bool = True,
    frame_len: int = 64,
    audio_window_ms: int = 1000,
    audio_hop_ms: int = 500,
    keep_best: bool = False,
) -> dict:
    """End-to-end MEDIA curation — the multimodal twin of ``curate_corpus``,
    wiring the media tier's stages in production order:

        header parse gate → exact content dedup (sha256) →
        perceptual image near-dedup (dHash marks) →
        perceptual audio near-dedup (energy-fingerprint marks) →
        video frame sampling → perceptual frame near-dedup

    Input is the media-row contract (``read_media_dir`` / ``as_media``:
    doc_id, payload, media_type, byte_len, sha256). Returns every stage
    frame plus the funnel report:

    - ``parsed``: verifiable-container rows whose headers parse
      (``parse_ok`` — corrupt blobs leave the pipeline first, before any
      byte-heavy work);
    - ``passthrough``: recognized media types the header decoder has NO
      parser for (jpeg/gif/webm/…) — routed past the gate as their own
      accounted funnel stage, never conflated with corrupt blobs;
    - ``exact_deduped``: one row per distinct sha256 (keeper = min doc_id);
    - ``image_marks`` / ``audio_marks`` / ``deduped``: perceptual near-dup
      marks over image thumbnails (dHash) and audio clips (energy
      fingerprints), losers removed from the corpus — stage filters match
      media_type PREFIXES, so every image/* and audio/* row is covered;
    - ``frames`` / ``frame_marks``: sampled video frames and their
      perceptual dedup marks — the keep set is what a per-frame model
      (captioner, tagger) should actually run on;
    - ``report``: (stage_idx, stage, n_docs) in pipeline order, plus the
      frame stages at the end.

    Scale posture: every stage communicates by ids (semi/anti joins on
    doc_id); payload bytes are touched only by the Arrow kernels that need
    them (header sniff, thumbnail, fingerprint, frame slice) and never
    shuffle. ``fake`` switches EVERY decode seam together (thumbnails,
    audio fingerprints, frame sampling + frame thumbs) so the real and
    stubbed paths never mix within one run."""
    from pyspark.sql.window import Window

    from pulsar_replay_spark.operators import multimodal as mm

    stages: list[tuple[str, DataFrame]] = [("input", media)]

    parsed, passthrough = media_parse_gate(media)
    stages.append(("parsed", parsed))
    stages.append(("passthrough", passthrough))
    gated = parsed.unionByName(passthrough)

    w = Window.partitionBy("sha256").orderBy("doc_id")
    exact = (
        gated.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    stages.append(("exact_deduped", exact))

    thumbs = mm.resize_thumbnail(exact, width=grid, height=grid, fake=fake,
                                 fake_mode="sample")
    image_marks = mm.image_dedup(thumbs, max_hamming=max_hamming, grid=grid)
    if keep_best:
        # quality-keeper nuance: within each perceptual cluster keep the
        # LARGEST copy (byte_len ≈ resolution), not the lowest id — the
        # dedup_corpus(score=) policy for media (best_member_marks)
        image_marks = mm.best_member_marks(image_marks, exact)
    image_losers = image_marks.filter(~F.col("keep")).select("doc_id")
    image_deduped = exact.join(image_losers, "doc_id", "left_anti")
    stages.append(("image_deduped", image_deduped))

    audio_marks = mm.audio_dedup(
        image_deduped, max_hamming=max_hamming,
        window_ms=audio_window_ms, hop_ms=audio_hop_ms, fake=fake,
    )
    if keep_best:
        audio_marks = mm.best_member_marks(audio_marks, image_deduped)
    audio_losers = audio_marks.filter(~F.col("keep")).select("doc_id")
    deduped = image_deduped.join(audio_losers, "doc_id", "left_anti")
    stages.append(("audio_deduped", deduped))

    frames = mm.frame_sample(deduped, n_frames=n_frames, fake=fake,
                             frame_len=frame_len)
    frame_marks = mm.frame_dedup_perceptual(
        frames, max_hamming=max_hamming, grid=grid, fake=fake
    )
    frames_kept = frame_marks.filter(F.col("keep"))

    report = _funnel_report(stages).unionByName(
        _funnel_report([("frames", frame_marks), ("frames_kept", frames_kept)])
        .withColumn("stage_idx", F.col("stage_idx") + len(stages))
    )
    return {
        "parsed": parsed,
        "passthrough": passthrough,
        "exact_deduped": exact,
        "image_marks": image_marks,
        "audio_marks": audio_marks,
        "deduped": deduped,
        "frames": frames,
        "frame_marks": frame_marks,
        "frames_kept": frames_kept,
        "report": report,
    }


def data_card(
    docs: DataFrame,
    length_bins: list[float] | None = None,
    lang_model: dict | None = None,
    dup_span_tokens: int | None = None,
) -> dict:
    """The release artifact every published corpus ships with: one call →
    the summary frames a dataset card reports, each a small aggregate over
    ONE corpus scan family (no frame here is corpus-sized):

    - ``summary``: 1 row — docs, tokens, chars, distinct langs/sources,
      exact-duplicate rate (docs sharing a byte-identical text);
    - ``by_lang`` / ``by_source``: doc + token counts with corpus shares;
    - ``top_hosts``: doc counts per source-URL host (``graph.host_expr`` —
      NULL host = non-URL sources, reported as their own row);
    - ``length_hist``: token-count histogram over ``length_bins``
      (``quality.score_histogram``; default decade-ish edges);
    - ``quality_quartiles``: per-lang quartiles of the default TTR quality
      score (approx_percentile — exactness is not the point of a card).

    Compose with ``curate_corpus``: card the input AND the selected output,
    and the diff IS the curation story a release documents."""
    from pulsar_replay_spark.functions.text import token_count
    from pulsar_replay_spark.operators import dedup, quality
    from pulsar_replay_spark.operators.curation import default_quality_score
    from pulsar_replay_spark.operators.graph import host_expr

    # r10: a card over a raw (partially lang-less) corpus under a trained
    # model reports MODEL-enriched per-lang shares — NULL stays NULL only
    # for OOV/low-confidence rows, so `by_lang` reflects the corpus, not
    # the ingest path's labeling gaps
    if lang_model is not None:
        from pulsar_replay_spark.operators.classifier import enrich_lang

        docs = enrich_lang(docs, lang_model)

    base = docs.select(
        "doc_id",
        "lang",
        "source",
        token_count(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars"),
        default_quality_score(F.col("text")).alias("score"),
    ).localCheckpoint(eager=True)

    n_docs = F.count("*")
    dup_docs = (
        dedup.exact_dup_groups(docs)
        .agg(F.coalesce(F.sum(F.col("n_docs") - 1), F.lit(0)).alias("d"))
        .collect()[0]["d"]
    )
    summary = base.agg(
        n_docs.cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
    ).withColumn(
        "exact_dup_rate",
        F.round(F.lit(int(dup_docs)) / F.greatest(F.col("n_docs"), F.lit(1)), 6),
    )

    def _by(key: str) -> DataFrame:
        from pyspark.sql.functions import broadcast

        totals = base.agg(
            n_docs.alias("_td"), F.sum("n_tokens").alias("_tt")
        )
        return (
            base.groupBy(key)
            .agg(
                F.count("*").cast("bigint").alias("n_docs"),
                F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            )
            .crossJoin(broadcast(totals))  # 1-row stat join, engine pattern
            .select(
                key,
                "n_docs",
                "n_tokens",
                F.round(F.col("n_docs") / F.col("_td"), 6).alias("doc_share"),
                F.round(F.col("n_tokens") / F.col("_tt"), 6).alias("token_share"),
            )
            .orderBy(F.desc("n_tokens"), key)
        )

    # built from the checkpointed projection, not the raw docs — the raw
    # frame would re-scan the full input (text column included) per collect
    top_hosts = (
        base.select(host_expr(F.col("source")).alias("host"))
        .groupBy("host")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .orderBy(F.desc("n_docs"), "host")
    )
    bins = length_bins or [16.0, 64.0, 256.0, 1024.0, 4096.0]
    length_hist = quality.score_histogram(
        base.select(F.col("n_tokens").cast("double").alias("score")), bins
    ).orderBy("bin")
    quality_quartiles = (
        base.groupBy("lang")
        .agg(F.percentile_approx("score", [0.25, 0.5, 0.75]).alias("_q"))
        .select(
            "lang",
            F.round(F.col("_q")[0], 4).alias("q25"),
            F.round(F.col("_q")[1], 4).alias("q50"),
            F.round(F.col("_q")[2], 4).alias("q75"),
        )
        .orderBy("lang")
    )
    # r9: per-source mojibake rate (pure-Catalyst marker scan over the raw
    # docs — `base` dropped the text column; a card reader uses this to
    # decide whether the corpus needs a fix_text pass before release)
    from pulsar_replay_spark.operators.textnorm import mojibake_report

    card = {
        "summary": summary,
        "by_lang": _by("lang"),
        "by_source": _by("source"),
        "top_hosts": top_hosts,
        "length_hist": length_hist,
        "quality_quartiles": quality_quartiles,
        "mojibake_by_source": mojibake_report(docs).orderBy("source"),
    }
    # r10, opt-in (it costs a positioned-k-gram pass over the corpus —
    # unlike every other card frame, NOT a cheap aggregate): the Lee et al.
    # duplication headline, "what fraction of tokens sit inside a
    # duplicated span of >= k tokens"
    if dup_span_tokens is not None:
        card["dup_span_stats"] = dedup.dup_span_stats(
            docs, min_tokens=dup_span_tokens
        )
    return card
