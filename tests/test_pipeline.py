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


@pytest.mark.slow
def test_curate_corpus_lang_model_enriches_before_per_language_stages(spark):
    """r10 (verdict #5): a raw multilingual corpus whose WARC-style rows
    land lang-less gets its NULL langs filled by the trained classifier
    BEFORE the per-language stages — the CCNet tier filter then trains and
    thresholds PER ENRICHED LANGUAGE (no doc pools under a NULL-lang LM),
    and data_card's per-lang shares reflect the model, not the ingest
    path's labeling gaps."""
    from pulsar_replay_spark.operators import classifier, quality

    en = ["the house is on the hill and it was warm for the people",
          "this is not the only way to do it in the house",
          "we have seen that it was good for the people and the dog",
          "the dog and the cat are in the garden with the children"]
    es = ["el perro y el gato están en la casa con los niños",
          "esto es muy bueno para los que no tienen nada en la casa",
          "la vida es como una caja de sorpresas para todos los niños",
          "los libros están sobre la mesa de madera en la casa"]
    train = spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(en)]
        + [(100 + i, t, "es") for i, t in enumerate(es)],
        "doc_id long, text string, lang string",
    )
    model = classifier.lang_classifier_train(train, n_iter=10)

    # the corpus under curation: same languages, NO labels on most rows
    rows = []
    for rep in range(3):  # enough docs per lang for quantile tiers
        for i, t in enumerate(en):
            rows.append((1000 + rep * 10 + i, f"{t} extra{rep}{i}", None, "warc"))
        for i, t in enumerate(es):
            rows.append((2000 + rep * 10 + i, f"{t} extra{rep}{i}", None, "warc"))
    rows.append((3000, "whatever text here", "ja", "web"))  # labeled: kept
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )

    out = pipeline.curate_corpus(
        docs, lang_model=model, budget_tokens=100_000, drop_quantile=0.0
    )
    report = {r.stage: r.n_docs for r in out["report"].collect()}
    assert report["lang_enriched"] == report["input"]  # lineage, not filter
    langs = {r.doc_id: r.lang for r in out["deduped"].collect()}
    assert langs[3000] == "ja"  # labeled rows untouched
    assert all(langs[d] == "en" for d in langs if 1000 <= d < 2000)
    assert all(langs[d] == "es" for d in langs if 2000 <= d < 3000)

    # per-language CCNet tiers over the ENRICHED corpus: every scored doc
    # buckets under its model lang, never under a NULL-lang LM
    buckets = quality.ccnet_buckets(out["deduped"]).collect()
    by_lang = {r.lang for r in buckets}
    assert "en" in by_lang and "es" in by_lang and None not in by_lang

    # data_card(lang_model=...): shares attribute the lang-less rows
    card = pipeline.data_card(docs, lang_model=model)
    shares = {r.lang: r.n_docs for r in card["by_lang"].collect()}
    assert shares.get("en") == 12 and shares.get("es") == 12
    # unenriched card for contrast: everything unlabeled pools under NULL
    raw = {r.lang: r.n_docs for r in pipeline.data_card(docs)["by_lang"].collect()}
    assert raw.get(None) == 24


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


def test_curate_media_funnel(spark):
    """The media-curation composition: corrupt blobs leave at the parse
    gate, exact sha256 copies collapse, nudged image clones collapse
    perceptually, video frames dedup perceptually — and the funnel is
    monotone with every loser accounted for."""
    import struct
    import zlib

    import numpy as np
    from pyspark.sql import functions as F

    from pulsar_replay_spark.pipeline import curate_media

    ihdr = struct.pack(">IIBBBBB", 7, 5, 8, 2, 0, 0, 0)
    png_hdr = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    rng = np.random.default_rng(3)
    body = bytes(rng.integers(0, 256, size=1024).astype(np.uint8))
    png_a = png_hdr + body
    nudged = bytearray(png_a)
    for i in range(len(png_hdr), len(nudged), 301):
        nudged[i] = min(255, nudged[i] + 2)
    png_b = bytes(nudged)  # perceptual clone of png_a
    png_c = png_hdr + bytes(rng.integers(0, 256, size=1024).astype(np.uint8))

    mp4 = (
        struct.pack(">I", 16) + b"ftypisom" + b"\x00" * 4
        + bytes(rng.integers(0, 256, size=2048).astype(np.uint8))
    )
    png_d = png_hdr + bytes(rng.integers(0, 256, size=1024).astype(np.uint8))
    rows = [
        (1, "image/png", png_a),
        (2, "image/png", png_b),     # perceptual dup of 1
        (3, "image/png", png_a),     # exact dup of 1
        (4, "image/png", png_c),     # distinct image
        (5, "video/mp4", mp4),
        (6, "video/mp4", b"\xde\xad\xbe\xef garbage"),  # unparseable
        # extensionless valid PNG: media_type is a routing HINT — the gate
        # must admit by sniffed magic bytes and repair the media_type so
        # the prefix-keyed image stages cover it
        (7, "application/octet-stream", png_d),
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    ).select(
        "doc_id", "media_type", "payload",
        F.octet_length("payload").alias("byte_len"),
        F.sha2("payload", 256).alias("sha256"),
    )
    out = curate_media(media, max_hamming=4, n_frames=3, grid=8)

    assert {r.doc_id for r in out["parsed"].select("doc_id").collect()} == {1, 2, 3, 4, 5, 7}
    repaired = {r["doc_id"]: r["media_type"] for r in out["parsed"].collect()}
    assert repaired[7] == "image/png" and repaired[5] == "video/mp4"
    assert {r.doc_id for r in out["exact_deduped"].select("doc_id").collect()} == {1, 2, 4, 5, 7}
    marks = {r["doc_id"]: r for r in out["image_marks"].collect()}
    assert marks[1]["cluster_id"] == marks[2]["cluster_id"] == 1
    assert marks[1]["keep"] and not marks[2]["keep"]
    assert marks[4]["keep"] and marks[4]["cluster_id"] == 4
    assert marks[7]["keep"] and marks[7]["cluster_id"] == 7
    assert {r.doc_id for r in out["deduped"].select("doc_id").collect()} == {1, 4, 5, 7}

    fm = out["frame_marks"].collect()
    assert {(r["doc_id"]) for r in fm} == {5} and len(fm) == 3
    assert out["frames_kept"].count() >= 1

    rep = {r["stage"]: r["n_docs"] for r in out["report"].collect()}
    assert rep["input"] == 7 and rep["parsed"] == 6
    assert rep["exact_deduped"] == 5 and rep["image_deduped"] == 4
    assert rep["frames"] == 3 and rep["frames_kept"] == out["frames_kept"].count()
    # monotone funnel over the doc stages
    assert rep["input"] >= rep["parsed"] >= rep["exact_deduped"] >= rep["image_deduped"]


def test_curate_media_passthrough_and_audio_stages(spark):
    """Recognized-but-unverifiable containers (jpeg/flac — no library-free
    header parser) route past the parse gate as their OWN accounted lane
    instead of being conflated with corrupt blobs, they still flow through
    exact + perceptual dedup via the media-type PREFIX filters, and the new
    audio stage collapses nudged audio clones."""
    import struct

    import numpy as np
    from pyspark.sql import functions as F

    from pulsar_replay_spark.pipeline import curate_media

    rng = np.random.default_rng(17)

    def wav_payload(seed: int) -> bytes:
        # real RIFF/WAVE header (passes the parse gate) + a random-walk
        # energy envelope as the data chunk — the fake 1 ms/byte signal
        lvl = np.cumsum(np.random.default_rng(seed).integers(-40, 41, 60)) % 200
        data = np.repeat(lvl, 500).astype(np.uint8).tobytes()
        return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
                + b"data" + struct.pack("<I", len(data)) + data)

    def nudged(raw: bytes, seed: int) -> bytes:
        arr = bytearray(raw)
        for i in np.random.default_rng(seed).integers(44, len(arr), 30):
            arr[i] = (arr[i] + 2) % 256
        return bytes(arr)

    jpeg_a = b"\xff\xd8\xff\xe0" + bytes(rng.integers(0, 256, 800).astype(np.uint8))
    wav_a = wav_payload(1)
    rows = [
        (1, "image/jpeg", jpeg_a),          # passthrough: no jpeg parser
        (2, "image/jpeg", jpeg_a),          # exact dup of 1, also passthrough
        (3, "audio/flac", b"fLaC" + bytes(rng.integers(0, 256, 500).astype(np.uint8))),
        (4, "audio/wav", wav_a),            # verifiable, parses
        (5, "audio/wav", nudged(wav_a, 7)), # perceptual audio clone of 4
        (6, "audio/wav", wav_payload(2)),   # distinct clip
        (7, "audio/wav", b"not riff"),      # corrupt: OUT at the parse gate
        (8, "application/pdf", b"%PDF-1.4"),  # not media: out entirely
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    ).select(
        "doc_id", "media_type", "payload",
        F.octet_length("payload").alias("byte_len"),
        F.sha2("payload", 256).alias("sha256"),
    )
    out = curate_media(media, max_hamming=4)

    assert {r.doc_id for r in out["parsed"].collect()} == {4, 5, 6}
    assert {r.doc_id for r in out["passthrough"].collect()} == {1, 2, 3}
    assert {r.doc_id for r in out["exact_deduped"].collect()} == {1, 3, 4, 5, 6}
    am = {r["doc_id"]: r for r in out["audio_marks"].collect()}
    assert am[4]["keep"] and not am[5]["keep"] and am[5]["cluster_id"] == 4
    assert am[6]["keep"]
    assert {r.doc_id for r in out["deduped"].collect()} == {1, 3, 4, 6}

    rep = {r["stage"]: r["n_docs"] for r in out["report"].collect()}
    assert rep["input"] == 8 and rep["parsed"] == 3 and rep["passthrough"] == 3
    assert rep["exact_deduped"] == 5 and rep["audio_deduped"] == 4
    # the two lanes together bound the funnel
    assert rep["parsed"] + rep["passthrough"] >= rep["exact_deduped"]


def test_curate_corpus_domain_floor(spark, documents):
    """The optional host-authority floor: docs from bottom-quantile hosts
    drop, docs from unseen hosts PASS (missing prior is not low quality),
    and the stage is accounted in the funnel report."""
    from pulsar_replay_spark.operators.graph import domain_rank

    sample = documents.limit(30).localCheckpoint(eager=True)
    ids = [r["doc_id"] for r in sample.select("doc_id").collect()]
    lows, highs, unknowns = ids[0::3], ids[1::3], ids[2::3]
    host = (
        F.when(F.col("doc_id").isin(lows), F.lit("https://spam.example/p"))
        .when(F.col("doc_id").isin(highs), F.lit("https://hub.example/p"))
        .otherwise(F.lit("https://never-linked.example/p"))
    )
    docs = sample.withColumn("source", host)
    # link graph: a 4-cycle keeps a/b/c/hub at ~full mass; spam only LINKS
    # OUT (zero in-edges) so its rank is exactly the damping base — strictly
    # below the 0.5 host-percentile threshold
    links = spark.createDataFrame(
        [("a.example", "b.example"), ("b.example", "c.example"),
         ("c.example", "hub.example"), ("hub.example", "a.example"),
         ("spam.example", "a.example")],
        "src_host string, dst_host string",
    )
    ranks = domain_rank(links, n_iter=8)
    out = pipeline.curate_corpus(
        docs, domain_ranks=ranks, domain_floor_quantile=0.5, budget_tokens=10**9
    )
    report = {r["stage"]: r["n_docs"] for r in out["report"].collect()}
    assert "domain_filtered" in report
    # out["decontaminated"] is the post-domain-floor frame when the stage
    # runs — the right place to observe the floor in isolation (later
    # stages add the TTR quality drop)
    after = {r["doc_id"] for r in out["decontaminated"].select("doc_id").collect()}
    deduped_ids = {r["doc_id"] for r in out["deduped"].select("doc_id").collect()}
    # every spam-host doc that survived dedup is gone at the domain stage
    assert not (after & set(lows)) and (deduped_ids & set(lows))
    # no unknown- or hub-host doc is dropped BY THE FLOOR
    assert (set(unknowns) & deduped_ids) <= after
    assert (set(highs) & deduped_ids) <= after


def test_data_card_reports_the_corpus(spark):
    """The release-card composition: counts/shares/dup-rate/host rollup all
    agree with directly-computed values on a planted corpus."""
    rows = [
        (1, "alpha beta gamma delta", "en", "https://a.example/1"),
        (2, "alpha beta gamma delta", "en", "https://a.example/2"),  # exact dup
        (3, "uno dos tres", "es", "https://b.example/1"),
        (4, "un deux trois quatre cinq six sept huit", "fr", "files/local.txt"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text"))
    card = pipeline.data_card(docs, length_bins=[4.0, 8.0])

    s = card["summary"].collect()[0]
    assert s["n_docs"] == 4 and s["n_langs"] == 3 and s["n_sources"] == 4
    assert s["n_tokens"] == 4 + 4 + 3 + 8
    assert s["exact_dup_rate"] == 0.25  # 1 redundant copy of 4 docs

    by_lang = {r["lang"]: r for r in card["by_lang"].collect()}
    assert by_lang["en"]["n_docs"] == 2 and by_lang["en"]["n_tokens"] == 8
    assert abs(by_lang["fr"]["token_share"] - 8 / 19) < 1e-6
    # ordered by tokens desc
    assert [r["lang"] for r in card["by_lang"].collect()][0] in ("en", "fr")

    hosts = {r["host"]: r["n_docs"] for r in card["top_hosts"].collect()}
    assert hosts["a.example"] == 2 and hosts["b.example"] == 1
    assert hosts[None] == 1  # the non-URL source is its own accounted row

    hist = {r["bin"]: r["n"] for r in card["length_hist"].collect()}
    assert hist == {0: 1, 1: 2, 2: 1}  # 3 tok | 4,4 tok | 8 tok

    q = {r["lang"]: r for r in card["quality_quartiles"].collect()}
    assert set(q) == {"en", "es", "fr"}
    assert all(r["q25"] <= r["q50"] <= r["q75"] for r in q.values())

    # r9: mojibake rates ride the card (clean corpus → all zero)
    moji = {r["source"]: r["mojibake_ratio"]
            for r in card["mojibake_by_source"].collect()}
    assert set(moji) == {src for *_, src in rows}
    assert set(moji.values()) == {0.0}


@pytest.mark.slow
def test_curate_corpus_url_dedup_stage(spark, documents):
    """url_dedup=True sheds re-fetches of the same canonical URL before any
    text hashing; non-URL sources pass untouched."""
    dup = documents.limit(5).select(
        (F.col("doc_id") + 7_000_000).alias("doc_id"),
        F.concat(F.lit("different text "), "text").alias("text"),
        "lang",
        F.lit("HTTPS://Re.Crawl.example/Page?utm_source=x").alias("source"),
        "n_chars",
    )
    first = documents.limit(5).select(
        (F.col("doc_id") + 8_000_000).alias("doc_id"),
        "text", "lang",
        F.lit("https://re.crawl.example/Page").alias("source"),
        "n_chars",
    ).limit(1)
    corpus = documents.unionByName(dup).unionByName(first)
    out = pipeline.curate_corpus(corpus, url_dedup=True, budget_tokens=10**9)
    report = {r["stage"]: r["n_docs"] for r in out["report"].collect()}
    assert "url_deduped" in report
    # the 6 same-canonical-URL rows collapse to 1; everything else passes
    assert report["input"] - report["url_deduped"] == 5


@pytest.mark.slow
def test_curate_corpus_lexical_decontamination_stage(spark):
    """The BM25 decontamination lever: a paraphrase sharing an eval doc's
    rare vocabulary (but no long exact shingle run) survives the shingle
    stage and is dropped by the lexical stage; unrelated docs survive both;
    the stage appears in the funnel report."""
    docs = spark.createDataFrame(
        [
            # paraphrase of the benchmark question: rare terms shared,
            # word order scrambled so 3-shingle overlap stays < min_overlap
            (1, "mitochondria cellular respiration powerhouse organelle of eukaryotes explained simply", "web"),
            (2, "completely unrelated sailing boat maintenance text", "web"),
            (3, "another benign doc about cooking pasta at home", "web"),
        ],
        "doc_id long, text string, source string",
    )
    benchmark = spark.createDataFrame(
        [(900, "which organelle is the powerhouse of eukaryotes mitochondria cellular respiration")],
        "doc_id long, text string",
    )
    res = pipeline.curate_corpus(
        docs,
        benchmark=benchmark,
        budget_tokens=1_000,
        min_overlap=8,
        lexical_decontaminate=True,
        lexical_min_score=1.0,
    )
    # the shingle stage kept all 3 (no 8-shingle overlap exists); the
    # lexical stage dropped exactly the paraphrase
    stage_rows = {r.stage: r.n_docs for r in res["report"].collect()}
    assert stage_rows["decontaminated"] == 3
    assert stage_rows["lexically_decontaminated"] == 2
    kept = {r.doc_id for r in res["filtered"].collect()}
    assert 1 not in kept and {2, 3} & kept
    # r8 advice: the broadcast escape hatch and the df cap thread through —
    # the shuffle-join path must drop the very same paraphrase
    res_sh = pipeline.curate_corpus(
        docs,
        benchmark=benchmark,
        budget_tokens=1_000,
        min_overlap=8,
        lexical_decontaminate=True,
        lexical_min_score=1.0,
        lexical_broadcast_queries=False,
        lexical_max_df_ratio=1.0,
    )
    stage_sh = {r.stage: r.n_docs for r in res_sh["report"].collect()}
    assert stage_sh["lexically_decontaminated"] == 2


def test_curate_corpus_compression_filter_stage(spark):
    """The deflate gate in the funnel: templated spam leaves at the
    compression stage (before the per-source quantile floor it would have
    dragged down); natural prose passes."""
    docs = spark.createDataFrame(
        [
            (1, "the committee reviewed the proposal and requested two "
                "revisions before the next quarterly meeting in september "
                "while the finance team prepared an independent vendor "
                "analysis and legal examined licensing for each region", "web"),
            (2, "migratory birds navigate by combining magnetic field "
                "sensing with celestial cues and landscape memory which "
                "lets experienced individuals correct for wind drift over "
                "open water during their long autumn crossings", "web"),
            (9, "buy now " * 200, "web"),
        ],
        "doc_id long, text string, source string",
    )
    res = pipeline.curate_corpus(
        docs, budget_tokens=10_000, drop_quantile=0.0, compression_filter=True
    )
    stage_rows = {r.stage: r.n_docs for r in res["report"].collect()}
    assert stage_rows["deduped"] == 3
    assert stage_rows["compression_filtered"] == 2
    kept = {r.doc_id for r in res["filtered"].collect()}
    assert 9 not in kept and kept == {1, 2}


@pytest.mark.slow
def test_curate_media_keep_best_policy(spark):
    """curate_media(keep_best=True): a perceptual AUDIO cluster (two
    increasing-staircase WAV clips of different lengths — energy-delta SIGNS
    agree, hamming 2) keeps its LARGEST member; default policy keeps the
    min content-hash id. Audio is the right fixture: the image sample-fake
    only collides same-length payloads, where byte_len cannot differ."""
    import struct

    from pulsar_replay_spark.operators import multimodal as mm
    from pulsar_replay_spark.pipeline import curate_media

    def wav(n_blocks):
        pcm = b"".join(bytes([10 * (i + 1)]) * 1000 for i in range(n_blocks))
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        return (
            b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm
        )

    rows = spark.createDataFrame(
        [(wav(3), "a.wav"), (wav(4), "b.wav")],
        "content binary, path string",
    ).select("path", "content")
    media = mm.media_contract_projection(rows).drop("source_path")

    default = curate_media(media, fake=True)
    best = curate_media(media, fake=True, keep_best=True)
    marks_default = {r.doc_id: r.keep for r in default["audio_marks"].collect()}
    marks_best = {r.doc_id: r.keep for r in best["audio_marks"].collect()}
    # the clips must actually collide perceptually, one keeper each way
    assert len(marks_default) == 2 and sum(marks_default.values()) == 1
    assert sum(marks_best.values()) == 1
    lens = {r.doc_id: r.byte_len for r in media.collect()}
    big_id = max(lens, key=lens.get)
    assert marks_best[big_id] is True  # largest copy wins under keep_best
    assert marks_default[min(marks_default)] is True  # default: min id
