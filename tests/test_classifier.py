"""Gates for the in-engine linear quality classifier.

The load-bearing check is the numpy mirror: the distributed training loop
(broadcast-join margins, bounded bucket-keyed gradient collects) must
compute THE SAME gradient descent a single-machine numpy implementation
does on the same feature matrix — within floating tolerance, since group
summation order differs between engines.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pulsar_replay_spark.operators import classifier


@pytest.fixture(scope="module")
def weak_corpus(spark):
    # Planted separable vocabularies: "good" docs share clean-prose tokens,
    # "spam" docs share junk tokens; a linear bag model must separate them.
    pos_rows = [
        (i, f"the quiet library holds many careful essays volume {i % 7}")
        for i in range(40)
    ]
    neg_rows = [
        (i, f"click winner free prize now claim bonus code {i % 7}") for i in range(40)
    ]
    pos = spark.createDataFrame(pos_rows, "doc_id int, text string")
    neg = spark.createDataFrame(neg_rows, "doc_id int, text string")
    return pos, neg


def _collect_feats(feats):
    return [(r["doc_id"], r["bucket"], r["x"]) for r in feats.collect()]


def _numpy_train(rows, labels, n_iter, lr, l2):
    """Reference GD on the exact same (doc, bucket, x) triples."""
    docs = sorted({d for d, _, _ in rows})
    buckets = sorted({b for _, b, _ in rows})
    di = {d: i for i, d in enumerate(docs)}
    bi = {b: i for i, b in enumerate(buckets)}
    X = np.zeros((len(docs), len(buckets)))
    for d, b, x in rows:
        X[di[d], bi[b]] += x
    y = np.array([labels[d] for d in docs])
    w = np.zeros(len(buckets))
    bias = 0.0
    for _ in range(n_iter):
        p = 1.0 / (1.0 + np.exp(-(X @ w + bias)))
        r = p - y
        grad = X.T @ r / len(docs) + l2 * w
        w -= lr * grad
        bias -= lr * r.mean()
    return {b: w[bi[b]] for b in buckets}, bias


def test_training_matches_numpy_mirror(spark, weak_corpus):
    pos, neg = weak_corpus
    docs = pos.select(
        F.concat(F.lit("p:"), F.col("doc_id").cast("string")).alias("doc_id"), "text"
    ).unionByName(
        neg.select(
            F.concat(F.lit("n:"), F.col("doc_id").cast("string")).alias("doc_id"),
            "text",
        )
    )
    feats = classifier.doc_features(docs)
    labels_df = docs.select(
        "doc_id",
        F.when(F.col("doc_id").startswith("p:"), 1.0).otherwise(0.0).alias("label"),
    )
    n_iter, lr, l2 = 15, 2.0, 1e-4
    weights, bias = classifier.lr_train(feats, labels_df, n_iter=n_iter, lr=lr, l2=l2)

    rows = _collect_feats(feats)
    labels = {r["doc_id"]: r["label"] for r in labels_df.collect()}
    want_w, want_b = _numpy_train(rows, labels, n_iter, lr, l2)

    got_w = {r["bucket"]: r["w"] for r in weights.collect()}
    assert abs(bias - want_b) < 1e-6
    assert set(got_w) == set(want_w)
    for b in want_w:
        assert abs(got_w[b] - want_w[b]) < 1e-6, b


@pytest.mark.slow
def test_separates_planted_vocabularies(spark, weak_corpus):
    pos, neg = weak_corpus
    weights, bias = classifier.train_quality_classifier(pos, neg, n_iter=30)
    docs = pos.select(
        F.concat(F.lit("p:"), F.col("doc_id").cast("string")).alias("doc_id"), "text"
    ).unionByName(
        neg.select(
            F.concat(F.lit("n:"), F.col("doc_id").cast("string")).alias("doc_id"),
            "text",
        )
    )
    scored = classifier.lr_score(classifier.doc_features(docs), weights, bias)
    verdicts = {r["doc_id"]: r["score"] for r in scored.collect()}
    assert all(v > 0.5 for d, v in verdicts.items() if d.startswith("p:"))
    assert all(v < 0.5 for d, v in verdicts.items() if d.startswith("n:"))


@pytest.mark.slow
def test_scoring_generalizes_to_held_out_docs(spark, weak_corpus):
    pos, neg = weak_corpus
    weights, bias = classifier.train_quality_classifier(pos, neg, n_iter=30)
    held_out = spark.createDataFrame(
        [
            ("h-good", "careful essays in the quiet library"),
            ("h-spam", "free bonus prize click now"),
        ],
        "doc_id string, text string",
    )
    scored = {
        r["doc_id"]: r["score"]
        for r in classifier.lr_score(
            classifier.doc_features(held_out), weights, bias
        ).collect()
    }
    assert scored["h-good"] > 0.5 > scored["h-spam"]


def test_training_deterministic_under_repartitioning(spark, weak_corpus):
    pos, neg = weak_corpus
    w1, b1 = classifier.train_quality_classifier(pos, neg, n_iter=5)
    w2, b2 = classifier.train_quality_classifier(
        pos.repartition(7), neg.repartition(3), n_iter=5
    )
    g1 = {r["bucket"]: r["w"] for r in w1.collect()}
    g2 = {r["bucket"]: r["w"] for r in w2.collect()}
    assert abs(b1 - b2) < 1e-9
    assert set(g1) == set(g2)
    for b in g1:
        assert abs(g1[b] - g2[b]) < 1e-9


def test_serving_plan_broadcasts_weights_no_cartesian(spark, weak_corpus):
    pos, neg = weak_corpus
    weights, bias = classifier.train_quality_classifier(pos, neg, n_iter=2)
    scored = classifier.lr_score(
        classifier.doc_features(pos.select("doc_id", "text")), weights, bias
    )
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.slow
def test_calibration_report(spark, documents):
    """On the planted-vocabulary training task the classifier must be
    directionally calibrated: high-score bins observe higher positive rates
    than low-score bins, bin counts partition the labeled set, and each
    bin's Brier term equals its members' mean squared error (cross-checked
    in python)."""
    pos = documents.filter(F.col("doc_id") % 2 == 0).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zebrafied zebrafied"))
    )
    neg = documents.filter(F.col("doc_id") % 2 == 1)
    weights, bias = classifier.train_quality_classifier(pos, neg, n_iter=30)
    corpus = pos.unionByName(neg)
    scored = classifier.lr_score(classifier.doc_features(corpus), weights, bias)
    labels = corpus.select(
        "doc_id", (F.col("doc_id") % 2 == 0).cast("int").alias("label")
    )
    rep = classifier.calibration_report(scored, labels, n_bins=10).collect()
    assert sum(r["n"] for r in rep) == corpus.count()
    by_bin = sorted(rep, key=lambda r: r["bin"])
    assert len(by_bin) >= 2
    # directional calibration: the lowest occupied bin observes a lower
    # positive rate than the highest occupied bin, and predicted means
    # increase with the bin index by construction
    assert by_bin[0]["observed_rate"] < by_bin[-1]["observed_rate"]
    preds = [r["mean_predicted"] for r in by_bin]
    assert preds == sorted(preds)
    rows = {r["doc_id"]: (r["score"], ) for r in scored.collect()}
    lab = {r["doc_id"]: r["label"] for r in labels.collect()}
    import collections
    agg = collections.defaultdict(list)
    for d, (s,) in rows.items():
        b = min(int(s * 10), 9)
        agg[b].append((s - lab[d]) ** 2)
    for r in rep:
        assert abs(r["brier"] - round(sum(agg[r["bin"]]) / len(agg[r["bin"]]), 6)) < 2e-6


# ---------------------------------------------------------------------------
# r9: trainable language classifier (char-n-gram one-vs-rest head)
# ---------------------------------------------------------------------------

_LANG_SENTS = {
    "en": ["the house is on the hill and it was warm",
           "this is not the only way to do it",
           "we have seen that it was good for the people",
           "the dog and the cat are in the garden"],
    "es": ["el perro y el gato están en la casa con los niños",
           "esto es muy bueno para los que no tienen nada",
           "la vida es como una caja de sorpresas para todos",
           "los libros están sobre la mesa de madera"],
    "de": ["der hund und die katze sind nicht in dem haus",
           "das ist ein gutes buch für die kinder und eltern",
           "die sonne scheint nicht auf den alten garten",
           "ein mann ist zu dem großen haus gegangen"],
    "fr": ["le chien et le chat sont dans la maison pour une heure",
           "c'est une bonne chose pour les enfants qui ne dorment pas",
           "les livres sont sur la table dans le salon",
           "une femme est dans le jardin avec les fleurs"],
}


def _lang_rows():
    rows, i = [], 0
    for lang, sents in sorted(_LANG_SENTS.items()):
        for s in sents:
            rows.append((i, s, lang))
            i += 1
    return rows


def _numpy_lang_train(feat_rows, doc_lang, langs, n_iter, lr, l2):
    """Reference joint one-vs-rest GD on the exact (doc, bucket, x)
    triples — K sigmoid columns, shared feature matrix."""
    docs = sorted({d for d, _, _ in feat_rows})
    buckets = sorted({b for _, b, _ in feat_rows})
    di = {d: i for i, d in enumerate(docs)}
    bi = {b: i for i, b in enumerate(buckets)}
    X = np.zeros((len(docs), len(buckets)))
    for d, b, x in feat_rows:
        X[di[d], bi[b]] += x
    Y = np.zeros((len(docs), len(langs)))
    for d in docs:
        Y[di[d], langs.index(doc_lang[d])] = 1.0
    W = np.zeros((len(buckets), len(langs)))
    bias = np.zeros(len(langs))
    for _ in range(n_iter):
        P = 1.0 / (1.0 + np.exp(-(X @ W + bias)))
        R = P - Y
        W -= lr * (X.T @ R / len(docs) + l2 * W)
        bias -= lr * R.mean(axis=0)
    return W, bias, di, bi


def test_lang_classifier_matches_numpy_mirror_and_classifies(spark):
    rows = _lang_rows()
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    n_iter, lr, l2 = 6, 2.0, 1e-4
    model = classifier.lang_classifier_train(docs, n_iter=n_iter, lr=lr, l2=l2)
    langs = model["langs"]
    assert langs == sorted(_LANG_SENTS)

    feat_rows = _collect_feats(classifier.char_ngram_features(docs))
    doc_lang = {d: lang for d, _s, lang in rows}
    W, bias, di, bi = _numpy_lang_train(
        feat_rows, doc_lang, langs, n_iter, lr, l2
    )
    got_w = {
        (r["lang"], r["bucket"]): r["w"] for r in model["weights"].collect()
    }
    for (lang, bucket), v in got_w.items():
        assert abs(v - W[bi[bucket], langs.index(lang)]) < 1e-6
    for lang in langs:
        assert abs(model["bias"][lang] - bias[langs.index(lang)]) < 1e-6

    # training-set classification is perfect on the separable corpus
    pred = {
        r["doc_id"]: r["lang_pred"]
        for r in classifier.lang_classify(docs, model).collect()
    }
    assert pred == {d: lang for d, _s, lang in rows}


@pytest.mark.slow
def test_lang_classifier_generalizes_and_abstains(spark):
    rows = _lang_rows()
    train = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    model = classifier.lang_classifier_train(train, n_iter=10)
    holdout = spark.createDataFrame(
        [
            (100, "the cat is not in the house and the dog was away", "en"),
            (101, "los perros no están en la casa de los abuelos", "es"),
            (102, "die kinder sind in dem garten und das ist gut", "de"),
            (103, "les chats ne sont pas dans la maison avec une dame", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    pred = {
        r["doc_id"]: r["lang_pred"]
        for r in classifier.lang_classify(holdout, model).collect()
    }
    assert pred == {100: "en", 101: "es", 102: "de", 103: "fr"}

    # gibberish abstains on FEATURE COVERAGE: its n-gram buckets are
    # unseen, so coverage ~ 0 regardless of how the biases score
    gib = spark.createDataFrame(
        [(900, "zzqx wqv kkjj pzt")], "doc_id long, text string"
    )
    out = classifier.lang_classify(gib, model).collect()[0]
    assert out["lang_pred"] is None and out["coverage"] < 0.2
    # real holdout text is well-covered by the trained vocabulary
    covs = {r.doc_id: r.coverage
            for r in classifier.lang_classify(holdout, model).collect()}
    assert all(c > 0.5 for c in covs.values())
    # a score threshold stacks on top of the coverage floor
    thr = classifier.lang_classify(holdout, model, threshold=1.01).collect()
    assert all(r.lang_pred is None for r in thr)


def test_lang_coverage_saturation(spark):
    """The OOV-abstain contract holds BECAUSE lang models default to a
    sparse hash space (LANG_HEX): pins both regimes on one non-toy corpus.

    At hex_chars=3 (the DSIR 4096-bucket space) a corpus with ~10k distinct
    char n-grams populates essentially every bucket, so gibberish in an
    unseen alphabet still 'covers' ≈ occupancy ≈ 1 and min_coverage never
    abstains — the saturation failure mode. The same corpus at the LANG_HEX
    default occupies ~1% of the space, so the same gibberish covers ≈ 0 and
    abstains. coverage_w_floor is the documented partial mitigation knob
    for small-space models; here we pin the primary (hash-space) fix."""
    import hashlib

    # deterministic pseudo-random a-z text: wide alphabet → ~10k distinct
    # char 2/3-grams across 300 docs of 60 chars
    def _txt(i):
        h = b""
        while len(h) < 30:
            h += hashlib.md5(f"sat:{i}:{len(h)}".encode()).digest()
        return "".join(chr(ord("a") + b % 26) for b in h[:60])

    rows = [(i, _txt(i), "a" if i % 2 == 0 else "b") for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    # n_iter=1 suffices: coverage depends only on which buckets carry
    # weight, and one gradient collect populates every trained bucket
    sat = classifier.lang_classifier_train(docs, n_iter=1, hex_chars=3)
    sparse = classifier.lang_classifier_train(docs, n_iter=1)
    assert sparse["hex_chars"] == classifier.LANG_HEX
    # gibberish from an alphabet the corpus never used (digits)
    gib = spark.createDataFrame(
        [(9000, "0192 8374 6550 1928 3746 5501")], "doc_id long, text string"
    )
    sat_cov = classifier.lang_classify(gib, sat).collect()[0]["coverage"]
    sparse_row = classifier.lang_classify(gib, sparse).collect()[0]
    assert sat_cov > 0.6, "4096-bucket space should saturate on this corpus"
    assert sparse_row["coverage"] < 0.2 and sparse_row["lang_pred"] is None
    # known-vocabulary text stays fully covered under the sparse space
    known = spark.createDataFrame(
        [(9001, _txt(17))], "doc_id long, text string"
    )
    assert classifier.lang_classify(known, sparse).collect()[0]["coverage"] > 0.9


def test_lang_model_save_load_roundtrip(spark, tmp_path):
    """A persisted model classifies byte-identically to the in-memory
    one — the persistable-artifact claim, pinned."""
    rows = _lang_rows()
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    model = classifier.lang_classifier_train(docs, n_iter=4)
    path = str(tmp_path / "lang_model")
    classifier.save_lang_model(model, path)
    loaded = classifier.load_lang_model(spark, path)
    assert loaded["langs"] == model["langs"]
    assert loaded["bias"] == pytest.approx(model["bias"])
    a = {(r.doc_id, r.lang_pred, r.score)
         for r in classifier.lang_classify(docs, model).collect()}
    b = {(r.doc_id, r.lang_pred, r.score)
         for r in classifier.lang_classify(docs, loaded).collect()}
    assert a == b


@pytest.mark.slow
def test_enrich_lang_fills_only_null_rows(spark):
    """The front-door composition: NULL-lang docs get the model's
    prediction, labeled docs pass through verbatim, low-confidence stays
    NULL, and the column set is unchanged."""
    model = classifier.lang_classifier_train(
        spark.createDataFrame(_lang_rows(), "doc_id long, text string, lang string"),
        n_iter=10,
    )
    docs = spark.createDataFrame(
        [
            (1, "los perros no están en la casa de los abuelos", None, "w", 1),
            (2, "the cat is not in the house and the dog was away", None, "w", 1),
            (3, "whatever text", "ja", "w", 1),  # labeled: untouched
            (4, "zzqx wqv kkjj pzt", None, "w", 1),  # OOV: low coverage
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = classifier.enrich_lang(docs, model)
    assert out.columns == docs.columns
    got = {r.doc_id: r.lang for r in out.collect()}
    assert got == {1: "es", 2: "en", 3: "ja", 4: None}
