"""Linear quality classifier over hashed n-gram features, trained in-engine.

The CCNet/RefinedWeb curation recipe scores documents with a fastText-style
linear classifier (Joulin et al., arXiv:1607.01759) trained on weak labels
("looks like Wikipedia" vs "looks like raw crawl"). This is that filter
re-expressed as the engine's own distributed training loop — no external
model artifact, no MLlib dependency, exactly mirrorable by numpy for tests:

- **features** are the same hashed unigram+bigram buckets DSIR uses
  (`curation.dsir_features`, keyspace = 16^hex ≤ 4096), length-normalized
  per doc so the feature matrix row is a distribution, not a count vector.
  One corpus-sized map-side-combined shuffle, identical to DSIR's cost.
- **training** is full-batch gradient descent on logistic loss + L2. Each
  iteration: per-doc margin = one broadcast join of the bounded weight
  table + one doc_id groupBy; per-bucket gradient = one bucket groupBy
  whose keyspace is the FIXED bucket count — the collect that follows is
  ≤ 16^hex rows per iteration regardless of corpus size (same bounded-
  collect posture as DSIR's ratio table and k-means' (cell,dim) reduce).
  The weight vector lives on the driver between iterations and rides back
  as a broadcast literal frame: the corpus shuffles once (the cached
  feature build); iterations touch only doc_id- and bucket-keyed
  aggregates of it.
- **serving** is one broadcast join + groupBy per scored batch, the same
  shape as `curation.dsir_score` — and like DSIR the trained weight table
  is a persistable model artifact.

Weak labels come from anywhere: a curated positive corpus vs a random
crawl sample (the classic recipe), or any (doc_id, label) frame.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pulsar_replay_spark.operators.curation import DSIR_HEX


def doc_features(docs: DataFrame, hex_chars: int = DSIR_HEX) -> DataFrame:
    """(doc_id, bucket, x): length-normalized hashed-n-gram features.

    x_b = cnt_b / Σ_b cnt_b per document, so every doc contributes unit
    mass to the gradient no matter its length (the fastText bag-average).

    Normalization costs zero extra shuffles: each exploded gram carries its
    per-gram increment ``1/size(grams)`` (a pure projection computed BEFORE
    the explode) and the single (doc, bucket) combine sums it — so x_b
    arrives normalized out of the one map-side-combined aggregation.
    Measured at the 10× rehearsal (50k docs): 12 s vs 20 s for the
    doc_id-Window-over-exploded-relation formulation (which re-shuffles and
    sorts the whole feature table) and 28 s for carrying the total through
    the aggregate as a ``first()`` column.
    """
    from pulsar_replay_spark.functions.text import bigrams, tokens

    grams = F.concat(tokens(F.col("text")), bigrams(F.col("text")))
    return (
        docs.select("doc_id", grams.alias("gs"))
        .select(
            "doc_id",
            (F.lit(1.0) / F.size("gs")).alias("inc"),
            F.explode("gs").alias("g"),
        )
        .select("doc_id", "inc", F.substring(F.md5("g"), 1, hex_chars).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.sum("inc").alias("x"))
    )


def lr_train(
    feats: DataFrame,
    labels: DataFrame,
    n_iter: int = 30,
    lr: float = 2.0,
    l2: float = 1e-4,
) -> tuple[DataFrame, float]:
    """Full-batch logistic regression; returns (weights(bucket, w), bias).

    ``labels`` is (doc_id, label∈{0.0, 1.0}). Deterministic: gradient
    per bucket is a floating sum over docs — Spark's combine order can
    differ run-to-run, so exact bit-equality is not promised, but tests
    pin equality to a numpy mirror within 1e-6 (30 iterations keep the
    conditioning benign).
    """
    spark = feats.sparkSession
    # One materialization feeds every iteration; labels ride along so the
    # per-doc join happens once, not per iteration.
    fl = (
        feats.join(labels, "doc_id")
        .select("doc_id", "bucket", "x", F.col("label").cast("double").alias("y"))
        .localCheckpoint(eager=True)
    )
    n_docs = fl.select("doc_id").distinct().count()
    if n_docs == 0:
        raise ValueError("lr_train: empty training set")

    w: dict[str, float] = {}
    bias = 0.0
    for _ in range(n_iter):
        if w:
            wdf = spark.createDataFrame(list(w.items()), "bucket string, w double")
            joined = fl.join(F.broadcast(wdf), "bucket", "left").withColumn(
                "w", F.coalesce(F.col("w"), F.lit(0.0))
            )
        else:
            joined = fl.withColumn("w", F.lit(0.0))
        per_doc = joined.groupBy("doc_id", "y").agg(
            F.sum(F.col("w") * F.col("x")).alias("margin")
        )
        resid = per_doc.select(
            "doc_id",
            (
                F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("margin") + F.lit(bias))))
                - F.col("y")
            ).alias("r"),
        )
        # Gradient keyspace = bucket count (bounded by 16^hex), so this
        # groupBy + collect is constant-sized in the corpus.
        grad_rows = (
            fl.join(resid, "doc_id")
            .groupBy("bucket")
            .agg(F.sum(F.col("r") * F.col("x")).alias("g"))
            .collect()
        )
        grad_b = resid.agg(F.avg("r")).first()[0]
        for row in grad_rows:
            b = row["bucket"]
            w[b] = w.get(b, 0.0) - lr * (row["g"] / n_docs + l2 * w.get(b, 0.0))
        bias -= lr * grad_b
    weights = spark.createDataFrame(
        [(b, v) for b, v in sorted(w.items())], "bucket string, w double"
    ).localCheckpoint(eager=True)
    return weights, bias


def lr_score(feats: DataFrame, weights: DataFrame, bias: float) -> DataFrame:
    """(doc_id, score): P(label=1) for each doc — one broadcast join +
    one doc_id groupBy, the serving shape shared with dsir_score."""
    margin = (
        feats.join(F.broadcast(weights), "bucket", "left")
        .withColumn("w", F.coalesce(F.col("w"), F.lit(0.0)))
        .groupBy("doc_id")
        .agg(F.sum(F.col("w") * F.col("x")).alias("margin"))
    )
    return margin.select(
        "doc_id",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("margin") + F.lit(bias))))).alias(
            "score"
        ),
    )


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    hex_chars: int = DSIR_HEX,
    n_iter: int = 30,
    lr: float = 2.0,
    l2: float = 1e-4,
) -> tuple[DataFrame, float]:
    """The classic weak-label recipe: positives (curated corpus) vs
    negatives (crawl sample) → (weights, bias). Doc ids from the two
    frames are namespaced so collisions between corpora cannot cross-label.
    """
    pos = positive.select(
        F.concat(F.lit("p:"), F.col("doc_id").cast("string")).alias("doc_id"), "text"
    )
    neg = negative.select(
        F.concat(F.lit("n:"), F.col("doc_id").cast("string")).alias("doc_id"), "text"
    )
    docs = pos.unionByName(neg)
    labels = docs.select(
        "doc_id",
        F.when(F.col("doc_id").startswith("p:"), F.lit(1.0)).otherwise(F.lit(0.0)).alias("label"),
    )
    feats = doc_features(docs, hex_chars)
    return lr_train(feats, labels, n_iter=n_iter, lr=lr, l2=l2)


def sigmoid(z: float) -> float:
    return 1.0 / (1.0 + math.exp(-z))


def calibration_report(
    scored: DataFrame, labels: DataFrame, n_bins: int = 10
) -> DataFrame:
    """Reliability diagram data for a trained classifier: bucket P(y=1)
    scores into ``n_bins`` equal-width bins and report each bin's mean
    predicted probability vs observed positive rate (+ Brier contribution)
    — the calibration evidence a quality-filter threshold is set from.

    ``scored`` = lr_score output; ``labels`` = (doc_id, label∈{0,1}).
    One equi-join + one |bins|-key agg (map-side combined) — report cost is
    bin-keyspace-sized at any corpus size."""
    joined = scored.join(labels, "doc_id").withColumn(
        "bin",
        F.least(
            F.floor(F.col("score") * n_bins).cast("int"), F.lit(n_bins - 1)
        ),
    )
    return joined.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.avg("score"), 6).alias("mean_predicted"),
        F.round(F.avg(F.col("label").cast("double")), 6).alias("observed_rate"),
        F.round(F.avg(F.pow(F.col("score") - F.col("label"), 2)), 6).alias("brier"),
    )


# ---------------------------------------------------------------------------
# Trainable language classifier (r9): the fastText lang-id recipe —
# char-n-gram hashed features + a linear one-vs-rest head — trained with
# the SAME bounded-collect loop as `lr_train`, but all K classes jointly:
# one iteration costs one broadcast join + one (bucket, class) aggregate
# whose keyspace is 16^hex · K, constant in the corpus. This is the
# trainable upgrade of the two heuristics already in the engine (the
# stopword-density `lang_id_accuracy` contract query and
# `functions.text.lang_guess`): char n-grams see scripts and morphology,
# so it generalizes past any hand-listed stopword set.
# ---------------------------------------------------------------------------


def char_ngrams(text, n: int):
    """All lowercased character n-grams of a text column (spaces included —
    they carry word-boundary signal); empty array below n chars. Bound-array
    idiom: no CSE inside HOF lambdas, so lower(text) materializes once."""

    def inner(t):
        return F.when(
            F.length(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.length(t) - (n - 1)),
                lambda i: F.substr(t, i, F.lit(n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.transform(F.array(F.lower(text)), inner)[0]


# Lang models hash into a LARGER space than DSIR/quality features: the
# coverage-based OOV abstain only works while trained buckets are SPARSE in
# the hash space. At 16^3 = 4096 buckets any non-toy corpus populates
# essentially every bucket, so every input — gibberish included — lands on
# trained buckets and coverage saturates at ~1.0 (the fastText analogue:
# its 2M-bucket table stays sparse for the same reason). 16^5 ≈ 1M buckets
# keeps a real char-2/3-gram vocabulary (tens of thousands of grams) at
# ~1-5% occupancy, so unseen-script coverage ≈ occupancy ≈ 0. Cost is
# unchanged: every per-iteration collect and the weight table are bounded
# by DISTINCT TRAINED grams, not by the hash space.
LANG_HEX = 5


def char_ngram_features(
    docs: DataFrame, ns: tuple[int, ...] = (2, 3), hex_chars: int = LANG_HEX
) -> DataFrame:
    """(doc_id, bucket, x): length-normalized hashed char-n-gram features —
    `doc_features`' shape with character grams. One map-side-combined
    shuffle; per-gram increment 1/total computed before the explode."""
    grams = F.concat(*[char_ngrams(F.col("text"), n) for n in ns])
    return (
        docs.select("doc_id", grams.alias("gs"))
        .filter(F.size("gs") > 0)
        .select(
            "doc_id",
            (F.lit(1.0) / F.size("gs")).alias("inc"),
            F.explode("gs").alias("g"),
        )
        .select("doc_id", "inc", F.substring(F.md5("g"), 1, hex_chars).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.sum("inc").alias("x"))
    )


def lang_classifier_train(
    docs: DataFrame,
    n_iter: int = 20,
    lr: float = 2.0,
    l2: float = 1e-4,
    hex_chars: int = LANG_HEX,
    ns: tuple[int, ...] = (2, 3),
) -> dict:
    """Train the one-vs-rest head jointly over every label in ``docs.lang``.

    Returns {"weights": DataFrame(lang, bucket, w), "bias": {lang: b},
    "langs": [...], "hex_chars": ..., "ns": ...} — a persistable model
    (write the weights frame, json the rest).

    Plan shape per iteration: the cached (doc_id, bucket, x, lang) feature
    table joins the broadcast (bucket, lang_c, w) weight table — K weight
    rows per bucket fan each feature row out to K class margins, so one
    groupBy (doc_id, lang_c) yields every class's margin in ONE pass; the
    gradient groupBy (bucket, lang_c) collects ≤ |distinct trained grams|·K
    rows (the corpus's char-n-gram vocabulary, NOT the 16^hex hash space —
    only occupied buckets appear in the feature table). Driver holds those
    same floats between iterations (the `lr_train` discipline, K-wide)."""
    spark = docs.sparkSession
    labeled = docs.filter(F.col("lang").isNotNull())
    feats = char_ngram_features(labeled, ns, hex_chars)
    fl = (
        feats.join(labeled.select("doc_id", "lang"), "doc_id")
        .localCheckpoint(eager=True)
    )
    langs = sorted(r.lang for r in fl.select("lang").distinct().collect())
    if not langs:
        raise ValueError("lang_classifier_train: no labeled docs")
    n_docs = fl.select("doc_id").distinct().count()
    classes = spark.createDataFrame([(l,) for l in langs], "lang_c string")

    w: dict[tuple[str, str], float] = {}
    bias: dict[str, float] = {l: 0.0 for l in langs}
    for _ in range(n_iter):
        if w:
            # after the first gradient collect, w holds EVERY (class,
            # bucket) pair of the cached feature table (the gradient
            # groupBy fans each bucket to all K classes), so this inner
            # join is complete — no missing-bucket fan-out needed
            wdf = spark.createDataFrame(
                [(l, b, v) for (l, b), v in w.items()],
                "lang_c string, bucket string, w double",
            )
            fanned = fl.join(F.broadcast(wdf), "bucket")
        else:
            # iteration 1: all weights are zero — fan every feature row to
            # every class directly
            fanned = fl.crossJoin(F.broadcast(classes)).withColumn(
                "w", F.lit(0.0)
            )
        bias_df = spark.createDataFrame(
            [(l, b) for l, b in bias.items()], "lang_c string, b double"
        )
        per = (
            fanned.groupBy("doc_id", "lang", "lang_c")
            .agg(F.sum(F.col("w") * F.col("x")).alias("margin"))
            .join(F.broadcast(bias_df), "lang_c")
        )
        resid = per.select(
            "doc_id",
            "lang_c",
            (
                F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("margin") + F.col("b"))))
                - (F.col("lang") == F.col("lang_c")).cast("double")
            ).alias("r"),
        )
        grad_rows = (
            fl.join(resid, "doc_id")
            .groupBy("bucket", "lang_c")
            .agg(F.sum(F.col("r") * F.col("x")).alias("g"))
            .collect()
        )
        grad_bias = {
            row["lang_c"]: row["gb"]
            for row in resid.groupBy("lang_c").agg(F.avg("r").alias("gb")).collect()
        }
        for row in grad_rows:
            key = (row["lang_c"], row["bucket"])
            w[key] = w.get(key, 0.0) - lr * (
                row["g"] / n_docs + l2 * w.get(key, 0.0)
            )
        for l in langs:
            bias[l] -= lr * grad_bias.get(l, 0.0)
    weights = spark.createDataFrame(
        [(l, b, v) for (l, b), v in sorted(w.items())],
        "lang string, bucket string, w double",
    ).localCheckpoint(eager=True)
    return {
        "weights": weights,
        "bias": dict(bias),
        "langs": list(langs),
        "hex_chars": hex_chars,
        "ns": tuple(ns),
    }


def lang_classify(
    docs: DataFrame,
    model: dict,
    threshold: float | None = None,
    min_coverage: float = 0.2,
    coverage_w_floor: float = 0.0,
) -> DataFrame:
    """(doc_id, lang_pred, score): each doc's argmax class under a trained
    model — serving is one broadcast join + one (doc, class) aggregate +
    one bounded window (logit DESC, lang ASC tie-break).

    ``score`` is the SOFTMAX SHARE of the winning class over all class
    logits (margin + bias), not the raw one-vs-rest sigmoid: the sigmoid's
    absolute level tracks training calibration (an underfit model says
    ~0.25 to everything, an overshot one ~0.75 to everything) while the
    share measures what a confidence should — how much the winner
    separates from the field; ``threshold`` turns sub-threshold
    predictions into NULL (the lang_guess contract).

    ``coverage`` — the fraction of the doc's (unit-normalized) n-gram mass
    landing in buckets the model trained on — is the out-of-vocabulary
    abstain signal (the fastText OOV story): predictions below
    ``min_coverage`` abstain REGARDLESS of score. Coverage ≈ 0 for
    gibberish/unseen scripts ONLY while trained buckets stay sparse in the
    hash space — that is why lang models default to ``LANG_HEX`` (16^5
    buckets). A model trained at a small hash space (e.g. the DSIR 16^3
    default) SATURATES: every bucket carries weight, every input covers
    ≈ 1.0, and ``min_coverage`` never abstains
    (test_lang_coverage_saturation pins both regimes). For such models,
    ``coverage_w_floor`` > 0 restricts the covering set to buckets whose
    max class |w| exceeds the floor — a partial mitigation (discriminative
    grams keep large weights; incidental traffic decays under L2), not a
    substitute for a sparse hash space. It rides the output so callers can
    tune the floor."""
    from pyspark.sql.window import Window

    spark = docs.sparkSession
    feats = char_ngram_features(docs, model["ns"], model["hex_chars"])
    wdf = model["weights"].select(
        F.col("lang").alias("lang_c"), "bucket", "w"
    )
    bias_df = spark.createDataFrame(
        [(l, b) for l, b in model["bias"].items()], "lang_c string, b double"
    )
    classes = spark.createDataFrame([(l,) for l in model["langs"]], "lang_c string")
    margins = (
        feats.join(F.broadcast(wdf), "bucket")
        .groupBy("doc_id", "lang_c")
        .agg(F.sum(F.col("w") * F.col("x")).alias("m"))
    )
    if coverage_w_floor > 0.0:
        wbuckets = (
            model["weights"]
            .groupBy("bucket")
            .agg(F.max(F.abs(F.col("w"))).alias("_mw"))
            .filter(F.col("_mw") > F.lit(float(coverage_w_floor)))
            .select("bucket")
        )
    else:
        # default: every TRAINED bucket covers (weights can legitimately
        # sit at exactly 0.0 — e.g. cancelling first-iteration gradients —
        # and those grams were still seen in training)
        wbuckets = model["weights"].select("bucket").distinct()
    cov = (
        feats.join(F.broadcast(wbuckets), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("x").alias("coverage"))
    )
    logits = (
        docs.select("doc_id")
        .distinct()
        .crossJoin(F.broadcast(classes))
        .join(margins, ["doc_id", "lang_c"], "left")
        .join(F.broadcast(bias_df), "lang_c")
        .select(
            "doc_id",
            "lang_c",
            (F.coalesce(F.col("m"), F.lit(0.0)) + F.col("b")).alias("z"),
        )
    )
    wdoc = Window.partitionBy("doc_id")
    # numerically-stable softmax share: exp(z - max_z) / Σ exp(z - max_z)
    shared = logits.withColumn("_zmax", F.max("z").over(wdoc)).withColumn(
        "_e", F.exp(F.col("z") - F.col("_zmax"))
    )
    shared = shared.withColumn(
        "score", F.col("_e") / F.sum("_e").over(wdoc)
    )
    win = Window.partitionBy("doc_id").orderBy(F.desc("z"), "lang_c")
    best = (
        shared.withColumn("_rk", F.row_number().over(win))
        .filter(F.col("_rk") == 1)
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.col("lang_c").alias("lang_pred"),
            F.round("score", 6).alias("score"),
            F.round(F.coalesce(F.col("coverage"), F.lit(0.0)), 6).alias(
                "coverage"
            ),
        )
    )
    abstain = F.col("coverage") < F.lit(min_coverage)
    if threshold is not None:
        abstain = abstain | (F.col("score") < F.lit(threshold))
    return best.withColumn(
        "lang_pred", F.when(~abstain, F.col("lang_pred"))
    )


# ---------------------------------------------------------------------------
# Lang-share drift (r10): the serving-side monitor for a trained lang
# model — the predicted-language DISTRIBUTION of what a pipeline ingests is
# a crawl/encoder canary (a fetcher that starts mangling charsets, or a
# crawl frontier drifting into a new region, shows up as a lang-share shift
# long before any per-doc score moves). Categories map to integer bins —
# each lang's index in model["langs"], abstain/OOV as its own trailing bin
# — so the SAME PSI machinery that monitors score histograms
# (quality.psi_drift / psi_from_window_hist, the drift_monitor_sink store
# schema) consumes these counts unchanged.
# ---------------------------------------------------------------------------


def _lang_bin(model: dict, pred_col: str = "lang_pred") -> "F.Column":
    """Integer bin for a prediction column: index into model['langs'],
    abstain (NULL prediction) = len(langs)."""
    expr = F.lit(len(model["langs"]))
    for i, lang in enumerate(model["langs"]):
        expr = F.when(F.col(pred_col) == lang, F.lit(i)).otherwise(expr)
    return expr.cast("long")


def lang_share_counts(
    docs: DataFrame,
    model: dict,
    threshold: float | None = None,
    min_coverage: float = 0.2,
) -> DataFrame:
    """(bin, n): predicted-lang counts over ``docs`` — the categorical
    histogram ``quality.psi_drift`` consumes on either side (freeze one
    over a vetted corpus as the reference; serve the other per window).
    Abstains count in their own bin: a surge of OOV text IS drift."""
    preds = lang_classify(
        docs.select("doc_id", "text"), model, threshold, min_coverage
    )
    return preds.groupBy(_lang_bin(model).alias("bin")).agg(
        F.count("*").cast("long").alias("n")
    )


def lang_window_counts(
    docs: DataFrame,
    model: dict,
    window: str = "1 hour",
    ts_col: str = "ts",
    threshold: float | None = None,
    min_coverage: float = 0.2,
) -> DataFrame:
    """(window_start, bin, n_cur): per-event-time-window predicted-lang
    counts — ``quality.window_histogram``'s exact shape, so counts are
    ADDITIVE across any batching (the streaming sink's partial windows
    re-aggregate exactly) and ``quality.psi_from_window_hist`` serves the
    per-window PSI against a frozen ``lang_share_counts`` reference."""
    preds = lang_classify(
        docs.select("doc_id", "text"), model, threshold, min_coverage
    )
    joined = docs.select("doc_id", ts_col).join(preds, "doc_id")
    return (
        joined.groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            _lang_bin(model).alias("bin"),
        )
        .agg(F.count("*").alias("n_cur"))
        .select(F.col("w.start").alias("window_start"), "bin", "n_cur")
    )


def lang_psi_contributions(
    model: dict, ref_hist: DataFrame, cur_hist: DataFrame, eps: float = 1e-6
) -> DataFrame:
    """(lang, n_ref, n_cur, p_ref, p_cur, psi_term): the per-LANGUAGE PSI
    breakdown — ``quality.psi_contributions`` with the integer bins mapped
    back to their language names (abstain bin → '__abstain__'), so the
    alert reader sees WHICH language moved, not a bin number. Same
    arithmetic, |langs|+1 rows."""
    from pulsar_replay_spark.operators.quality import psi_contributions

    contrib = psi_contributions(ref_hist, cur_hist, eps)
    label = F.lit("__abstain__")
    for i, lang in enumerate(model["langs"]):
        label = F.when(F.col("bin") == i, F.lit(lang)).otherwise(label)
    return contrib.select(
        label.alias("lang"),
        "n_ref",
        "n_cur",
        "p_ref",
        "p_cur",
        "psi_term",
    )


def save_lang_model(model: dict, path: str) -> None:
    """Persist a ``lang_classifier_train`` model: the (lang, bucket, w)
    weight frame as parquet + a one-row json-ish params frame (bias map,
    langs, hex_chars, ns) — everything ``load_lang_model`` needs to serve
    on another session/cluster."""
    import json as _json

    spark = model["weights"].sparkSession
    model["weights"].write.mode("overwrite").parquet(f"{path}/weights")
    params = _json.dumps(
        {
            "bias": model["bias"],
            "langs": model["langs"],
            "hex_chars": model["hex_chars"],
            "ns": list(model["ns"]),
        }
    )
    spark.createDataFrame([(params,)], "params string").write.mode(
        "overwrite"
    ).parquet(f"{path}/params")


def load_lang_model(spark, path: str) -> dict:
    """Inverse of ``save_lang_model`` — classification under a loaded
    model is pinned byte-equal to the in-memory one."""
    import json as _json

    params = _json.loads(
        spark.read.parquet(f"{path}/params").head().params
    )
    return {
        "weights": spark.read.parquet(f"{path}/weights"),
        "bias": dict(params["bias"]),
        "langs": list(params["langs"]),
        "hex_chars": int(params["hex_chars"]),
        "ns": tuple(params["ns"]),
    }


def enrich_lang(
    docs: DataFrame,
    model: dict,
    threshold: float | None = None,
    min_coverage: float = 0.2,
    coverage_w_floor: float = 0.0,
) -> DataFrame:
    """Fill NULL ``lang`` rows via a trained model — the operational
    composition with the corpus front doors: raw-WARC `response` records
    land lang-less (see ``sources/corpusio``; the heuristic `lang_guess`
    fills confident cases), and this upgrades the remainder under a
    trained head. Only NULL-lang docs are classified (bounded work);
    labeled rows pass through untouched; low-coverage (OOV) and
    sub-threshold predictions stay NULL. Column set is preserved."""
    cols = docs.columns
    preds = lang_classify(
        docs.filter(F.col("lang").isNull()).select("doc_id", "text"),
        model,
        threshold,
        min_coverage,
        coverage_w_floor,
    )
    return (
        docs.join(preds.select("doc_id", "lang_pred"), "doc_id", "left")
        .withColumn("lang", F.coalesce(F.col("lang"), F.col("lang_pred")))
        .select(*cols)
    )
