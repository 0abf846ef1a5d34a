"""Artifact-persistence gates: every build-once model saves to parquet and
reloads to EXACTLY the shape its builder produced, and serving from the
reloaded artifact equals serving from the in-session build — the write-
once/serve-forever seam the index operators document."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pulsar_replay_spark.operators import artifacts, bpe, curation, pca, similarity


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_ivf_index_roundtrip_and_serving(spark, embeddings, tmp_path):
    cents = similarity.kmeans_refine(embeddings, 16, n_iter=1)
    cells = similarity.ivf_assign(embeddings, cents, n_probe=1).localCheckpoint(
        eager=True
    )
    artifacts.save_ivf_index(cents, cells, str(tmp_path / "ivf"))
    lc, lcells = artifacts.load_ivf_index(spark, str(tmp_path / "ivf"))
    assert _rows(lc) == _rows(cents)
    assert _rows(lcells) == _rows(cells)

    queries = embeddings.filter(F.col("vec_id") % 100 == 0)
    built = similarity.ivf_topk(
        embeddings, queries, k=5, n_probe=4, centroids=cents, corpus_cells=cells
    )
    served = similarity.ivf_topk(
        embeddings, queries, k=5, n_probe=4, centroids=lc, corpus_cells=lcells
    )
    assert _rows(built) == _rows(served)


def test_pq_index_roundtrip_and_serving(spark, embeddings, tmp_path):
    idx = similarity.pq_index(embeddings)
    artifacts.save_pq_index(idx, str(tmp_path / "pq"))
    loaded = artifacts.load_pq_index(spark, str(tmp_path / "pq"))
    for piece in ("books", "codes", "cents", "cells"):
        assert _rows(loaded[piece]) == _rows(idx[piece]), piece

    queries = embeddings.filter(F.col("vec_id") % 100 == 0)
    built = similarity.ivf_pq_topk(embeddings, queries, k=5, index=idx)
    served = similarity.ivf_pq_topk(embeddings, queries, k=5, index=loaded)
    assert _rows(built) == _rows(served)


def test_dsir_model_roundtrip_and_scoring(spark, documents, tmp_path):
    target = documents.filter(F.col("lang") == "es")
    ratio, default = curation.dsir_bucket_log_ratio(
        curation.dsir_features(target), curation.dsir_features(documents)
    )
    artifacts.save_dsir_model(ratio, default, str(tmp_path / "dsir"))
    lratio, ldefault = artifacts.load_dsir_model(spark, str(tmp_path / "dsir"))
    assert ldefault == default
    assert _rows(lratio) == _rows(ratio)
    assert _rows(curation.dsir_score(documents, lratio, ldefault)) == _rows(
        curation.dsir_score(documents, ratio, default)
    )


def test_bpe_merges_roundtrip_and_segmentation(spark, documents, tmp_path):
    merges = bpe.bpe_train(bpe.word_freqs(documents), 6)
    artifacts.save_bpe_merges(spark, merges, str(tmp_path / "bpe"))
    loaded = artifacts.load_bpe_merges(spark, str(tmp_path / "bpe"))
    assert loaded == merges  # order is the tokenizer — must survive exactly
    wf = bpe.word_freqs(documents)
    assert _rows(
        bpe.bpe_segment_words(wf, loaded).select("word", "bpe")
    ) == _rows(bpe.bpe_segment_words(wf, merges).select("word", "bpe"))


def test_pca_model_roundtrip_and_projection(spark, embeddings, tmp_path):
    model = pca.pca_fit(embeddings, 8, whiten=True)
    artifacts.save_pca_model(spark, model, str(tmp_path / "pca"))
    loaded = artifacts.load_pca_model(spark, str(tmp_path / "pca"))
    assert loaded["n"] == model["n"] and loaded["whiten"] is True
    for key in ("mean", "components", "eigvals", "explained_var_ratio"):
        assert np.array_equal(loaded[key], model[key]), key
    assert _rows(
        pca.pca_project(embeddings, loaded).select("vec_id", "proj")
    ) == _rows(pca.pca_project(embeddings, model).select("vec_id", "proj"))
