"""Distributed PCA / whitening over the embedding column — the standard
dimensionality-reduction step a 100 TB embedding pipeline runs before ANN
indexing or clustering (reduce 64-d to k-d, optionally whiten, then feed
IVF/PQ — smaller vectors, same recall machinery).

Scale shape (the MLlib-gramian pattern, DataFrame-native): each Arrow batch
computes its own (n, Σx, XᵀX) in numpy — corpus rows never shuffle, and the
dim² work rides the scan — then a single bounded reduce of
(1 + dim + dim²) keys sums the per-batch pieces. Eigendecomposition happens
on the driver over the dim×dim covariance (64×64 here — microseconds; the
distributed part is everything before it). Projection is one Arrow-batched
matmul per batch against the broadcast (k × dim) component matrix.

No reference analog; pinned against exact numpy mirrors in tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_moments(emb: DataFrame, col: str = "embedding"):
    """(n, mean, cov): distributed second-moment pass.

    Per-batch numpy gramians → posexplode to (pos, val) → one sum over the
    bounded 1 + dim + dim² keyspace (a few thousand keys at dim=64,
    whatever the corpus size). cov is the population covariance
    E[xxᵀ] − μμᵀ, matching ``np.cov(X.T, bias=True)``."""

    def gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(pdf[col].tolist(), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "piece": [
                        np.concatenate(
                            ([float(len(x))], x.sum(axis=0), (x.T @ x).ravel())
                        ).tolist()
                    ]
                }
            )

    stats = emb.select(col).mapInPandas(gram, schema="piece array<double>")
    sums = (
        stats.select(F.posexplode("piece").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.sum("val").alias("s"))
        .collect()
    )
    flat = np.zeros(max(r.pos for r in sums) + 1)
    for r in sums:
        flat[r.pos] = r.s
    n = flat[0]
    # len(flat) = 1 + dim + dim²  →  dim = (−1 + √(1 + 4·(len−1))) / 2
    dim = int(round((-1 + (1 + 4 * (len(flat) - 1)) ** 0.5) / 2))
    mean = flat[1 : 1 + dim] / n
    cov = flat[1 + dim :].reshape(dim, dim) / n - np.outer(mean, mean)
    return int(n), mean, cov


def pca_fit(
    emb: DataFrame, k: int, col: str = "embedding", whiten: bool = False
) -> dict:
    """Fit a k-component PCA model: {mean, components (k×dim), eigvals,
    explained_var_ratio, whiten}. Components carry a deterministic sign
    convention (largest-magnitude entry positive) so refits agree across
    partitionings up to fp noise."""
    n, mean, cov = embedding_moments(emb, col)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:k]
    vals = eigvals[order]
    comps = eigvecs[:, order].T  # (k, dim)
    for i in range(comps.shape[0]):  # sign convention
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "n": n,
        "mean": mean,
        "components": comps,
        "eigvals": vals,
        "explained_var_ratio": vals / eigvals.sum(),
        "whiten": whiten,
    }


def pca_project(
    emb: DataFrame, model: dict, col: str = "embedding", out_col: str = "proj"
) -> DataFrame:
    """Project each embedding onto the fitted components: (X − μ)·Vᵀ,
    scaled by 1/√λ when the model whitens. One Arrow-batched matmul per
    batch against the broadcast (k × dim) matrix — no shuffle, no per-row
    Python; the projection rides the scan at any corpus size."""
    from pyspark.sql.functions import pandas_udf

    mean = model["mean"]
    mat = model["components"].T  # (dim, k)
    if model.get("whiten"):
        mat = mat / np.sqrt(model["eigvals"])

    @pandas_udf("array<double>")
    def proj(s: pd.Series) -> pd.Series:
        x = np.asarray(s.tolist(), dtype=np.float64)
        out = (x - mean) @ mat
        return pd.Series(list(out))

    return emb.withColumn(out_col, proj(F.col(col)))


def random_projection(
    emb: DataFrame,
    k: int,
    dim: int = 64,
    seed: str = "jl-v1",
    col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """Johnson–Lindenstrauss sparse random projection (Achlioptas 2003):
    x → x·R/√k with R a dim×k Rademacher (±1) matrix — the data-INDEPENDENT
    complement to PCA for when even one moments pass over the corpus is too
    expensive: no training, no actions, just a broadcast matmul riding the
    scan (zero exchanges, same Arrow seam as ``pca_project``).

    R is md5-derived from ``seed`` (bit 0 of md5("seed:i:j")) — the same
    determinism discipline as every sample in the engine: any worker, any
    engine, any retry rebuilds the identical matrix, and changing the seed
    re-deals the projection."""
    import hashlib

    from pyspark.sql.functions import pandas_udf

    signs = np.array(
        [
            1.0 if hashlib.md5(f"{seed}:{i}:{j}".encode()).digest()[0] & 1 else -1.0
            for i in range(dim)
            for j in range(k)
        ]
    ).reshape(dim, k)
    mat = signs / np.sqrt(k)

    @pandas_udf("array<double>")
    def proj(s: pd.Series) -> pd.Series:
        x = np.asarray(s.tolist(), dtype=np.float64)
        return pd.Series(list(x @ mat))

    return emb.withColumn(out_col, proj(F.col(col)))


def pca_ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_components: int = 16,
    n_cells: int | None = None,
    n_probe: int | None = None,
) -> DataFrame:
    """ANN top-k with PCA-reduced candidate generation and full-vector
    rerank — the standard two-space serving composition: cluster and probe
    in the cheap k-d space (4× smaller cells/centroid math at
    n_components=16), score survivors exactly in the original space. Same
    output contract as ``brute_force_topk``/``ivf_topk``.

    Shares the IVF machinery wholesale: Lloyd-refined centroids + cell
    assignment run on the PROJECTED vectors, and ``ivf_topk`` receives the
    prebuilt cells plus projected-space ``query_cells`` while reranking
    with the original ``emb``/``queries`` columns."""
    from pulsar_replay_spark.operators.similarity import (
        ivf_assign,
        ivf_params,
        ivf_topk,
        kmeans_refine,
    )

    if n_cells is None or n_probe is None:
        auto_cells, auto_probe = ivf_params(emb.count())
        n_cells = n_cells or auto_cells
        n_probe = n_probe or auto_probe
    model = pca_fit(emb, n_components)
    pc = pca_project(emb, model).select(
        "vec_id", F.col("proj").alias("embedding")
    )
    pq = pca_project(queries, model).select(
        "vec_id", F.col("proj").alias("embedding")
    )
    cents = kmeans_refine(pc, n_cells, n_iter=1)
    cells = ivf_assign(pc, cents, n_probe=1).localCheckpoint(eager=True)
    qcells = ivf_assign(pq, cents, n_probe=n_probe)
    return ivf_topk(
        emb,
        queries,
        k=k,
        centroids=cents,
        corpus_cells=cells,
        query_cells=qcells,
    )
