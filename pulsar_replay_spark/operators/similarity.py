"""Similarity search over an embedding column (``array<float>``).

Two paths, per the standard scale playbook:

- ``brute_force_topk`` — exact cosine top-k: query-set × corpus join. Correct
  baseline; O(|Q|·N) — fine when |Q| is small or N fits a broadcast, the
  recall oracle for everything else.
- ``lsh_buckets`` / ``lsh_topk`` — random-hyperplane LSH: each vector gets a
  B-bit signature (sign of ⟨v, h_p⟩ for deterministic md5-derived hyperplanes
  h_p ∈ {−1,+1}^dim); candidates are same-bucket vectors only. The bucket join
  is an equi-join on the signature — shuffle on a small key, no cross join;
  at 100 TB this is the only tractable shape. Recall vs brute force is pinned
  in tests/test_similarity.py.

Everything is built-in higher-order functions — hyperplanes are *expressions*
(md5-seeded), so the DuckDB oracle reproduces signatures exactly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pulsar_replay_spark.functions.vectors import cosine

N_PLANES = 8
DIM = 64


def _hyperplane_matrix(n_planes: int = N_PLANES, dim: int = DIM) -> list[list[float]]:
    """Hyperplane components as driver-side constants: component j of plane p
    is +1 when the first md5 hex nibble of ``"p-j"`` is 0–7, else −1 — the
    exact formula the DuckDB oracle evaluates in SQL (queries_llm:
    ``_lsh_bucket_sql``), precomputed here because it depends only on (p, j),
    never on data. Evaluating md5 per vector-component would cost
    N·dim·planes hash calls for a constant 8×64 matrix."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{p}-{j}".encode()).hexdigest()[0], 16) < 8
            else -1.0
            for j in range(dim)
        ]
        for p in range(n_planes)
    ]


_H = _hyperplane_matrix()


def lsh_signature(vec: Column) -> Column:
    """B-bit signature as a long: bit p = [⟨v, h_p⟩ > 0]. Hyperplanes are
    literal arrays (see ``_hyperplane_matrix``) — the projection is a pure
    zip_with/aggregate over codegen'd constants."""
    bits = []
    for p in range(N_PLANES):
        plane = F.array(*[F.lit(h) for h in _H[p]])
        proj = F.aggregate(
            F.zip_with(vec, plane, lambda x, h: x.cast("double") * h),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.lit(2**p)).otherwise(F.lit(0)))
    return reduce(lambda a, b: a + b, bits).cast("long")


def lsh_buckets(embeddings: DataFrame) -> DataFrame:
    return embeddings.select("vec_id", lsh_signature(F.col("embedding")).alias("bucket"))


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact cosine top-k for each query vector against the whole corpus.

    `queries` is expected to be small → broadcast; ordering is on
    round(cos, 6) with vec_id tiebreak so results are engine-stable.
    """
    from pulsar_replay_spark.functions.vectors import dot, norm

    # Precompute per-vector norms BEFORE the pair join: norm is O(dim) work
    # that would otherwise run once per (query, candidate) pair instead of
    # once per vector — |Q|× wasted at scale.
    q = queries.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        norm(F.col("embedding")).alias("q_norm"),
    )
    cand = embeddings.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("n_emb"),
        norm(F.col("embedding")).alias("n_norm"),
    )
    sims = cand.join(F.broadcast(q), F.col("q_id") != F.col("n_id")).withColumn(
        "sim6",
        F.round(dot(F.col("q_emb"), F.col("n_emb")) / (F.col("q_norm") * F.col("n_norm")), 6),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim6"), "n_id")
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", F.col("n_id").alias("neighbor_id"), F.round("sim6", 3).alias("sim"), "rk")
    )


N_TABLES = 4
BITS_PER_TABLE = 2  # planes per table drawn from the shared N_PLANES pool


def lsh_tables(embeddings: DataFrame) -> DataFrame:
    """Multi-table LSH: L independent tables of b bits each; a pair is a
    candidate if it collides in ANY table. Single-table signatures over
    random high-dim vectors shatter the corpus into singleton buckets
    (measured recall 0 on the fixtures); multiple coarser tables trade a
    bounded candidate-scan fraction for recall — the standard production
    tuning knob (L up, b up as corpus density grows)."""
    sig = embeddings.select("vec_id", lsh_signature(F.col("embedding")).alias("sig"))
    tables = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                F.shiftright(F.col("sig"), t * BITS_PER_TABLE)
                .bitwiseAND(F.lit(2**BITS_PER_TABLE - 1))
                .alias("bucket"),
            )
            for t in range(N_TABLES)
        ]
    )
    return sig.select("vec_id", F.explode(tables).alias("tb")).select(
        "vec_id", F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket")
    )


def lsh_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """ANN top-k: rank only candidates colliding with the query in some LSH
    table (the scale path — the table join shuffles (table, bucket) keys,
    never the full cross product)."""
    from pulsar_replay_spark.functions.vectors import dot, norm

    # Materialize the bucket table once: it feeds BOTH join sides, and the
    # signature computation (8 hyperplane projections per vector) is the
    # expensive subtree — unpersisted it would run twice. localCheckpoint
    # truncates lineage so nothing upstream stays cached (measured 2× on the
    # 20k-vector stress).
    t = lsh_tables(embeddings).localCheckpoint(eager=True)
    cand = embeddings.join(t, "vec_id").select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("n_emb"),
        norm(F.col("embedding")).alias("n_norm"),
        "table",
        "bucket",
    )
    q = queries.join(t, "vec_id").select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        norm(F.col("embedding")).alias("q_norm"),
        "table",
        "bucket",
    )
    pairs = (
        cand.join(F.broadcast(q), ["table", "bucket"])
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "q_emb", "q_norm", "n_id", "n_emb", "n_norm")
        .dropDuplicates(["q_id", "n_id"])  # collapse multi-table collisions
    )
    sims = pairs.withColumn(
        "sim6",
        F.round(dot(F.col("q_emb"), F.col("n_emb")) / (F.col("q_norm") * F.col("n_norm")), 6),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim6"), "n_id")
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", F.col("n_id").alias("neighbor_id"), F.round("sim6", 3).alias("sim"), "rk")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: partition the corpus into Voronoi cells around
# centroids; a query ranks only vectors in its nprobe nearest cells.
# ---------------------------------------------------------------------------

N_CELLS = 16
N_PROBE = 4


def ivf_centroids(embeddings: DataFrame, n_cells: int = N_CELLS) -> DataFrame:
    """Deterministic centroid pick: the n_cells lowest vec_ids (fixture ids
    are a random permutation of the space, so this is a uniform sample that
    both engines and every rerun agree on). Production path: seed MLlib
    k-means|| with these and iterate — the cell-assignment plan below is
    unchanged."""
    return (
        embeddings.orderBy("vec_id")
        .limit(n_cells)
        .select(
            F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
        )
    )


def ivf_assign(embeddings: DataFrame, centroids: DataFrame, n_probe: int = 1) -> DataFrame:
    """(vec_id, cell_id) for each vector's ``n_probe`` nearest centroids by
    cosine. The centroid set is tiny → broadcast nested-loop, map-side
    O(N·cells·dim) compute, then a per-vec_id top-n_probe — the shuffle is
    only on vec_id. This is the inherent IVF assignment cost; at real scale
    the constant is cut with PQ codes, not a different join shape."""
    from pulsar_replay_spark.functions.vectors import dot, norm

    pairs = embeddings.select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("v_norm")
    ).join(
        F.broadcast(
            centroids.select(
                "cell_id", "centroid", norm(F.col("centroid")).alias("c_norm")
            )
        )
    )
    sim = dot(F.col("embedding"), F.col("centroid")) / (F.col("v_norm") * F.col("c_norm"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim6"), "cell_id")
    return (
        pairs.withColumn("sim6", F.round(sim, 6))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n_probe)
        .select("vec_id", "cell_id")
    )


def kmeans_refine(
    embeddings: DataFrame, n_cells: int = N_CELLS, n_iter: int = 2
) -> DataFrame:
    """Lloyd's refinement of the deterministic seed centroids: assign every
    vector to its nearest centroid, recompute each centroid as the
    per-dimension mean of its members, repeat. Better centroids → tighter
    Voronoi cells → fewer out-of-cell true neighbors, the knob that lifts
    IVF recall without raising nprobe.

    Scale shape per iteration: ``ivf_assign`` (broadcast centroids, shuffle
    on vec_id) + per-dim mean via posexplode — the reduce keyspace is
    (cell, dim) = n_cells·dim rows, constant in corpus size, same pattern
    as ``label_centroid_cohesion``. One ``localCheckpoint`` per iteration
    cuts lineage so N iterations never replan the whole history (the
    connected-components discipline). Cells that lose every member drop out
    (standard Lloyd's on fixed seeds — callers see ≤ n_cells centroids).
    """
    cents = ivf_centroids(embeddings, n_cells)
    for _ in range(n_iter):
        assign = ivf_assign(embeddings, cents, n_probe=1)
        pos = (
            embeddings.join(assign, "vec_id")
            .select("cell_id", F.posexplode("embedding").alias("i", "xf"))
            .select("cell_id", "i", F.col("xf").cast("double").alias("x"))
        )
        per_dim = pos.groupBy("cell_id", "i").agg(F.avg("x").alias("c"))
        cents = per_dim.groupBy("cell_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "c"))), lambda s: s["c"]
            ).alias("centroid")
        ).localCheckpoint(eager=True)
    return cents


def assignment_cohesion(embeddings: DataFrame, centroids: DataFrame) -> DataFrame:
    """Mean cosine of every vector to its assigned (nearest) centroid — the
    objective Lloyd's iterations improve; one row: (n_vecs, avg_cos)."""
    from pulsar_replay_spark.functions.vectors import dot, norm

    best = (
        embeddings.select(
            "vec_id", "embedding", norm(F.col("embedding")).alias("v_norm")
        )
        .join(
            F.broadcast(
                centroids.select(
                    "cell_id", "centroid", norm(F.col("centroid")).alias("c_norm")
                )
            )
        )
        .withColumn(
            "sim",
            dot(F.col("embedding"), F.col("centroid"))
            / (F.col("v_norm") * F.col("c_norm")),
        )
        .groupBy("vec_id")
        .agg(F.max("sim").alias("best_sim"))
    )
    return best.agg(
        F.count("*").alias("n_vecs"), F.round(F.avg("best_sim"), 6).alias("avg_cos")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """ANN top-k via IVF: corpus vectors live in their 1 nearest cell; each
    query probes its ``n_probe`` nearest cells. Candidate generation is an
    equi-join on cell_id — shuffle on a 16-value key here, a ~2^14-value key
    at 100 TB — never a cross join. Same output contract as
    ``brute_force_topk`` (the recall oracle)."""
    from pulsar_replay_spark.functions.vectors import dot, norm

    cents = centroids if centroids is not None else ivf_centroids(embeddings, n_cells)
    corpus_cells = ivf_assign(embeddings, cents, n_probe=1)
    query_cells = ivf_assign(queries, cents, n_probe=n_probe)

    cand = embeddings.join(corpus_cells, "vec_id").select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("n_emb"),
        norm(F.col("embedding")).alias("n_norm"),
        "cell_id",
    )
    q = queries.join(query_cells, "vec_id").select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        norm(F.col("embedding")).alias("q_norm"),
        "cell_id",
    )
    pairs = (
        cand.join(F.broadcast(q), "cell_id")
        .filter(F.col("q_id") != F.col("n_id"))
        .drop("cell_id")
        .dropDuplicates(["q_id", "n_id"])
    )
    sims = pairs.withColumn(
        "sim6",
        F.round(dot(F.col("q_emb"), F.col("n_emb")) / (F.col("q_norm") * F.col("n_norm")), 6),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim6"), "n_id")
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", F.col("n_id").alias("neighbor_id"), F.round("sim6", 3).alias("sim"), "rk")
    )


def embedding_near_dup_pairs_lsh(
    embeddings: DataFrame, threshold: float = 0.45
) -> DataFrame:
    """Scale path for embedding near-dup detection: candidate pairs from LSH
    bucket collisions only (equi-join on (table, bucket) — never the |N|²
    pair space of the exact formulation), then exact cosine filter. Returns
    (vec_a, vec_b, sim) like the exact query; recall vs the exact pairs is
    pinned in tests."""
    from pulsar_replay_spark.functions.vectors import dot, norm

    t = lsh_tables(embeddings).localCheckpoint(eager=True)
    side = embeddings.join(t, "vec_id").select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("nrm"), "table", "bucket"
    )
    a = side.alias("a")
    b = side.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(
                dot(F.col("a.embedding"), F.col("b.embedding"))
                / (F.col("a.nrm") * F.col("b.nrm")),
                6,
            ).alias("sim6"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return pairs.filter(F.col("sim6") >= threshold).select(
        "vec_a", "vec_b", F.round("sim6", 3).alias("sim")
    )
