"""Skewed-cell SemDeDup rehearsal: plant ONE dominant cell holding ~50% of
all vectors at a multiple of sf0.1 embedding volume, then measure the
unblocked within-cell scan (the giant cell is a single straggler task)
against the block-decomposed scan (``semantic_dedup(block_rows=...)``) and
assert verdict equality via exceptAll in both directions.

The planted corpus is synthetic-but-derived: half the vectors are tight
perturbations of one base direction (they provably share a nearest centroid
— the degenerate-embedding / template-spam shape SCALE.md names as the
operator's failure mode), half are uniform noise spread over the remaining
centroids.

Usage: python tools/skew_semdedup_probe.py [n_vectors] [block_rows] [--blocked-only]
       # defaults: 20000 (10x sf0.1's 2000 embeddings), 2048
       # --blocked-only: skip the unblocked straggler run (for volumes where
       # it would take tens of minutes); equality is then not checked.
Prints one JSON line: timings, verdict-equality counts, cell-size skew.
"""

from __future__ import annotations

import json
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--blocked-only"]
    blocked_only = "--blocked-only" in sys.argv
    n = int(args[0]) if len(args) > 0 else 20_000
    block_rows = int(args[1]) if len(args) > 1 else 2048
    dim, n_cells, threshold = 64, 16, 0.97

    from pyspark.sql import functions as F

    from pulsar_replay_spark.operators import similarity
    from pulsar_replay_spark.session import get_spark

    spark = get_spark("skew-semdedup-probe")
    spark.sparkContext.setLogLevel("ERROR")

    rnd = random.Random(13)
    base = [rnd.uniform(-1, 1) for _ in range(dim)]
    rows = []
    for i in range(n // 2):  # dominant direction, ~50% of the corpus
        rows.append((i, [b + rnd.uniform(-0.15, 0.15) for b in base]))
    for i in range(n // 2, n):
        rows.append((i, [rnd.uniform(-1, 1) for _ in range(dim)]))
    emb = (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    cents = spark.createDataFrame(
        [(0, base)]
        + [
            (c, [rnd.uniform(-1, 1) for _ in range(dim)])
            for c in range(1, n_cells)
        ],
        "cell_id long, centroid array<double>",
    ).localCheckpoint(eager=True)

    def run(block):
        t0 = time.perf_counter()
        out = similarity.semantic_dedup(
            emb, threshold=threshold, centroids=cents, block_rows=block
        ).localCheckpoint(eager=True)
        out.count()
        return out, round(time.perf_counter() - t0, 2)

    blocked, t_blocked = run(block_rows)
    out = {
        "n_vectors": n,
        "block_rows": block_rows,
        "sec_blocked": t_blocked,
        "dropped": blocked.filter("NOT keep").count(),
    }
    top = (
        blocked.groupBy("cell_id")
        .agg(F.count("*").alias("m"))
        .orderBy(F.desc("m"))
        .first()
    )
    out["dominant_cell_rows"] = top["m"]
    out["dominant_cell_share"] = round(top["m"] / n, 3)
    if not blocked_only:
        plain, t_plain = run(None)
        out["sec_unblocked"] = t_plain
        out["verdict_diff_a"] = plain.exceptAll(blocked).count()
        out["verdict_diff_b"] = blocked.exceptAll(plain).count()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
