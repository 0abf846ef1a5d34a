"""Wide-signature selectivity probe: measures WHY grids > 8 exist — at a
corpus size where 56-bit/k=4 banding (11-bit block keys) starts colliding
random images into candidate pairs, the 132-bit/grid=12 geometry (26-bit
keys) keeps the candidate set at the planted-pair floor.

Reports, for the same thumb corpus at both geometries: banded CANDIDATE
pair count (block equi-join matches before the hamming verify — the number
that drives shuffle+verify cost), surviving pair count, and wall.

Usage: python tools/wide_sig_probe.py [n_thumbs]   (default 30000)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from pulsar_replay_spark.operators import multimodal as mm
    from pulsar_replay_spark.operators.dedup import (
        _multi_word_blocks,
        _simhash_blocks,
    )
    from pulsar_replay_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    spark = get_spark("wide-sig-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_thumbs": n}

    # corpus: random 24x24 gray thumbs + 1% planted nudge-clone pairs
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [], "thumb": []}
            for i in pdf["id"]:
                i = int(i)
                if i % 100 == 1:  # clone of i-1, a few +2 nudges
                    g = np.random.default_rng(i - 1)
                    img = g.integers(0, 256, size=24 * 24).astype(np.int64)
                    ng = np.random.default_rng(10_000_000 + i)
                    idx = ng.integers(0, img.size, size=12)
                    img[idx] = np.minimum(255, img[idx] + 2)
                else:
                    img = np.random.default_rng(i).integers(
                        0, 256, size=24 * 24
                    )
                rows["doc_id"].append(i)
                rows["width"].append(24)
                rows["height"].append(24)
                rows["thumb"].append(img.astype(np.uint8).tobytes())
            yield pd.DataFrame(rows)

    thumbs = (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, "doc_id long, width int, height int, thumb binary")
        .localCheckpoint(eager=True)
    )
    k = 4

    def candidates(blocks):
        a, b = blocks.alias("a"), blocks.alias("b")
        return (
            a.join(
                b,
                (F.col("a.blk") == F.col("b.blk"))
                & (F.col("a.val") == F.col("b.val"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select("a.doc_id", "b.doc_id")
            .distinct()
            .count()
        )

    # narrow: grid=8, 56 bits, 11-bit block keys
    t0 = time.perf_counter()
    sigs8 = mm.dhash_signatures(thumbs, 8).localCheckpoint(eager=True)
    out["cand_pairs_grid8"] = candidates(_simhash_blocks(sigs8, k, 56))
    out["pairs_grid8"] = mm.image_near_dup_pairs(thumbs, max_hamming=k, grid=8).count()
    out["wall_grid8_s"] = round(time.perf_counter() - t0, 2)

    # wide: grid=12, 132 bits, 26-bit block keys
    t0 = time.perf_counter()
    sigs12 = mm.dhash_signatures_wide(thumbs, 12).localCheckpoint(eager=True)
    out["cand_pairs_grid12"] = candidates(_multi_word_blocks(sigs12, k, 132))
    out["pairs_grid12"] = mm.image_near_dup_pairs(
        thumbs, max_hamming=k, grid=12
    ).count()
    out["wall_grid12_s"] = round(time.perf_counter() - t0, 2)

    out["planted_pairs"] = n // 100
    print(json.dumps(out))


if __name__ == "__main__":
    main()
