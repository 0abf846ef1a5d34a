"""Token-id encoding scale rehearsal: replicate the sf0.01 documents N× and
measure ``bpe_encode_docs`` end-to-end (vocab-side segmentation + the
doc_id-keyed order-preserving reassembly — the one shuffle that carries the
encoded ids themselves). The check: wall scales ~linearly with corpus volume
(the vocab-side work is constant across replicas — replicated docs add no
new words), and output token totals scale exactly N×.

Usage: python tools/encode_probe.py [n_replicas]   (default 10; 20/30 for
the rehearsal ladder)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_MERGES = 20


def main(n_replicas: int = 10) -> None:
    from pyspark.sql import functions as F

    from pulsar_replay_spark.operators import bpe
    from pulsar_replay_spark.session import get_spark

    spark = get_spark("encode-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

    reps = spark.range(n_replicas).select(F.col("id").alias("rep"))
    docs = (
        base.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            "text",
        )
        .localCheckpoint()
    )
    n_docs = docs.count()

    merges = bpe.bpe_train_local(bpe.word_freqs(base), N_MERGES)
    piece_tbl = bpe.bpe_piece_ids(base, merges).localCheckpoint(eager=True)
    n_pieces = piece_tbl.count()

    t0 = time.monotonic()
    enc = bpe.bpe_encode_docs(docs, merges, piece_ids=piece_tbl)
    totals = enc.agg(
        F.sum("n_tokens").alias("t"), F.count("*").alias("d")
    ).first()
    wall = time.monotonic() - t0

    base_total = (
        bpe.bpe_encode_docs(base, merges, piece_ids=piece_tbl)
        .agg(F.sum("n_tokens"))
        .first()[0]
    )
    print(
        json.dumps(
            {
                "n_replicas": n_replicas,
                "n_docs": n_docs,
                "n_pieces": int(n_pieces),
                "encode_sec": round(wall, 2),
                "total_tokens": int(totals["t"]),
                "rows_out": int(totals["d"]),
                "exact_nx_scaling": int(totals["t"]) == n_replicas * int(base_total),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
