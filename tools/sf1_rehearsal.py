"""sf1 headline rehearsal: the 24-row contract-headline bench at 10× the
largest driver fixture (~6 M lineitem — the sf1 the driver never ships).

The 10×/20×/30× probes cover the NEW tiers; this closes the r8 verdict's
gap ("the 50-query contract corpus has never been benched above sf0.1"):
synthesize sf1 by replicating sf0.1 tenfold with KEY OFFSETS that preserve
every join relationship (each replica is a disjoint copy of the star
schema — cardinalities scale linearly, skew shape is preserved), then run
the normal bench.py headline against it and report per-row sf0.1→sf1
wall ratios against a recorded sf0.1 baseline.

Replication semantics:
- region/nation: fixed dimensions, copied once (the TPC-H contract —
  dims don't grow with sf).
- customer/supplier/part/orders/lineitem/events: every key column gets
  ``replica * OFFSET`` so replica i's orders join replica i's customers
  and lineitems only.
- documents: doc_id offset AND every 5th token salted with a
  replica-unique suffix — an unsalted copy would be a ~0.98-Jaccard
  near-duplicate of its source, turning each doc into a 10-clone cluster
  and inflating every near-dup row quadratically in replicas (a workload
  the real corpus doesn't have). 20% token salting pushes cross-replica
  3-shingle Jaccard below every dedup threshold while keeping
  per-replica text statistics (length, vocabulary shape) intact.
  n_chars is recomputed after salting.
- embeddings: vec_id offset, vectors copied verbatim (IVF/LSH cell
  occupancy scales linearly; identical vectors across replicas are fine
  for ANN timing — ties break on id).

Usage:
  python tools/sf1_rehearsal.py            # build /tmp/sf1_rehearsal + bench
  python tools/sf1_rehearsal.py --keep     # keep the synthesized tables
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1_rehearsal"
N_REPLICAS = 10
OFF = 100_000_000  # key offset per replica — far above any sf0.1 key


def _replicate(spark) -> None:
    from pyspark.sql import functions as F

    from pulsar_replay_spark.session import load_events

    os.makedirs(DST, exist_ok=True)

    def write(df, name):
        df.write.mode("overwrite").parquet(f"{DST}/{name}.parquet")

    for dim in ("region", "nation"):
        write(spark.read.parquet(f"{SRC}/{dim}.parquet"), dim)

    key_cols = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "embeddings": ["vec_id"],
    }
    for name, keys in key_cols.items():
        if name == "events":
            base = load_events(spark, SRC)
        else:
            base = spark.read.parquet(f"{SRC}/{name}.parquet")
        parts = []
        for i in range(N_REPLICAS):
            rep = base
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + F.lit(i * OFF))
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        write(out, name)

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    parts = []
    for i in range(N_REPLICAS):
        toks = F.split(F.col("text"), " ")
        salted = F.array_join(
            F.transform(
                toks,
                lambda t, idx: F.when(
                    idx % 5 == i % 5, F.concat(t, F.lit(f"r{i}"))
                ).otherwise(t),
            ),
            " ",
        )
        rep = docs.select(
            (F.col("doc_id") + F.lit(i * OFF)).alias("doc_id"),
            (salted if i > 0 else F.col("text")).alias("text"),
            "lang",
            "source",
        ).withColumn("n_chars", F.length("text").cast("long"))
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    write(out, "documents")


def main() -> None:
    from pulsar_replay_spark.session import get_spark

    keep = "--keep" in sys.argv
    spark = get_spark("sf1-rehearsal", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.monotonic()
    _replicate(spark)
    build_sec = round(time.monotonic() - t0, 1)
    spark.stop()

    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = DST
    env["SPARK_GRAFT_BENCH_REPS"] = env.get("SPARK_GRAFT_BENCH_REPS", "2")
    env["SPARK_GRAFT_DETAIL_PATH"] = "/tmp/sf1_rehearsal_detail.json"
    res = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=str(Path(__file__).resolve().parent.parent),
        env=env,
        capture_output=True,
        text=True,
        timeout=7200,
    )
    line = [l for l in res.stdout.splitlines() if l.startswith("{")]
    print(json.dumps({"build_sec": build_sec, "bench_tail": line[-1] if line else None}))
    if res.returncode != 0:
        sys.stderr.write(res.stderr[-2000:])
    if not keep:
        shutil.rmtree(DST, ignore_errors=True)


if __name__ == "__main__":
    main()
