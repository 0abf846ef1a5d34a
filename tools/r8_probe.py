"""Round-8 scale rehearsal probe: measures the round's new operators at
replicated stress volumes so their SCALE.md rows carry measured numbers:

- raw-WARC ``response`` ingestion with HTTP extraction (the r7 verdict's
  one weak row): throughput vs the verbatim path at growing record counts,
  markup/header leakage checked on the output;
- perceptual audio near-dedup end-to-end (energy fingerprints → banded
  hamming join → CC keeper marks) with planted clone cliques — keeper
  count must stay constant across scales;
- the streaming media funnel (``media_ingest_sink``): per-ingest wall as
  the accumulated state grows, against the one-shot ``curate_media``
  recompute at the same points (batch-bound vs corpus-bound).

Usage: python tools/r8_probe.py [n_replicas]   (default 10; 20/30 for the
r7-style rehearsal ladder)
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os
import shutil
import struct
import sys
import time
import zlib
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _png(body: bytes) -> bytes:
    ihdr = struct.pack(">IIBBBBB", 7, 5, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)) + body
    )


def _wav(pcm: bytes) -> bytes:
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )


def _mp4(body: bytes) -> bytes:
    return struct.pack(">I", 16) + b"ftypisom" + b"\x00" * 4 + body


def main() -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from pulsar_replay_spark.operators import multimodal as mm
    from pulsar_replay_spark.session import get_spark
    from pulsar_replay_spark.sources import corpusio

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("r8-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_replicas": n}

    def timeit(name, thunk):
        t0 = time.perf_counter()
        r = thunk()
        out[name] = round(time.perf_counter() - t0, 2)
        return r

    # --- raw-WARC response records: HTTP extraction at scale -------------
    # n*5k response records (HTTP headers + HTML; 1/3 gzip content-coding)
    # across 8 .warc.gz segments — the shape of a raw Common Crawl pull.
    n_recs = n * 5_000
    warc_dir = f"/tmp/r8_warc_{n}"
    if not os.path.exists(warc_dir):
        os.makedirs(warc_dir)
        rng = np.random.default_rng(8)
        per_seg = (n_recs + 7) // 8
        for s in range(8):
            buf = []
            for i in range(s * per_seg, min((s + 1) * per_seg, n_recs)):
                html = (
                    "<html><head><script>junk()</script></head><body>"
                    f"<p>doc {i} " + " ".join(
                        f"w{t}" for t in rng.integers(0, 5000, size=40)
                    ) + "</p></body></html>"
                ).encode()
                if i % 3 == 0:
                    payload = gzip.compress(html)
                    http = (
                        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                        b"Content-Encoding: gzip\r\n\r\n" + payload
                    )
                else:
                    http = (
                        b"HTTP/1.1 200 OK\r\n"
                        b"Content-Type: text/html; charset=utf-8\r\n\r\n" + html
                    )
                hdr = (
                    f"WARC/1.0\r\nWARC-Type: response\r\n"
                    f"WARC-Target-URI: https://x.example/{i}\r\n"
                    f"Content-Length: {len(http)}\r\n\r\n"
                ).encode()
                buf.append(gzip.compress(hdr + http + b"\r\n\r\n"))
            with open(f"{warc_dir}/seg{s}.warc.gz", "wb") as fh:
                fh.write(b"".join(buf))
    got = timeit(
        f"warc_extract_{n_recs}",
        lambda: corpusio.read_warc_corpus(spark, warc_dir).localCheckpoint(
            eager=True
        ),
    )
    out["warc_rows"] = got.count()
    leaked = got.filter(
        F.col("text").contains("<") | F.col("text").contains("HTTP/1.1")
        | F.col("text").contains("junk()")
    ).count()
    out["warc_markup_or_header_leaks"] = leaked
    timeit(
        f"warc_verbatim_{n_recs}",
        lambda: corpusio.read_warc_corpus(spark, warc_dir, extract_http=False)
        .localCheckpoint(eager=True)
        .count(),
    )

    # --- perceptual audio dedup: planted clone cliques, distributed gen --
    n_bases = 600
    n_clips = n_bases * n  # replica r of base b = amplitude-nudged clone

    def gen_clips(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "payload": [], "media_type": [],
                    "byte_len": [], "sha256": []}
            for i in pdf["id"]:
                base, rep = int(i) % n_bases, int(i) // n_bases
                g = np.random.default_rng(base)
                lv = np.cumsum(g.integers(-40, 41, size=60)) % 200
                clip = np.repeat(lv, 100).astype(np.uint8)  # 6 KB
                if rep:
                    ng = np.random.default_rng(1_000_000 + rep)
                    idx = ng.integers(0, clip.size, size=40)
                    clip[idx] = np.minimum(255, clip[idx] + 2)
                raw = clip.tobytes()
                rows["doc_id"].append(int(i))
                rows["payload"].append(raw)
                rows["media_type"].append("audio/wav")
                rows["byte_len"].append(len(raw))
                rows["sha256"].append(hashlib.sha256(raw).hexdigest())
            yield pd.DataFrame(rows)

    clips = (
        spark.range(n_clips)
        .repartition(32)
        .mapInPandas(
            gen_clips,
            "doc_id long, payload binary, media_type string, byte_len int, sha256 string",
        )
        .localCheckpoint(eager=True)
    )
    marks = timeit(
        f"audio_dedup_{n_clips}",
        lambda: mm.audio_dedup(
            clips, max_hamming=4, window_ms=100, hop_ms=50
        ).localCheckpoint(eager=True),
    )
    out["audio_clips"] = n_clips
    out["audio_keepers"] = marks.filter(F.col("keep")).count()
    out["audio_clusters"] = (
        marks.select("cluster_id").distinct().count()
    )

    # --- streaming media funnel: per-ingest wall vs one-shot recompute ---
    from pulsar_replay_spark.pipeline import curate_media
    from pulsar_replay_spark.streaming import pipelines

    per_batch = 700 * n
    rng = np.random.default_rng(88)

    def media_rows(batch_idx: int) -> list[dict]:
        rows = []
        for j in range(per_batch):
            k = batch_idx * per_batch + j
            kind = k % 4
            body = bytes(rng.integers(0, 256, size=1536).astype(np.uint8))
            if kind <= 1:  # half images; every 8th an earlier image nudged
                payload = _png(body)
                if j % 8 == 0 and rows:
                    prev = bytearray(rows[-1]["payload"])
                    for p in range(40, len(prev), 301):
                        prev[p] = min(255, prev[p] + 2)
                    payload = bytes(prev)
            elif kind == 2:
                payload = _wav(body)
            else:
                payload = _mp4(body)
            rows.append(
                {
                    "doc_id": int(hashlib.sha256(payload).hexdigest()[:15], 16),
                    "payload": payload,
                    "media_type": {0: "image/png", 1: "image/png",
                                   2: "audio/wav", 3: "video/mp4"}[kind],
                    "byte_len": len(payload),
                    "sha256": hashlib.sha256(payload).hexdigest(),
                }
            )
        return rows

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = f"/tmp/r8_media_src_{n}"
    state = f"/tmp/r8_media_state_{n}"
    ck = f"/tmp/r8_media_ck_{n}"
    for d in (src, state, ck):
        if os.path.exists(d):
            shutil.rmtree(d)
    os.makedirs(src)
    schema = pa.schema(
        [("doc_id", pa.int64()), ("payload", pa.binary()),
         ("media_type", pa.string()), ("byte_len", pa.int32()),
         ("sha256", pa.string())]
    )
    knobs = dict(max_hamming=4, n_frames=3, grid=8, fake=True, frame_len=64)
    all_rows: list[dict] = []
    for b in range(3):
        rows = media_rows(b)
        all_rows.extend(rows)
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), f"{src}/b{b}.parquet")
        stream = (
            spark.readStream.schema(
                "doc_id long, payload binary, media_type string, "
                "byte_len int, sha256 string"
            )
            .option("maxFilesPerTrigger", 10)
            .parquet(src)
        )
        timeit(
            f"media_sink_ingest_{b}",
            lambda: pipelines.media_ingest_sink(stream, state, ck, **knobs)
            .awaitTermination(),
        )
        corpus = spark.createDataFrame(
            [tuple(r.values()) for r in all_rows],
            "doc_id long, payload binary, media_type string, byte_len int, sha256 string",
        )
        timeit(
            f"curate_media_oneshot_{b}",
            lambda: curate_media(corpus, **knobs)["frame_marks"]
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
    served = pipelines.media_curation_read(spark, state)
    out["media_rows_total"] = len(all_rows)
    out["media_served_deduped"] = served["deduped"].count()
    out["media_served_frames_kept"] = served["frames_kept"].count()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
