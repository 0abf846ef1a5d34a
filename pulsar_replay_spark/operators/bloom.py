"""Bloom-filter membership prefilter for incremental-ingest dedup.

The question a daily ingest asks at 100 TB is "which of today's ~1e6 new
documents already exist in the ~1e10-document history?" — and the only
structure that answers it without shuffling (or even re-reading) the history
per batch is a Bloom filter over the history's content keys:

- **build** is one scan of the history's key column, no shuffle at all: each
  scan partition folds its keys into a local ``m/8``-byte bitmap
  (mapInPandas — the bitmap size is fixed by the filter, not by the
  partition's row count), and the driver ORs the per-partition bitmaps via
  ``toLocalIterator`` so peak driver memory is two bitmaps, not P. At 1e9
  keys / 1 % fpp the bitmap is ~1.2 GB — still broadcastable; past that,
  shard the filter by ingest date/key-range and probe each shard's filter
  (filters OR trivially, so shards also merge back).
- **probe** is a pure per-row filter against the broadcast bitmap (Arrow
  pandas UDF, zero Exchange): the new batch never joins the history. True
  duplicates always hit (no false negatives); a tunable ``fpp`` fraction of
  clean docs hit spuriously.
- **confirm** (optional) removes the false positives exactly: the candidate
  set (true dups + fpp·batch, i.e. tiny) is broadcast against one history
  scan — an equi-join that never shuffles the history. Skip it when the
  fpp-sized over-drop is acceptable (the common curation posture) and the
  history is never read at all.

Hashes are the classic double-hashing scheme over one md5 (Kirsch &
Mitzenmacher, "Less Hashing, Same Performance"): position_i =
(h1 + i·h2) mod m with h1/h2 the two 64-bit halves of md5(key). md5 keeps
build and probe bit-for-bit reproducible anywhere (same reason every other
signature in this engine is md5-derived).

Reference intent: the backup scripts' "skip topics that already exist"
restore guard (pulsar_backup_restore.py:188-204) is this membership test at
catalog scale; here it is re-expressed for corpus scale.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def bloom_params(expected_n: int, fpp: float = 0.01) -> tuple[int, int]:
    """(n_bits, n_hashes) for an expected key count and false-positive rate.

    m = ceil(-n·ln p / ln²2), k = max(1, round(m/n·ln 2)) — the textbook
    optimum; both are pure functions so build and probe can recompute them.
    """
    n = max(1, expected_n)
    m = math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))
    # Byte-align so the bitmap round-trips through bytes without padding bits.
    m = ((m + 7) // 8) * 8
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _positions(key: str, n_bits: int, n_hashes: int) -> np.ndarray:
    """The k bit positions for one key (shared by build and probe)."""
    d = hashlib.md5(key.encode("utf-8")).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1  # odd → full-period stepping
    return np.fromiter(
        ((h1 + i * h2) % n_bits for i in range(n_hashes)), dtype=np.int64, count=n_hashes
    )


def _positions_hex128(keys, n_bits: int, n_hashes: int) -> np.ndarray:
    """Vectorized (N, k) bit positions for keys that ARE 32-hex-char
    128-bit hashes already (gram hashes, content md5s): no per-key md5 —
    h1/h2 are the two 64-bit halves of the key itself, decoded for the
    whole batch in one ``bytes.fromhex`` + numpy view. uint64 arithmetic
    wraps mod 2^64 identically on build and probe, so the double-hashing
    positions stay deterministic. Every key must be EXACTLY 32 hex chars:
    the batch decode concatenates keys, so one short/long key that keeps
    the total length a multiple of 32 would silently shift every later
    key's h1/h2 — on the probe side that is a Bloom FALSE NEGATIVE,
    breaking the no-false-negatives guarantee the incremental scrub
    relies on. Checked vectorized, raising a named error instead."""
    karr = np.asarray(keys, dtype="U")
    if len(karr):
        klens = np.char.str_len(karr)
        if (klens != 32).any():
            bad = karr[klens != 32][0]
            raise ValueError(
                "bloom key_kind='hex128' requires exactly 32-hex-char "
                f"keys; got {str(bad)!r} (length {len(str(bad))})"
            )
    buf = bytes.fromhex("".join(keys))
    halves = np.frombuffer(buf, dtype=">u8").reshape(len(keys), 2)
    h1 = halves[:, 0].astype(np.uint64)
    h2 = (halves[:, 1] | np.uint64(1)).astype(np.uint64)
    i = np.arange(n_hashes, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(n_bits)).astype(
        np.int64
    )


def bloom_build(
    keys: DataFrame,
    key_col: str,
    n_bits: int,
    n_hashes: int,
    key_kind: str = "md5",
) -> bytes:
    """One-scan, zero-shuffle Bloom build over ``keys[key_col]`` (string).

    Each scan partition emits exactly one row carrying its local bitmap;
    the driver ORs them streamingly (two-bitmap peak memory). The result is
    a plain ``bytes`` the caller broadcasts / persists next to its index
    state (it is also what ``operators/artifacts.py`` would store: the
    filter IS the model artifact of incremental exact-dedup).

    ``key_kind='hex128'`` declares the key column already IS a uniform
    32-hex-char 128-bit hash (gram hashes, content md5s): build and probe
    then derive positions from the key's own bits, fully vectorized — no
    per-key Python md5. The two kinds produce INCOMPATIBLE bitmaps; a
    filter must be probed with its build-time kind (same discipline as
    the gram store's impl meta).
    """
    if key_kind not in ("md5", "hex128"):
        raise ValueError(f"bloom key_kind must be 'md5'|'hex128', got {key_kind!r}")
    n_bytes = n_bits // 8

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(n_bytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            col = pdf[key_col]
            keys = col[col.notna()]
            if not len(keys):
                continue
            seen = True
            if key_kind == "hex128":
                pos = _positions_hex128(list(keys), n_bits, n_hashes).ravel()
                np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
            else:
                for key in keys:
                    pos = _positions(key, n_bits, n_hashes)
                    np.bitwise_or.at(
                        bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8)
                    )
        if seen:
            yield pd.DataFrame({"bitmap": [bits.tobytes()]})

    parts = keys.select(key_col).mapInPandas(fold, schema="bitmap binary")
    acc = np.zeros(n_bytes, dtype=np.uint8)
    for row in parts.toLocalIterator():
        acc |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return acc.tobytes()


def bloom_might_contain(
    df: DataFrame,
    key: Column | str,
    bitmap: bytes,
    n_hashes: int,
    out: str = "might_contain",
    key_kind: str = "md5",
) -> DataFrame:
    """Append a boolean ``out`` column: key's k bits all set in ``bitmap``.

    A pure projection (no Exchange — plan-gated in tests): the bitmap rides
    to executors as an explicit SparkContext broadcast, so the probe costs
    one Arrow batch pass regardless of history size. ``key_kind`` must
    match the filter's build-time kind (see ``bloom_build``); 'hex128'
    probes an entire Arrow batch in a handful of numpy ops.
    """
    if key_kind not in ("md5", "hex128"):
        raise ValueError(f"bloom key_kind must be 'md5'|'hex128', got {key_kind!r}")
    n_bits = len(bitmap) * 8
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(bitmap)

    @F.pandas_udf(T.BooleanType())
    def probe(s: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        outv = np.zeros(len(s), dtype=bool)
        if key_kind == "hex128":
            mask = s.notna().to_numpy()
            keys = list(s[mask])
            if keys:
                pos = _positions_hex128(keys, n_bits, n_hashes)  # (N, k)
                hit = (
                    bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)
                ).astype(bool).all(axis=1)
                outv[mask] = hit
            return pd.Series(outv)
        for i, key in enumerate(s):
            if key is None:
                continue
            pos = _positions(key, n_bits, n_hashes)
            outv[i] = bool(np.all(bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)))
        return pd.Series(outv)

    key_c = F.col(key) if isinstance(key, str) else key
    return df.withColumn(out, probe(key_c))


def bloom_dedup_new_batch(
    new_docs: DataFrame,
    history: DataFrame,
    key_col: str = "content_key",
    expected_history_n: int | None = None,
    fpp: float = 0.01,
    confirm: bool = True,
) -> DataFrame:
    """Drop new-batch docs whose ``key_col`` already exists in ``history``.

    Two-phase: (1) Bloom probe keeps only might-contain candidates out of
    the batch — everything else is provably clean without touching the
    history; (2) with ``confirm=True`` the candidate keys (tiny: true dups
    + fpp·batch) broadcast against one history scan to clear false
    positives exactly, so the result equals the plain anti-join — but the
    history is scanned, never shuffled. ``confirm=False`` skips phase 2
    (accepting an ≤fpp over-drop) and the history is not read at all at
    probe time — the streaming-ingest posture where the filter is a
    persisted artifact updated per batch.
    """
    if expected_history_n is None:
        expected_history_n = history.count()
    n_bits, n_hashes = bloom_params(expected_history_n, fpp)
    bitmap = bloom_build(history, key_col, n_bits, n_hashes)

    probed = bloom_might_contain(new_docs, key_col, bitmap, n_hashes)
    clean = probed.filter(~F.col("might_contain")).drop("might_contain")
    if not confirm:
        return clean
    candidates = probed.filter(F.col("might_contain")).drop("might_contain")
    # Exact confirm without ever shuffling the history: stream the history
    # scan past the BROADCAST candidate keys (semi-join) to learn which
    # candidates are truly present — only that tiny present-set shuffles
    # (for its distinct) and broadcasts back. Candidates not present are the
    # Bloom false positives, which are genuinely clean.
    cand_keys = candidates.select(key_col).distinct()
    present = (
        history.join(F.broadcast(cand_keys), on=key_col, how="left_semi")
        .select(key_col)
        .distinct()
    )
    rescued = candidates.join(F.broadcast(present), on=key_col, how="left_anti")
    return clean.unionByName(rescued)
