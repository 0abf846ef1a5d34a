"""Perceptual (near-dup) AUDIO dedup: per-window energy-delta sign
fingerprints + the shared banded hamming join + cluster marks.

The r7 gap this covers: audio had only exact sha256 dedup — one re-encode
or amplitude nudge defeats it. These tests pin (a) the fingerprint kernel
against an INDEPENDENT naive python oracle (pure loops, no numpy, no
cumsum), (b) planted nudged-clone collapse / distinct-clip survival with
the pair set equal to the oracle's all-pairs hamming sweep, (c) the
no-cartesian candidate plan, (d) the REAL library-free PCM WAV path, and
(e) incremental probe ≡ full recompute.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from pulsar_replay_spark.operators import multimodal as mm


def _oracle_audio_fp(raw: bytes, window_ms: int = 1000, hop_ms: int = 500,
                     bits: int = 56) -> int:
    """Naive re-derivation of the fingerprint contract: per-window byte
    means summed directly (no cumsum), python loops only."""
    dur = max(len(raw), 1)
    energies, start = [], 0
    while start < dur:
        end = min(start + window_ms, dur)
        window = raw[start:end]
        energies.append(sum(window) / len(window) if window else 0.0)
        if end == dur:
            break
        start += hop_ms
    if len(energies) > bits + 1:
        energies = [energies[(i * len(energies)) // (bits + 1)]
                    for i in range(bits + 1)]
    sig = 0
    for i in range(len(energies) - 1):
        if energies[i] < energies[i + 1]:
            sig |= 1 << i
    return sig


def _clip(seed: int, n_bytes: int = 30_000) -> bytes:
    """Clip with a strong random-walk energy envelope: adjacent-window
    energy deltas are large, so small byte nudges never flip a sign bit."""
    rng = np.random.default_rng(seed)
    n_win = n_bytes // 500
    levels = np.cumsum(rng.integers(-40, 41, size=n_win)) % 200
    sig = np.repeat(levels, 500)[:n_bytes].astype(np.uint8)
    return sig.tobytes()


def _nudge(raw: bytes, seed: int, n_flips: int = 40) -> bytes:
    rng = np.random.default_rng(seed)
    arr = bytearray(raw)
    for i in rng.integers(0, len(arr), size=n_flips):
        arr[i] = (arr[i] + int(rng.integers(1, 3))) % 256
    return bytes(arr)


def _media_df(spark, clips: dict[int, bytes], media_type: str = "audio/wav"):
    rows = [(k, v, media_type) for k, v in clips.items()]
    return spark.createDataFrame(rows, "doc_id long, payload binary, media_type string")


def test_audio_fp_matches_independent_oracle():
    """Kernel fingerprint == naive oracle across short (< bits windows),
    long (downsampled), single-window, and empty payloads."""
    rng = np.random.default_rng(3)
    payloads = [
        b"",
        bytes(rng.integers(0, 256, size=10).astype(np.uint8)),   # 1 window
        bytes(rng.integers(0, 256, size=5_000).astype(np.uint8)),  # 9 windows
        _clip(7),                                                 # 59 windows
        bytes(rng.integers(0, 256, size=100_000).astype(np.uint8)),
    ]
    for p in payloads:
        assert mm._audio_fp_bytes(p) == _oracle_audio_fp(p)
    # non-default geometry too
    assert (mm._audio_fp_bytes(payloads[3], window_ms=250, hop_ms=100)
            == _oracle_audio_fp(payloads[3], window_ms=250, hop_ms=100))


def test_audio_clones_collapse_distinct_survive(spark):
    """Planted nudged clones pair up; distinct clips don't; the pair set
    equals the oracle's all-pairs hamming sweep; the plan has no cartesian
    product; dedup marks keep exactly one clip per cluster."""
    base_a, base_b = _clip(1), _clip(2)
    clips = {
        10: base_a,
        11: _nudge(base_a, seed=100),
        12: _nudge(base_a, seed=101),
        20: base_b,
        21: _nudge(base_b, seed=102),
        30: _clip(5),  # distinct singleton
    }
    media = _media_df(spark, clips)
    pairs_df = mm.audio_near_dup_pairs(media, max_hamming=4)
    plan = pairs_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan

    got = {(r["doc_a"], r["doc_b"]) for r in pairs_df.collect()}
    sigs = {k: _oracle_audio_fp(v) for k, v in clips.items()}
    want = {
        (a, b)
        for a in clips for b in clips
        if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= 4
    }
    assert got == want
    assert {(10, 11), (10, 12), (20, 21)} <= got
    assert not any(30 in p for p in got)

    marks = {r["doc_id"]: r.asDict() for r in mm.audio_dedup(media).collect()}
    assert len(marks) == len(clips)
    keepers = {d for d, m in marks.items() if m["keep"]}
    assert keepers == {10, 20, 30}
    assert marks[11]["cluster_id"] == marks[12]["cluster_id"] == 10


def test_audio_real_wav_path_collapses_noisy_reencode(spark):
    """fake=False decodes REAL 16-bit PCM WAV (library-free): a clone with
    sample-level noise collapses with its original while a different
    envelope survives — and junk payloads fall back to the byte path
    instead of failing the task."""

    def wav(samples: np.ndarray, sr: int = 4000) -> bytes:
        data = samples.astype("<i2").tobytes()
        hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
               + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
               + b"data" + struct.pack("<I", len(data)))
        return hdr + data

    rng = np.random.default_rng(9)
    t = np.arange(4000 * 30)  # 30 s @ 4 kHz → 59 windows at 1000/500
    env_a = np.repeat(np.cumsum(rng.integers(-900, 901, size=60)) % 8000, 2000)[: t.size]
    env_b = np.repeat(np.cumsum(rng.integers(-900, 901, size=60)) % 8000, 2000)[: t.size]
    tone = np.sign(np.sin(2 * np.pi * 440 * t / 4000))
    clip_a = (env_a * tone).astype(np.int64)
    clip_b = (env_b * tone).astype(np.int64)
    noisy_a = clip_a + rng.integers(-25, 26, size=t.size)

    media = _media_df(spark, {1: wav(clip_a), 2: wav(noisy_a), 3: wav(clip_b)})
    got = {(r["doc_a"], r["doc_b"])
           for r in mm.audio_near_dup_pairs(media, fake=False).collect()}
    assert (1, 2) in got
    assert not any(3 in p for p in got)

    # energies really came from PCM decode, not the byte fallback
    e = mm._wav_pcm_energies(wav(clip_a), 1000, 500)
    assert e is not None and len(e) == 59
    assert mm._wav_pcm_energies(b"not a wav at all", 1000, 500) is None
    # junk payload under fake=False: tolerant byte-path fallback
    assert (mm._audio_fp_bytes(b"junk" * 100, fake=False)
            == mm._audio_fp_bytes(b"junk" * 100, fake=True))


def test_incremental_audio_pairs_equals_full_recompute(spark):
    """Probe-the-store incremental == full recompute restricted to pairs
    touching the new batch (old↔old pairs excluded by construction)."""
    base = _clip(21)
    old_clips = {1: base, 2: _nudge(base, 50), 3: _clip(22)}
    new_clips = {4: _nudge(base, 51), 5: _clip(23), 6: _nudge(_clip(22), 52)}

    old_media = _media_df(spark, old_clips)
    new_media = _media_df(spark, new_clips)
    store = mm.audio_fingerprints(old_media)

    pairs, new_sigs = mm.incremental_audio_pairs(new_media, store)
    got = {(r["doc_a"], r["doc_b"], r["hamming"]) for r in pairs.collect()}

    full = mm.audio_near_dup_pairs(_media_df(spark, {**old_clips, **new_clips}))
    new_ids = set(new_clips)
    want = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in full.collect()
        if r["doc_a"] in new_ids or r["doc_b"] in new_ids
    }
    assert got == want
    assert {(1, 4), (3, 6)} <= {(a, b) for a, b, _ in got}  # cross old↔new hits
    assert new_sigs.columns == ["doc_id", "simhash"]
    assert new_sigs.count() == 3

    # the store compacts with the SHARED bit-signature lifecycle op
    from pulsar_replay_spark.operators import dedup

    doubled = store.unionAll(store)
    assert dedup.compact_simhash_store(doubled).count() == store.count()


def test_wide_audio_fingerprints_route_multi_and_match_oracle(spark):
    """r8 multi-word path: bits=120 fingerprints equal the oracle packed
    into 60-bit words; the pair set equals the oracle's all-pairs sweep at
    the wide width; plan stays a hash join; incremental wide probe == full
    recompute restricted to the batch."""
    from pulsar_replay_spark.operators.dedup import pack_sig_words

    bits, k = 120, 4
    base_a, base_b = _clip(11, n_bytes=90_000), _clip(12, n_bytes=90_000)
    clips = {
        10: base_a,
        11: _nudge(base_a, seed=200),
        20: base_b,
        30: _clip(15, n_bytes=90_000),
    }
    media = _media_df(spark, clips)
    sigs = {
        r["doc_id"]: list(r["sig"])
        for r in mm.audio_fingerprints_wide(media, bits=bits).collect()
    }
    oracle = {k_: _oracle_audio_fp(v, bits=bits) for k_, v in clips.items()}
    for d, s in oracle.items():
        assert sigs[d] == pack_sig_words(s, bits), d

    pairs_df = mm.audio_near_dup_pairs(media, max_hamming=k, bits=bits)
    plan = pairs_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs_df.collect()}
    want = {}
    ids = sorted(clips)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            h = bin(oracle[ids[x]] ^ oracle[ids[y]]).count("1")
            if h <= k:
                want[(ids[x], ids[y])] = h
    assert got == want and (10, 11) in got

    # wide marks: clone loses, distinct clips keep
    marks = {r["doc_id"]: r.asDict()
             for r in mm.audio_dedup(media, max_hamming=k, bits=bits).collect()}
    assert {d for d, m in marks.items() if m["keep"]} == {10, 20, 30}

    # incremental: probe a second batch against the first batch's store
    store = mm.audio_fingerprints_wide(
        _media_df(spark, {10: base_a, 20: base_b}), bits=bits
    )
    batch2 = _media_df(spark, {11: clips[11], 30: clips[30]})
    ipairs, new_sigs = mm.incremental_audio_pairs(
        batch2, store, max_hamming=k, bits=bits
    )
    got_inc = {(r["doc_a"], r["doc_b"]) for r in ipairs.collect()}
    assert got_inc == {p for p in want if 11 in p or 30 in p}
    assert {r["doc_id"] for r in new_sigs.collect()} == {11, 30}


# ---------------------------------------------------------------------------
# r9: onset-anchored (shift-robust) fingerprints — a clone with leading
# silence collapses once windowing anchors at the onset.
# ---------------------------------------------------------------------------


def _oracle_audio_fp_onset(raw: bytes, onset_ratio: float, **kw) -> int:
    """Oracle extension: trim leading sub-onset bytes (first byte reaching
    onset_ratio·peak anchors), then the unchanged fingerprint oracle."""
    if raw:
        peak = max(raw)
        if peak > 0:
            thr = onset_ratio * peak
            start = next((i for i, v in enumerate(raw) if v >= thr), 0)
            raw = raw[start:]
    return _oracle_audio_fp(raw, **kw)


def test_onset_anchor_collapses_leading_silence_clones(spark):
    """A clone padded with ~400 ms of leading silence misses at the default
    clip-start anchoring (every window shifts) but collapses under
    onset_ratio=0.05, while distinct clips still survive; kernel ==
    extended oracle on every payload."""
    base = _clip(31)
    padded = bytes(400) + base           # 400 silent bytes = 400 ms lead-in
    clips = {10: base, 11: padded, 20: _clip(32), 21: bytes(250) + _clip(32),
             30: _clip(33)}
    media = _media_df(spark, clips)

    # default anchoring: the silence-padded clone does NOT pair with base
    got_default = {
        (r["doc_a"], r["doc_b"])
        for r in mm.audio_near_dup_pairs(media, max_hamming=4).collect()
    }
    assert (10, 11) not in got_default and (20, 21) not in got_default

    # onset anchoring: both padded clones collapse, the distinct clip stays
    pairs = mm.audio_near_dup_pairs(media, max_hamming=4, onset_ratio=0.05)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert {(10, 11), (20, 21)} <= got
    assert not any(30 in p for p in got)

    # kernel == independent oracle, per payload
    for p in clips.values():
        assert mm._audio_fp_bytes(p, onset_ratio=0.05) == _oracle_audio_fp_onset(
            p, 0.05
        )
    # identical-fingerprint check: pure silence pad never changes the sig
    assert mm._audio_fp_bytes(base, onset_ratio=0.05) == mm._audio_fp_bytes(
        padded, onset_ratio=0.05
    )

    # dedup marks under onset anchoring: one keeper per padded pair
    marks = {
        r["doc_id"]: r["keep"]
        for r in mm.audio_dedup(media, onset_ratio=0.05).collect()
    }
    assert marks == {10: True, 11: False, 20: True, 21: False, 30: True}


def test_onset_anchor_real_wav_and_edge_cases(spark):
    """Real-PCM path: a 16-bit WAV clone with a leading-silence region
    collapses under onset anchoring; all-zero and empty payloads stay
    total; incremental ≡ full recompute with the knob threaded."""
    import struct as st

    def wav(samples: np.ndarray, sr: int = 4000) -> bytes:
        data = samples.astype("<i2").tobytes()
        hdr = (
            b"RIFF" + st.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + st.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
            + b"data" + st.pack("<I", len(data))
        )
        return hdr + data
    rng = np.random.default_rng(77)
    n_win = 60
    levels = (np.cumsum(rng.integers(-3000, 3001, size=n_win)) % 12000) + 1000
    body = np.repeat(levels, 4000)  # 1 s per level at sr=4000
    silent = np.zeros(1600, dtype=np.int64)  # 400 ms of digital silence
    a, b = wav(body), wav(np.concatenate([silent, body]))
    assert mm._audio_fp_bytes(a, fake=False, onset_ratio=0.05) == \
        mm._audio_fp_bytes(b, fake=False, onset_ratio=0.05)
    assert mm._audio_fp_bytes(a, fake=False) != mm._audio_fp_bytes(b, fake=False)

    # totality: silence-only / empty payloads fingerprint to 0, never raise
    assert mm._audio_fp_bytes(bytes(5000), onset_ratio=0.05) == 0
    assert mm._audio_fp_bytes(b"", onset_ratio=0.05) == 0
    assert mm._audio_fp_bytes(wav(np.zeros(8000, dtype=np.int64)),
                              fake=False, onset_ratio=0.05) in (0,)

    # incremental ≡ full with onset anchoring on
    base = _clip(41)
    old_media = _media_df(spark, {1: base, 2: _clip(42)})
    new_media = _media_df(spark, {3: bytes(300) + base})
    store = mm.audio_fingerprints(old_media, onset_ratio=0.05)
    pairs, _sigs = mm.incremental_audio_pairs(
        new_media, store, onset_ratio=0.05
    )
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    full = {
        (r["doc_a"], r["doc_b"])
        for r in mm.audio_near_dup_pairs(
            _media_df(spark, {1: base, 2: _clip(42), 3: bytes(300) + base}),
            onset_ratio=0.05,
        ).collect()
        if 3 in (r["doc_a"], r["doc_b"])
    }
    assert got == full and (1, 3) in got
