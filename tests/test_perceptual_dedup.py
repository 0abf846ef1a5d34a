"""Perceptual (near-dup) image/frame dedup: dHash signatures + banded
hamming pairs + cluster marks.

The r6 gap this covers: exact frame_dedup collapses byte-identical frames
only — one pixel of re-encode noise defeats it. These tests pin (a) the
dHash kernel against an INDEPENDENT naive python oracle, (b) planted
nudged-clone collapse / distinct survival semantics at the thumb level,
(c) the no-cartesian candidate plan, and (d) the end-to-end frame pipeline
through the locality-preserving fake resize.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pulsar_replay_spark.operators import multimodal as mm


def _oracle_dhash(thumb: bytes, width: int, height: int, grid: int) -> int:
    """Naive double-loop re-derivation of the dHash contract (no shared
    code with the kernel beyond the docstring's math)."""
    arr = np.frombuffer(thumb, dtype=np.uint8).astype(float)
    ch = len(arr) // (width * height)
    gray = arr.reshape(height, width, ch).mean(axis=2)
    cells = np.zeros((grid, grid))
    if height >= grid and width >= grid:
        for r in range(grid):
            for c in range(grid):
                rs = [i for i in range(height) if (i * grid) // height == r]
                cs = [j for j in range(width) if (j * grid) // width == c]
                cells[r, c] = np.mean([gray[i, j] for i in rs for j in cs])
    else:
        for r in range(grid):
            for c in range(grid):
                cells[r, c] = gray[
                    min((r * height) // grid, height - 1),
                    min((c * width) // grid, width - 1),
                ]
    sig = 0
    for r in range(grid):
        for c in range(grid - 1):
            if cells[r, c] < cells[r, c + 1]:
                sig |= 1 << (r * (grid - 1) + c)
    return sig


def _gradient_thumb(seed: int, w: int = 16, h: int = 16, channels: int = 1) -> bytes:
    """Strong-gradient image: adjacent-cell luminance differences are large,
    so ±2 pixel noise can never flip a dHash sign bit."""
    rng = np.random.default_rng(seed)
    base = (np.arange(h)[:, None] * 29 + np.arange(w)[None, :] * 37) % 200
    img = (base + rng.integers(0, 3, size=(h, w))).astype(np.uint8)
    if channels > 1:
        img = np.repeat(img[:, :, None], channels, axis=2)
    return img.tobytes()


def _nudge(thumb: bytes, seed: int, amp: int = 2) -> bytes:
    rng = np.random.default_rng(seed)
    arr = np.frombuffer(thumb, dtype=np.uint8).astype(int)
    noisy = np.clip(arr + rng.integers(-amp, amp + 1, size=arr.shape), 0, 255)
    return noisy.astype(np.uint8).tobytes()


def _thumb_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, width int, height int, thumb binary"
    )


def test_dhash_matches_independent_oracle(spark):
    """Spark kernel output == naive oracle for grayscale and RGB thumbs,
    exact-divisible and ragged grid mappings, and tiny sub-grid thumbs."""
    cases = []
    rng = np.random.default_rng(11)
    for i, (w, h, ch) in enumerate(
        [(16, 16, 1), (16, 16, 3), (13, 9, 1), (32, 8, 3), (4, 4, 1)]
    ):
        cases.append((i, w, h, rng.integers(0, 256, size=w * h * ch).astype(np.uint8).tobytes()))
    df = _thumb_df(spark, [(i, w, h, t) for i, w, h, t in cases])
    got = {r["doc_id"]: r["simhash"] for r in mm.dhash_signatures(df).collect()}
    for i, w, h, t in cases:
        assert got[i] == _oracle_dhash(t, w, h, mm.DHASH_GRID), (i, w, h)


def test_dhash_bytes_validates_input():
    with pytest.raises(ValueError, match="not a multiple"):
        mm._dhash_bytes(b"\x00" * 7, 4, 4)
    with pytest.raises(ValueError, match="bad thumb dims"):
        mm._dhash_bytes(b"", 0, 4)


def test_image_near_dup_pairs_planted_clones_collapse(spark):
    """Nudged clones (±2 pixel noise on a strong-gradient image) pair up
    within the hamming radius; independent images never pair; the candidate
    plan is the banded equi-join, not a cross product."""
    base0, base1 = _gradient_thumb(0), _gradient_thumb(1, w=13, h=9)
    rng_imgs = [
        np.random.default_rng(100 + i).integers(0, 256, size=16 * 16).astype(np.uint8).tobytes()
        for i in range(4)
    ]
    rows = [
        (0, 16, 16, base0),
        (1, 16, 16, _nudge(base0, 7)),
        (2, 16, 16, _nudge(base0, 8)),
        (10, 13, 9, base1),
        (11, 13, 9, _nudge(base1, 9)),
        (20, 16, 16, rng_imgs[0]),
        (21, 16, 16, rng_imgs[1]),
        (22, 16, 16, rng_imgs[2]),
        (23, 16, 16, rng_imgs[3]),
    ]
    df = _thumb_df(spark, rows)
    pairs_df = mm.image_near_dup_pairs(df, max_hamming=4)
    plan = pairs_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    pairs = {(r["doc_a"], r["doc_b"]) for r in pairs_df.collect()}
    assert {(0, 1), (0, 2), (1, 2), (10, 11)} <= pairs
    clone_ids = {0, 1, 2} | {10, 11}
    for a, b in pairs:
        assert not ({a, b} & {20, 21, 22, 23}), f"independent image paired: {(a, b)}"
        assert ({a, b} <= {0, 1, 2}) or ({a, b} <= {10, 11}), (a, b)
    assert clone_ids is not None


def test_image_dedup_marks_keep_one_per_cluster(spark):
    base = _gradient_thumb(3)
    rows = [
        (5, 16, 16, base),
        (6, 16, 16, _nudge(base, 1)),
        (7, 16, 16, _nudge(base, 2)),
        (40, 16, 16, np.random.default_rng(300).integers(0, 256, size=256).astype(np.uint8).tobytes()),
    ]
    marks = {r["doc_id"]: r for r in mm.image_dedup(_thumb_df(spark, rows)).collect()}
    assert len(marks) == 4
    assert marks[5]["keep"] and not marks[6]["keep"] and not marks[7]["keep"]
    assert marks[5]["cluster_id"] == marks[6]["cluster_id"] == marks[7]["cluster_id"] == 5
    assert marks[40]["keep"] and marks[40]["cluster_id"] == 40


def test_frame_pipeline_end_to_end_collapses_nudged_videos(spark):
    """frame_sample(fake) → frame_thumbs(locality-preserving fake) →
    frame_dedup_perceptual: a video whose payload differs from another's by
    a few nudged bytes collapses frame-wise with it, while a structurally
    different video survives — the exact-hash frame_dedup misses ALL of
    these (every payload differs byte-wise)."""
    # seeded-random payloads: every 64-byte frame is distinct content (a
    # gradient/ramp payload makes a video's own frames genuinely
    # near-identical visually, which is honest perceptual behavior but not
    # what this test plants); the nudge touches ≤1 byte per frame, flipping
    # at most 2 sign bits
    base = bytes(np.random.default_rng(42).integers(0, 256, size=4096).astype(np.uint8))
    nudged = bytearray(base)
    for i in range(0, len(nudged), 257):
        nudged[i] = min(255, nudged[i] + 2)
    nudged = bytes(nudged)
    other = bytes(np.random.default_rng(43).integers(0, 256, size=4096).astype(np.uint8))
    media = spark.createDataFrame(
        [(1, "video/mp4", base), (2, "video/mp4", nudged), (3, "video/mp4", other)],
        "doc_id long, media_type string, payload binary",
    )
    # 64-byte slices: the contract default (16) nearest-samples into only 8
    # informative dHash bits — too coarse to separate distinct content
    frames = mm.frame_sample(media, n_frames=4, frame_len=64).localCheckpoint(
        eager=True
    )

    # exact dedup sees three byte-distinct payloads: nothing collapses
    exact = mm.frame_dedup(frames).collect()
    assert all(r["keep"] for r in exact)

    marks_df = mm.frame_dedup_perceptual(frames, max_hamming=4)
    plan = marks_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    marks = {(r["doc_id"], r["frame_idx"]): r for r in marks_df.collect()}
    assert len(marks) == 12
    for i in range(4):
        a, b, c = marks[(1, i)], marks[(2, i)], marks[(3, i)]
        cluster = (a["cluster_doc"], a["cluster_frame"])
        assert cluster == (b["cluster_doc"], b["cluster_frame"]), (
            f"nudged frame {i} did not collapse"
        )
        # keeper = min-hash member (uniform-random but rerun-stable): exactly
        # one of the pair keeps, and it IS the decoded cluster identity
        assert a["keep"] != b["keep"]
        keeper = (1, i) if a["keep"] else (2, i)
        assert cluster == keeper
        assert (c["cluster_doc"], c["cluster_frame"]) == (3, i)
        assert c["keep"]

    pairs = mm.frame_near_dup_pairs(frames, max_hamming=4).collect()
    assert all(r["hamming"] <= 4 for r in pairs)
    got_pairs = {
        tuple(sorted([(r["doc_a"], r["frame_a"]), (r["doc_b"], r["frame_b"])]))
        for r in pairs
    }
    assert got_pairs >= {((1, i), (2, i)) for i in range(4)}


def test_frame_item_ids_host_60_bit_content_hash_doc_ids(spark):
    """The frame family must work with the engine's real ids: 60-bit
    content hashes (read_media_dir / corpusio). item_id is an md5 over
    doc:frame (same collision posture as every other 60-bit id) — the old
    arithmetic composite capped doc_id at 2^42 and raised on real data."""
    big = (1 << 60) - 7
    frames = spark.createDataFrame(
        [(big, 0, 0, bytes(range(64))), (big, 1, 0, bytes(range(64)))],
        "doc_id long, frame_idx int, offset_ms long, frame_bytes binary",
    )
    pairs = mm.frame_near_dup_pairs(frames, max_hamming=4).collect()
    assert {(r["doc_a"], r["frame_a"], r["doc_b"], r["frame_b"]) for r in pairs} == {
        (big, 0, big, 1)
    } or {(r["doc_a"], r["frame_a"], r["doc_b"], r["frame_b"]) for r in pairs} == {
        (big, 1, big, 0)
    }
    marks = mm.frame_dedup_perceptual(frames).collect()
    assert len(marks) == 2 and sum(r["keep"] for r in marks) == 1
    sigs = mm.frame_signatures(frames).collect()
    assert {r["doc_id"] for r in sigs} == {big}
    assert len({r["item_id"] for r in sigs}) == 2


def test_frame_thumbs_fake_is_locality_preserving_and_sized(spark):
    frames = spark.createDataFrame(
        [(1, 0, 0, bytes(range(64))), (1, 1, 0, b""), (2, 0, 0, b"\x10")],
        "doc_id long, frame_idx int, offset_ms long, frame_bytes binary",
    )
    rows = {(r["doc_id"], r["frame_idx"]): bytes(r["thumb"]) for r in
            mm.frame_thumbs(frames, width=8, height=8).collect()}
    assert all(len(t) == 64 for t in rows.values())
    assert rows[(1, 1)] == bytes(64)  # empty payload -> zero thumb
    assert rows[(2, 0)] == b"\x10" * 64  # single byte repeats (nearest sample)
    # nearest-sampling of 0..63 into 64 slots is the identity
    assert rows[(1, 0)] == bytes(range(64))


def test_incremental_frame_pairs_equals_full_recompute(spark):
    """The incremental perceptual probe (signature only the NEW batch,
    banded-probe the persisted dHash store) must find EXACTLY the full
    recompute's pairs that touch the batch — and the store union closes the
    full pair set. The incremental≡full discipline for the dHash family."""
    base = bytes(np.random.default_rng(7).integers(0, 256, size=4096).astype(np.uint8))
    nudged = bytearray(base)
    for i in range(0, len(nudged), 301):
        nudged[i] = min(255, nudged[i] + 2)
    media = spark.createDataFrame(
        [(1, "video/mp4", base), (2, "video/mp4", bytes(nudged)),
         (3, "video/mp4", bytes(np.random.default_rng(8).integers(0, 256, size=4096).astype(np.uint8)))],
        "doc_id long, media_type string, payload binary",
    )
    frames = mm.frame_sample(media, n_frames=4, frame_len=64).localCheckpoint(eager=True)
    batch1 = frames.filter("doc_id = 1")
    batch2 = frames.filter("doc_id != 1")

    def key(r):
        return (r["doc_a"], r["frame_a"], r["doc_b"], r["frame_b"])

    full = {key(r) for r in mm.frame_near_dup_pairs(frames, max_hamming=4).collect()}
    b2_items = {(r["doc_id"], r["frame_idx"]) for r in batch2.select("doc_id", "frame_idx").collect()}
    expected = {
        p for p in full
        if (p[0], p[1]) in b2_items or (p[2], p[3]) in b2_items
    }

    sigs1 = mm.frame_signatures(batch1).localCheckpoint(eager=True)
    inc, sigs2 = mm.incremental_frame_pairs(batch2, sigs1, max_hamming=4)
    got = {key(r) for r in inc.collect()}
    assert got == expected and got  # the nudged clone pairs cross the batches
    assert sigs1.unionByName(sigs2).count() == mm.frame_signatures(frames).count()


def test_dhash_invariances_property():
    """The properties the perceptual claim rests on, fuzzed: (1) an RGB
    image with equal channels hashes identically to its grayscale twin
    (channel-mean), (2) a uniform brightness shift never flips a bit (sign
    of adjacent-cell DIFFERENCES), (3) the hash is total on arbitrary sizes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(2, 24),
        st.integers(2, 24),
        st.integers(0, 2**32 - 1),
        st.integers(1, 30),
    )
    def fuzz(w, h, seed, shift):
        rng = np.random.default_rng(seed)
        gray = rng.integers(0, 200, size=(h, w)).astype(np.uint8)
        sig = mm._dhash_bytes(gray.tobytes(), w, h)
        rgb = np.repeat(gray[:, :, None], 3, axis=2)
        assert mm._dhash_bytes(rgb.tobytes(), w, h) == sig
        brighter = (gray.astype(int) + shift).clip(0, 255).astype(np.uint8)
        if (gray.astype(int) + shift).max() <= 255:  # no clipping
            assert mm._dhash_bytes(brighter.tobytes(), w, h) == sig
        assert 0 <= sig < 1 << mm.DHASH_BITS

    fuzz()


def test_incremental_image_pairs_equals_full_recompute(spark):
    """The image-store incremental probe: full pairs restricted to the new
    batch == incremental probe, and the store union closes the signing."""
    base = _gradient_thumb(21)
    rows = [
        (1, 16, 16, base),
        (2, 16, 16, _nudge(base, 1)),
        (3, 16, 16, _nudge(base, 2)),
        (9, 16, 16, np.random.default_rng(900).integers(0, 256, size=256).astype(np.uint8).tobytes()),
    ]
    thumbs = _thumb_df(spark, rows)
    old = thumbs.filter("doc_id in (1, 9)")
    new = thumbs.filter("doc_id in (2, 3)")

    full = {
        (r["doc_a"], r["doc_b"])
        for r in mm.image_near_dup_pairs(thumbs, max_hamming=4).collect()
    }
    expected = {p for p in full if p[0] in (2, 3) or p[1] in (2, 3)}

    store = mm.dhash_signatures(old).localCheckpoint(eager=True)
    inc, new_sigs = mm.incremental_image_pairs(new, store, max_hamming=4)
    got = {(r["doc_a"], r["doc_b"]) for r in inc.collect()}
    assert got == expected and (1, 2) in got  # cross-batch clone recovered
    assert store.unionByName(new_sigs).count() == 4


def test_compact_frame_store_probe_equality(spark):
    """Compacting the frame-signature store (dup collapse + expiry) must not
    change what a new batch's probe finds among RETAINED frames."""
    base = bytes(np.random.default_rng(31).integers(0, 256, size=2048).astype(np.uint8))
    media = spark.createDataFrame(
        [(1, "video/mp4", base), (2, "video/mp4", base)],
        "doc_id long, media_type string, payload binary",
    )
    frames = mm.frame_sample(media, n_frames=2, frame_len=64).localCheckpoint(eager=True)
    sigs = mm.frame_signatures(frames)
    grown = sigs.unionByName(sigs)  # simulated re-ingest duplicates
    compact = mm.compact_frame_store(grown).localCheckpoint(eager=True)
    assert compact.count() == sigs.count()

    nudged = bytearray(base)
    nudged[7] = min(255, nudged[7] + 2)
    new_media = spark.createDataFrame(
        [(9, "video/mp4", bytes(nudged))], "doc_id long, media_type string, payload binary"
    )
    new_frames = mm.frame_sample(new_media, n_frames=2, frame_len=64)
    p_grown, _ = mm.incremental_frame_pairs(new_frames, grown)
    p_compact, _ = mm.incremental_frame_pairs(new_frames, compact)
    key = lambda r: (r["doc_a"], r["frame_a"], r["doc_b"], r["frame_b"])  # noqa: E731
    assert {key(r) for r in p_grown.collect()} == {key(r) for r in p_compact.collect()} != set()

    # expiry: retaining only doc 1's frames removes doc 2 from future probes
    retain = compact.filter("doc_id = 1").select("item_id")
    expired = mm.compact_frame_store(grown, retain_items=retain)
    p_exp, _ = mm.incremental_frame_pairs(new_frames, expired.localCheckpoint(eager=True))
    assert {r["doc_b"] for r in p_exp.collect()} <= {1, 9}


# ---------------------------------------------------------------------------
# r8: multi-word signatures — the 56-bit selectivity ceiling's mitigation
# with code: grids wider than 8 pack grid·(grid−1) bits into 60-bit words
# of an array<long> and route to dedup.banded_hamming_pairs_multi (same
# pigeonhole join, block extraction may straddle a word boundary).
# ---------------------------------------------------------------------------


def test_multi_word_blocks_match_python_bit_slicing(spark):
    """Spark-side block extraction (two shifts + OR across a straddled word
    boundary) == naive python bit slicing of the same wide signature, for
    every block, over random signatures."""
    from pulsar_replay_spark.operators.dedup import (
        SIG_WORD_BITS,
        _multi_word_blocks,
        pack_sig_words,
    )

    bits, k = 132, 4  # grid=12; width=26 — blocks 2 and 4 straddle words
    width = bits // (k + 1)
    rng = np.random.default_rng(12)
    sigs = [int.from_bytes(rng.bytes(17), "little") % (1 << bits) for _ in range(50)]
    df = spark.createDataFrame(
        [(i, pack_sig_words(s, bits)) for i, s in enumerate(sigs)],
        "doc_id long, sig array<long>",
    )
    got = {
        (r["doc_id"], r["blk"]): r["val"]
        for r in _multi_word_blocks(df, k, bits).collect()
    }
    for i, s in enumerate(sigs):
        for b in range(k + 1):
            want = (s >> (b * width)) & ((1 << width) - 1)
            assert got[(i, b)] == want, (i, b)
    assert SIG_WORD_BITS == 60


def test_wide_dhash_matches_oracle_and_routes_multi(spark):
    """grid=12 signatures equal the python oracle word-for-word; the wide
    pair path finds exactly the oracle's all-pairs hamming≤k set; the plan
    is still the banded equi-join (no cartesian)."""
    from pulsar_replay_spark.operators.dedup import pack_sig_words

    grid, k = 12, 4
    bits = grid * (grid - 1)
    base0, base1 = _gradient_thumb(21, w=24, h=24), _gradient_thumb(22, w=24, h=24)
    rows = [
        (0, 24, 24, base0),
        (1, 24, 24, _nudge(base0, 31)),
        (2, 24, 24, _nudge(base0, 32)),
        (10, 24, 24, base1),
        (11, 24, 24, _nudge(base1, 33)),
    ] + [
        (20 + i, 24, 24,
         np.random.default_rng(200 + i).integers(0, 256, size=24 * 24)
         .astype(np.uint8).tobytes())
        for i in range(4)
    ]
    df = _thumb_df(spark, rows)

    sigs = {r["doc_id"]: r["sig"] for r in mm.dhash_signatures_wide(df, grid).collect()}
    oracle = {i: _oracle_dhash(t, w, h, grid) for i, w, h, t in rows}
    for i, s in oracle.items():
        assert list(sigs[i]) == pack_sig_words(s, bits), i

    pairs_df = mm.image_near_dup_pairs(df, max_hamming=k, grid=grid)
    plan = pairs_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs_df.collect()}
    ids = sorted(oracle)
    want = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            h = bin(oracle[ids[x]] ^ oracle[ids[y]]).count("1")
            if h <= k:
                want[(ids[x], ids[y])] = h
    assert got == want
    assert {(0, 1), (0, 2), (10, 11)} <= set(want)  # planted clones load-bear


def test_incremental_image_pairs_wide_equals_full_recompute(spark):
    """Wide-grid incremental probe: batch-2 pairs == the full wide recompute
    restricted to pairs touching batch 2; the appended store rows equal the
    batch's own signatures."""
    grid, k = 12, 4
    base = _gradient_thumb(41, w=24, h=24)
    b1 = [(0, 24, 24, base), (1, 24, 24, _nudge(base, 51))]
    b2 = [(2, 24, 24, _nudge(base, 52)),
          (3, 24, 24,
           np.random.default_rng(300).integers(0, 256, size=24 * 24)
           .astype(np.uint8).tobytes())]
    store = mm.dhash_signatures_wide(_thumb_df(spark, b1), grid)
    pairs, new_sigs = mm.incremental_image_pairs(
        _thumb_df(spark, b2), store, max_hamming=k, grid=grid
    )
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}

    full = mm.image_near_dup_pairs(_thumb_df(spark, b1 + b2), max_hamming=k, grid=grid)
    want = {
        (r["doc_a"], r["doc_b"])
        for r in full.collect()
        if r["doc_a"] in (2, 3) or r["doc_b"] in (2, 3)
    }
    assert got == want and (0, 2) in got  # cross-batch clone recovered
    assert {r["doc_id"] for r in new_sigs.collect()} == {2, 3}


def test_frame_pipeline_wide_grid_routes_multi(spark):
    """Wide-grid frame dedup end-to-end: grid=12 signatures are array<long>
    rows, nudged clone frames still collapse cross-video, the plan has no
    cartesian, and the wide incremental probe == full recompute restricted
    to the batch."""
    rng = np.random.default_rng(77)
    base = bytes(rng.integers(0, 256, size=4096).astype(np.uint8))
    nudged = bytearray(base)
    for i in range(0, len(nudged), 301):
        nudged[i] = min(255, nudged[i] + 2)
    distinct = bytes(rng.integers(0, 256, size=4096).astype(np.uint8))
    media = spark.createDataFrame(
        [(1, bytes(base), "video/mp4"), (2, bytes(nudged), "video/mp4"),
         (3, distinct, "video/mp4")],
        "doc_id long, payload binary, media_type string",
    )
    frames = mm.frame_sample(media, n_frames=3, frame_len=576)  # 24x24 thumbs
    grid = 12

    sigs = mm.frame_signatures(frames, grid=grid)
    assert dict(sigs.dtypes)["sig"] == "array<bigint>"

    pairs_df = mm.frame_near_dup_pairs(frames, max_hamming=6, grid=grid)
    plan = pairs_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    pairs = {
        ((r["doc_a"], r["frame_a"]), (r["doc_b"], r["frame_b"]))
        for r in pairs_df.collect()
    }
    for idx in range(3):  # each nudged frame pairs with its original
        assert ((1, idx), (2, idx)) in pairs or ((2, idx), (1, idx)) in pairs
    assert not any(3 in (a[0], b[0]) for a, b in pairs)

    marks = mm.frame_dedup_perceptual(frames, max_hamming=6, grid=grid)
    keep = {(r["doc_id"], r["frame_idx"]): r["keep"] for r in marks.collect()}
    assert sum(keep.values()) == 6  # 3 clone-pair keepers + 3 distinct frames

    # incremental: probe video 2+3's frames against video 1's store
    f1 = mm.frame_sample(media.filter("doc_id = 1"), n_frames=3, frame_len=576)
    f23 = mm.frame_sample(media.filter("doc_id != 1"), n_frames=3, frame_len=576)
    store = mm.frame_signatures(f1, grid=grid)
    ipairs, new_sigs = mm.incremental_frame_pairs(f23, store, max_hamming=6, grid=grid)
    got = {
        ((r["doc_a"], r["frame_a"]), (r["doc_b"], r["frame_b"]))
        for r in ipairs.collect()
    }
    want = {p for p in pairs if 2 in (p[0][0], p[1][0]) or 3 in (p[0][0], p[1][0])}
    assert got == want
    assert new_sigs.count() == 6
