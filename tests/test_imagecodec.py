"""Vendored BMP/VID0 codec unit tests + real-pixel multimodal stages.

The codec is the foundation of the REAL (non-stub) multimodal path:
these tests pin the wire format (header fields, bottom-up BGR rows,
stride padding), the exact nearest-neighbor source map, and the
position-weighted checksum the DuckDB oracle recomputes analytically.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from eventhub_to_timescale_spark.operators import imagecodec as ic


def _gradient(w, h):
    ys = np.arange(h, dtype=np.int64)[:, None]
    xs = np.arange(w, dtype=np.int64)[None, :]
    return np.stack(
        [
            np.broadcast_to((xs * 5 + ys) % 256, (h, w)),
            np.broadcast_to((xs + ys * 7) % 256, (h, w)),
            np.broadcast_to((xs * 3 + ys * 11) % 256, (h, w)),
        ],
        axis=-1,
    ).astype(np.uint8)


class TestBmpCodec:
    def test_roundtrip_exact(self):
        for w, h in [(1, 1), (3, 2), (4, 4), (31, 17), (64, 64)]:
            arr = _gradient(w, h)
            data = ic.encode_bmp(arr)
            assert len(data) == ic.bmp_size(w, h)
            out = ic.decode_bmp(data)
            assert out.shape == (h, w, 3)
            assert np.array_equal(out, arr)

    def test_header_fields(self):
        data = ic.encode_bmp(_gradient(5, 3))
        assert data[:2] == b"BM"
        assert struct.unpack_from("<I", data, 2)[0] == len(data)
        assert struct.unpack_from("<I", data, 10)[0] == 54  # pixel offset
        assert struct.unpack_from("<i", data, 18)[0] == 5
        assert struct.unpack_from("<i", data, 22)[0] == 3
        assert struct.unpack_from("<H", data, 28)[0] == 24  # bpp
        # 5px → 15 bytes/row → padded to 16
        assert ic.bmp_stride(5) == 16

    def test_wire_layout_bottom_up_bgr(self):
        # single distinctive pixel at top-left: in the file it must be
        # the FIRST pixel of the LAST row block, in BGR order
        arr = np.zeros((2, 2, 3), dtype=np.uint8)
        arr[0, 0] = (10, 20, 30)  # RGB
        data = ic.encode_bmp(arr)
        stride = ic.bmp_stride(2)
        last_row = data[54 + stride : 54 + stride + 6]
        assert last_row[:3] == bytes([30, 20, 10])  # BGR of (10,20,30)

    def test_top_down_negative_height_decodes(self):
        arr = _gradient(4, 3)
        data = bytearray(ic.encode_bmp(arr[::-1]))  # stored file rows = arr
        struct.pack_into("<i", data, 22, -3)  # flag top-down
        out = ic.decode_bmp(bytes(data))
        assert np.array_equal(out, arr)

    def test_rejects_malformed(self):
        with pytest.raises(ValueError):
            ic.decode_bmp(b"notabmp")
        good = ic.encode_bmp(_gradient(4, 4))
        with pytest.raises(ValueError):
            ic.decode_bmp(good[:60])  # truncated
        bad = bytearray(good)
        struct.pack_into("<H", bad, 28, 8)  # 8bpp unsupported
        with pytest.raises(ValueError):
            ic.decode_bmp(bytes(bad))

    def test_resize_nearest_source_map(self):
        # 4×4 → 2×2 with floor map picks sources (0,0),(2,0),(0,2),(2,2)
        arr = _gradient(4, 4)
        out = ic.resize_nearest(arr, 2, 2)
        expect = arr[[0, 2]][:, [0, 2]]
        assert np.array_equal(out, expect)
        # upscale duplicates: 2×2 → 4×4, source x = (x*2)//4 = [0,0,1,1]
        small = arr[:2, :2]
        up = ic.resize_nearest(small, 4, 4)
        assert np.array_equal(up, small[[0, 0, 1, 1]][:, [0, 0, 1, 1]])

    def test_checksum_catches_channel_and_row_bugs(self):
        arr = _gradient(6, 5)
        base = ic.pixel_checksum(arr)
        assert base == ic.pixel_checksum(arr.copy())
        assert base != ic.pixel_checksum(arr[:, :, ::-1])  # RGB↔BGR
        assert base != ic.pixel_checksum(arr[::-1])  # row flip
        tweaked = arr.copy()
        tweaked[2, 3, 1] += 1
        assert base != ic.pixel_checksum(tweaked)  # single-pixel edit


class TestVideoContainer:
    def test_roundtrip_and_random_access(self):
        frames = [ic.encode_bmp(_gradient(3 + i, 2 + i)) for i in range(4)]
        blob = ic.encode_video(frames)
        assert ic.video_frame_count(blob) == 4
        for i, f in enumerate(frames):
            assert ic.decode_video_frame(blob, i) == f
        with pytest.raises(IndexError):
            ic.decode_video_frame(blob, 4)
        with pytest.raises(ValueError):
            ic.video_frame_count(b"XXXX....")

    def test_synth_video_geometry(self):
        for doc_id in [0, 1, 6, 13, 499]:
            blob = ic.synth_video_bytes(doc_id)
            n = ic.video_frame_count(blob)
            assert n == ic.VID_F_BASE + doc_id % ic.VID_F_MOD
            frame = ic.decode_bmp(ic.decode_video_frame(blob, 0))
            assert frame.shape == (
                ic.VID_H_BASE + doc_id % ic.VID_H_MOD,
                ic.VID_W_BASE + doc_id % ic.VID_W_MOD,
                3,
            )
            # frames differ (frame term reaches the pixels)
            if n > 1:
                assert ic.decode_video_frame(blob, 0) != ic.decode_video_frame(blob, 1)


class TestRealMultimodalStages:
    def test_resize_images_real_pixels(self, spark):
        from eventhub_to_timescale_spark.operators.multimodal import (
            document_image_blobs,
            resize_images,
        )

        docs = spark.createDataFrame(
            [(0,), (1,), (16,), (499,)], "doc_id long"
        )
        rows = {
            r.doc_id: r
            for r in resize_images(document_image_blobs(docs), 16, 12).collect()
        }
        assert set(rows) == {0, 1, 16, 499}
        for doc_id, r in rows.items():
            out = ic.decode_bmp(bytes(r.payload))
            # synth_image_bytes is the corpus ground truth (doc_id=1
            # is a planted near-dup variant — parent image + forced
            # white sample pixels — so the raw synth_pixels formula
            # no longer matches it)
            src = ic.decode_bmp(ic.synth_image_bytes(doc_id))
            expect = ic.resize_nearest(src, 16, 12)
            assert np.array_equal(out, expect)

    def test_sample_frames_real_selection(self, spark):
        from eventhub_to_timescale_spark.operators.multimodal import (
            document_video_blobs,
            sample_frames,
        )

        # doc_id=5 → F = 2 + 5%7 = 7 frames; samples (i*7)//4 = 0,1,3,5
        docs = spark.createDataFrame([(5,)], "doc_id long")
        rows = sorted(
            sample_frames(document_video_blobs(docs), n_frames=4).collect(),
            key=lambda r: r.frame_idx,
        )
        assert [r.frame_idx for r in rows] == [0, 1, 2, 3]
        w = ic.VID_W_BASE + 5 % ic.VID_W_MOD
        h = ic.VID_H_BASE + 5 % ic.VID_H_MOD
        for i, r in enumerate(rows):
            t = (i * 7) // 4
            expect = ic.synth_pixels(5, w, h, frame=t)
            assert np.array_equal(ic.decode_bmp(bytes(r.frame)), expect)
            assert r.n_bytes == ic.bmp_size(w, h)

    def test_real_codec_rejects_nonimage_payload(self, spark):
        from eventhub_to_timescale_spark.operators.multimodal import (
            documents_as_blobs,
            resize_images,
        )

        docs = spark.createDataFrame(
            [(1, "plain text", "s")], "doc_id long, text string, source string"
        )
        with pytest.raises(Exception):
            resize_images(documents_as_blobs(docs), 8, 4).collect()


class TestMalformedContainers:
    def test_malformed_vid0_raises_value_error_consistently(self):
        # bad magic, truncated header, truncated frame table, truncated
        # frame body: all ValueError — struct.error must never escape
        good = ic.synth_video_bytes(1)
        for bad in (b"NOPE", b"VID0", b"VID0\x00", good[:9], good[:20]):
            with pytest.raises(ValueError):
                ic.video_frame_count(bad) and ic.decode_video_frame(bad, 0)
        with pytest.raises(ValueError):
            ic.decode_video_frame(good[: len(good) - 5], ic.video_frame_count(good) - 1)
        with pytest.raises(IndexError):
            ic.decode_video_frame(good, 99)


class TestDecodeVideoFrames:
    def test_single_pass_matches_per_frame_decode(self):
        vid = ic.synth_video_bytes(2)  # doc 2 -> 4-frame container
        n = ic.video_frame_count(vid)
        got = ic.decode_video_frames(vid, [0, 2, 2, n - 1])
        assert set(got) == {0, 2, n - 1}
        for i in got:
            assert got[i] == ic.decode_video_frame(vid, i)

    def test_error_contract_matches_single_frame_decoder(self):
        vid = ic.synth_video_bytes(2)
        n = ic.video_frame_count(vid)
        with pytest.raises(IndexError):
            ic.decode_video_frames(vid, [0, n])
        with pytest.raises(ValueError):
            ic.decode_video_frames(b"NOPE" + vid[4:], [0])
        # truncation is detected when it hits a REQUESTED frame (the
        # last one); earlier frames return before the damage, same
        # early-return contract as decode_video_frame
        with pytest.raises(ValueError):
            ic.decode_video_frames(vid[: len(vid) - 3], [n - 1])
