"""Vendored pure-Python image codec: 24-bit uncompressed BMP + a
minimal length-prefixed multi-frame container.

The BMP wire format here is the public Windows DIB layout
(BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows, BGR byte order,
4-byte row padding) — implemented from the published spec so the
multimodal operators (`operators/multimodal.py`) can run REAL
decode → pixel transform → re-encode work with zero external
dependencies. In a production deployment you would swap these for
PIL/ffmpeg behind the same function signatures; the Spark-side
plumbing (mapInPandas schemas, batch shapes) is identical either way.

Also provides the deterministic synthetic pixel generator used by the
test/bench corpus: pixel values are a closed-form function of
(doc_id, x, y, frame), which lets the DuckDB oracle recompute the
expected post-resize pixel checksum analytically — an independent
check that the encode → decode → resize → re-encode → decode chain
did real pixel work (any channel swap, row-order flip, stride bug, or
off-by-one in the nearest-neighbor map changes the position-weighted
checksum).
"""

from __future__ import annotations

import struct

import numpy as np

# BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (40 bytes)
_BMP_HEADER_FMT = "<2sIHHIIiiHHIIiiII"
_BMP_HEADER_SIZE = 54


def bmp_stride(width: int) -> int:
    """Bytes per padded BMP row (24bpp rows pad to 4-byte multiples)."""
    return ((3 * width + 3) // 4) * 4


def bmp_size(width: int, height: int) -> int:
    """Total encoded size of a 24-bit BMP with these dimensions."""
    return _BMP_HEADER_SIZE + bmp_stride(width) * height


def encode_bmp(arr: np.ndarray) -> bytes:
    """RGB uint8 array [H][W][3] → 24-bit uncompressed BMP bytes."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_bmp expects a uint8 [H][W][3] RGB array")
    h, w, _ = arr.shape
    stride = bmp_stride(w)
    pad = stride - 3 * w
    header = struct.pack(
        _BMP_HEADER_FMT,
        b"BM",
        _BMP_HEADER_SIZE + stride * h,
        0,
        0,
        _BMP_HEADER_SIZE,
        40,  # BITMAPINFOHEADER size
        w,
        h,  # positive height = bottom-up row order
        1,  # planes
        24,  # bits per pixel
        0,  # BI_RGB (uncompressed)
        stride * h,
        2835,  # 72 DPI in pixels/metre
        2835,
        0,
        0,
    )
    # bottom-up rows, BGR channel order, per-row padding
    bgr = arr[::-1, :, ::-1]
    if pad:
        padded = np.zeros((h, stride), dtype=np.uint8)
        padded[:, : 3 * w] = bgr.reshape(h, 3 * w)
        body = padded.tobytes()
    else:
        body = bgr.tobytes()
    return header + body


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → RGB uint8 array [H][W][3]."""
    if len(data) < _BMP_HEADER_SIZE or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    w = struct.unpack_from("<i", data, 18)[0]
    h = struct.unpack_from("<i", data, 22)[0]
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (hdr={hdr_size} bpp={bpp} "
            f"compression={compression}); only 24-bit BI_RGB is vendored"
        )
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h <= 0:
        raise ValueError("degenerate BMP dimensions")
    stride = bmp_stride(w)
    if len(data) < offset + stride * h:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize: dst(x,y) ← src((x*W)//w, (y*H)//h).

    Integer source mapping (floor of the scaled coordinate) so the
    DuckDB oracle can reproduce the exact pixel selection in SQL.
    """
    if width <= 0 or height <= 0:
        raise ValueError("target dimensions must be positive")
    h, w, _ = arr.shape
    src_y = (np.arange(height, dtype=np.int64) * h) // height
    src_x = (np.arange(width, dtype=np.int64) * w) // width
    return arr[src_y][:, src_x]


def pixel_checksum(arr: np.ndarray) -> int:
    """Position-weighted pixel checksum: Σ (r + 2g + 3b)·(1 + (y·w+x) % 97).

    Channel weights catch RGB/BGR swaps; position weights catch
    row-order flips, transposes, and stride bugs. Closed-form
    reproducible in SQL for the synthetic corpus.
    """
    h, w, _ = arr.shape
    a = arr.astype(np.int64)
    weighted = a[:, :, 0] + 2 * a[:, :, 1] + 3 * a[:, :, 2]
    pos = 1 + (np.arange(h * w, dtype=np.int64) % 97).reshape(h, w)
    return int((weighted * pos).sum())


# ---------------------------------------------------------------------------
# Minimal multi-frame container: b"VID0" + u32 frame count, then per
# frame a u32 length prefix + the frame's BMP bytes.
# ---------------------------------------------------------------------------

_VIDEO_MAGIC = b"VID0"


def encode_video(frames: list[bytes]) -> bytes:
    parts = [_VIDEO_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        parts.append(struct.pack("<I", len(f)))
        parts.append(f)
    return b"".join(parts)


def video_frame_count(data: bytes) -> int:
    # malformed containers consistently raise ValueError (a truncated
    # header would otherwise surface as struct.error)
    if data[:4] != _VIDEO_MAGIC:
        raise ValueError("not a VID0 container")
    if len(data) < 8:
        raise ValueError("truncated VID0 container")
    return struct.unpack_from("<I", data, 4)[0]


def decode_video_frame(data: bytes, index: int) -> bytes:
    """Return frame `index`'s BMP bytes without materializing others.

    Malformed input raises ValueError; only an out-of-range frame
    index raises IndexError."""
    n = video_frame_count(data)
    if not 0 <= index < n:
        raise IndexError(f"frame {index} out of range (container has {n})")
    pos = 8
    for i in range(n):
        if pos + 4 > len(data):
            raise ValueError("corrupt VID0 container")
        (length,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if i == index:
            if pos + length > len(data):
                raise ValueError("corrupt VID0 container")
            return data[pos : pos + length]
        pos += length
    raise ValueError("corrupt VID0 container")  # pragma: no cover


def decode_video_frames(data: bytes, indices: list[int]) -> dict[int, bytes]:
    """Return ``{index: bmp_bytes}`` for all requested frames in ONE
    container walk — ``decode_video_frame`` re-walks from the start
    per call, which is O(F) per frame; fixed-budget sampling asks for
    several frames of the same container, so the single pass matters
    in the hot mapInPandas path.  Same error contract: ValueError for
    malformed containers, IndexError for an out-of-range index."""
    n = video_frame_count(data)
    want = set(indices)
    for index in want:
        if not 0 <= index < n:
            raise IndexError(f"frame {index} out of range (container has {n})")
    out: dict[int, bytes] = {}
    pos = 8
    for i in range(n):
        if pos + 4 > len(data):
            raise ValueError("corrupt VID0 container")
        (length,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if i in want:
            if pos + length > len(data):
                raise ValueError("corrupt VID0 container")
            out[i] = data[pos : pos + length]
            if len(out) == len(want):
                return out
        pos += length
    if len(out) != len(want):  # pragma: no cover - guarded above
        raise ValueError("corrupt VID0 container")
    return out


# ---------------------------------------------------------------------------
# Deterministic synthetic pixel content. Every constant below is
# mirrored in the DuckDB oracle (oracles.py mm_*_oracle) — change them
# together or the correctness gate flags it.
# ---------------------------------------------------------------------------

# still images: W = 24 + doc_id % 17, H = 16 + doc_id % 13
IMG_W_BASE, IMG_W_MOD = 24, 17
IMG_H_BASE, IMG_H_MOD = 16, 13
# videos: F = 2 + doc_id % 7 frames of W = 16 + doc_id % 9 by H = 12 + doc_id % 7
VID_F_BASE, VID_F_MOD = 2, 7
VID_W_BASE, VID_W_MOD = 16, 9
VID_H_BASE, VID_H_MOD = 12, 7


def synth_pixels(doc_id: int, width: int, height: int, frame: int = 0) -> np.ndarray:
    """Closed-form RGB content: each channel is an affine function of
    (doc_id, x, y, frame) mod 256 with distinct coefficients."""
    ys = np.arange(height, dtype=np.int64)[:, None]
    xs = np.arange(width, dtype=np.int64)[None, :]
    r = (19 * doc_id + 7 * xs + 13 * ys + 3 * frame) % 256
    g = (23 * doc_id + 5 * xs + 11 * ys + 7 * frame) % 256
    b = (29 * doc_id + 3 * xs + 17 * ys + 11 * frame) % 256
    return np.stack(
        [np.broadcast_to(r, (height, width)),
         np.broadcast_to(g, (height, width)),
         np.broadcast_to(b, (height, width))],
        axis=-1,
    ).astype(np.uint8)


# Planted near-duplicate image pairs (r12 verdict ask #1): every
# doc_id ≡ 1 (mod NEARDUP_MOD) renders its PARENT's (doc_id − 1)
# image — parent dims, parent pixel formula — with the three source
# pixels sampled by dHash grid cells (x = NEARDUP_COL,
# y ∈ NEARDUP_ROWS) forced to white.  The 9×8 nearest-neighbor source
# columns/rows are DISTINCT for W ≥ 9, H ≥ 8 (always true here), so
# each forced pixel is sampled by exactly one grid cell and the
# variant's dHash differs from the parent's by at most
# len(NEARDUP_ROWS) = 3 bits — the corpus contains genuine
# distance-≤3 near-pairs, making the DEFAULT banded config
# (max_distance=3 → 4×16-bit bands) a non-trivial gate.  Every
# analytic oracle that recomputes image pixels from doc_id
# (multimodal.phash_neardup_oracle_sql, oracles.mm_resize_oracle)
# mirrors this rule.
NEARDUP_MOD = 37
NEARDUP_ROWS = (1, 4, 7)
NEARDUP_COL = 8  # dHash grid column (of 0..8) whose sample is forced


def neardup_parent(doc_id: int) -> int | None:
    """Parent id if ``doc_id`` is a planted near-dup variant, else
    None."""
    if doc_id >= 1 and doc_id % NEARDUP_MOD == 1:
        return doc_id - 1
    return None


def synth_image_bytes(doc_id: int) -> bytes:
    """Deterministic real BMP for a document id; near-dup variants
    (``neardup_parent``) render the parent's image with three forced
    white sample pixels."""
    parent = neardup_parent(doc_id)
    eff = doc_id if parent is None else parent
    w = IMG_W_BASE + eff % IMG_W_MOD
    h = IMG_H_BASE + eff % IMG_H_MOD
    arr = synth_pixels(eff, w, h)
    if parent is not None:
        sx = (NEARDUP_COL * w) // 9
        for y in NEARDUP_ROWS:
            arr[(y * h) // 8, sx] = 255
    return encode_bmp(arr)


def synth_video_bytes(doc_id: int) -> bytes:
    """Deterministic VID0 container of real BMP frames."""
    n = VID_F_BASE + doc_id % VID_F_MOD
    w = VID_W_BASE + doc_id % VID_W_MOD
    h = VID_H_BASE + doc_id % VID_H_MOD
    return encode_video(
        [encode_bmp(synth_pixels(doc_id, w, h, frame=t)) for t in range(n)]
    )
