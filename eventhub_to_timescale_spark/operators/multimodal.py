"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct (modality, mime, width/height/duration, …). Decode and
feature-extraction run as Arrow-batched ``mapInPandas`` stages — the
right shape for 100 TB: batches stream through Python workers without
ever materializing a partition, and the binary column never leaves the
executor.

The actual codec step is STUBBED (image/audio libraries are not in
this container): ``decode_image_batch`` raises ``NotImplementedError``
unless ``fake=True``, in which case a deterministic byte-level
"feature extractor" (length, sha256, byte entropy) stands in. The
Spark-side plumbing — schema, batch iteration, partition behavior —
is real and tested; swap `_decode_one` for PIL/ffmpeg in a real
deployment.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOB_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

BLOB_FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, sha256 string, entropy double"
)


def documents_as_blobs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in blob table: utf-8 bytes of the text as the binary
    payload + metadata struct. Real deployments read image/audio bytes
    from object storage with the same schema."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("text").alias("modality"),
            F.lit("text/plain").alias("mime"),
            F.col("source").alias("source"),
        ).alias("metadata"),
    )


def _byte_entropy(data: bytes) -> float:
    if not data:
        return 0.0
    counts: dict[int, int] = {}
    for b in data:
        counts[b] = counts.get(b, 0) + 1
    n = len(data)
    return -sum((c / n) * math.log2(c / n) for c in counts.values())


def _decode_one(payload: bytes, fake: bool) -> dict:
    if not fake:
        # real deployment: PIL.Image.open(io.BytesIO(payload)) etc.
        raise NotImplementedError(
            "image/audio codecs unavailable in this environment; "
            "pass fake=True for the deterministic byte-level stand-in"
        )
    return {
        "n_bytes": len(payload),
        "sha256": hashlib.sha256(payload).hexdigest(),
        "entropy": _byte_entropy(payload),
    }


def extract_blob_features(blobs: DataFrame, fake: bool = True) -> DataFrame:
    """→ (doc_id, n_bytes, sha256, entropy) via Arrow-batched
    ``mapInPandas`` over the binary payload."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_decode_one(p, fake) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return blobs.select("doc_id", "payload").mapInPandas(
        batches, schema=BLOB_FEATURES_SCHEMA
    )


RESIZED_SCHEMA = "doc_id long, payload binary, width int, height int"
FRAMES_SCHEMA = "doc_id long, frame_idx int, frame binary, n_bytes long"


def resize_images(
    blobs: DataFrame, width: int = 64, height: int = 64, fake: bool = True
) -> DataFrame:
    """Image resize as an Arrow-batched ``mapInPandas`` stage.

    Real deployment: PIL decode → resize → re-encode. Here the codec is
    stubbed with a deterministic byte-level stand-in (truncate/cycle the
    payload to width×height bytes) so the Spark plumbing — schema,
    batch shape, binary round-trip — is real and tested."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "image codecs unavailable; pass fake=True"
                )
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [
                        bytes((p * (target // max(len(p), 1) + 1))[:target])
                        for p in pdf["payload"]
                    ],
                    "width": width,
                    "height": height,
                }
            )
            yield out

    return blobs.select("doc_id", "payload").mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )


def sample_frames(blobs: DataFrame, n_frames: int = 4, fake: bool = True) -> DataFrame:
    """Video frame-sampling as a one-to-many ``mapInPandas`` stage
    (each blob row yields ``n_frames`` rows). Stub: evenly-split byte
    chunks stand in for decoded frames; swap for ffmpeg in deployment."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "video codecs unavailable; pass fake=True"
                )
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(p)
                step = max(len(p) // n_frames, 1)
                for i in range(n_frames):
                    chunk = p[i * step : (i + 1) * step] or b"\x00"
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": i,
                            "frame": chunk,
                            "n_bytes": len(chunk),
                        }
                    )
            yield pd.DataFrame(rows)

    return blobs.select("doc_id", "payload").mapInPandas(
        batches, schema=FRAMES_SCHEMA
    )


def blob_features_sql_checkable(blobs: DataFrame) -> DataFrame:
    """The oracle-comparable slice of the fake feature extractor
    (entropy excluded — no portable SQL equivalent)."""
    return extract_blob_features(blobs, fake=True).select(
        "doc_id", "n_bytes", "sha256"
    )


def frame_samples_sql_checkable(blobs: DataFrame, n_frames: int = 4) -> DataFrame:
    """Oracle-comparable projection of ``sample_frames``: the raw frame
    bytes become an md5 hex digest so the cross-engine compare never
    touches binary representations (document texts are ASCII, so the
    DuckDB oracle can slice the VARCHAR and md5 it byte-identically)."""
    frames = sample_frames(blobs, n_frames=n_frames, fake=True)
    return frames.select(
        "doc_id",
        "frame_idx",
        "n_bytes",
        F.md5(F.col("frame")).alias("frame_md5"),
    )


def resized_sql_checkable(
    blobs: DataFrame, width: int = 64, height: int = 64
) -> DataFrame:
    """Oracle-comparable projection of ``resize_images``: the resized
    payload becomes an md5 hex digest (ASCII texts → the DuckDB oracle
    rebuilds the byte-cycling with repeat+substring on the VARCHAR)."""
    resized = resize_images(blobs, width=width, height=height, fake=True)
    return resized.select(
        "doc_id",
        "width",
        "height",
        F.md5(F.col("payload")).alias("payload_md5"),
    )
