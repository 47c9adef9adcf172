"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; the Spark-side plumbing (schemas, batching, partition
behavior, Arrow transport) is real and tested, while the actual
media-decode kernels are STUBBED (the container has no image/audio
libraries): ``decode_media`` raises NotImplementedError unless
``fake=True``, in which case a clearly-marked deterministic fake decoder
produces reproducible features so downstream stages can be exercised.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("magic", T.StringType(), True),
        T.StructField("media_type", T.StringType(), True),
    ]
)

FEATURE_DIM = 16

MEDIA_FEATURES = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)

_MAGIC = {
    b"\x89PN": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"RIF": "audio/wav",
    b"\x00\x00\x00": "video/mp4",
}


def media_metadata(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Typed metadata from the binary column - pure Column ops (byte
    length, magic-prefix sniffing) that stay JVM-side."""
    blob = F.col(blob_col)
    magic = F.hex(F.substring(blob, 1, 3))
    mt = F.lit("application/octet-stream")
    for prefix, mtype in _MAGIC.items():
        mt = F.when(magic == F.lit(prefix.hex().upper()), F.lit(mtype)).otherwise(mt)
    return df.select(
        "doc_id",
        F.length(blob).cast("int").alias("n_bytes"),
        magic.alias("magic"),
        mt.alias("media_type"),
    )


def decode_media(blob: bytes, fake: bool = False) -> np.ndarray:
    """STUB: real image/audio decode needs PIL/ffmpeg (absent here).

    With ``fake=True`` returns a deterministic pseudo-decode: a
    (FEATURE_DIM,) float vector seeded by crc32 of the payload - stable
    across executors/retries, shaped like a real embedding.
    """
    if not fake:
        raise NotImplementedError(
            "media decode requires PIL/ffmpeg; run with fake=True for the "
            "deterministic test double"
        )
    rng = np.random.RandomState(zlib.crc32(blob) & 0x7FFFFFFF)
    return rng.rand(FEATURE_DIM).astype(np.float32)


def extract_media_features(
    df: DataFrame, blob_col: str = "blob", fake: bool = True
) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, decoder constructed
    once per batch iterator, one vector per row. The real-media variant
    swaps ``decode_media`` for a library call - schema and partitioning
    are already production-shaped."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_media(b, fake=fake).tolist() if b is not None else None
                for b in pdf[blob_col]
            ]
            n_frames = [
                (len(b) % 16) + 1 if b is not None else None for b in pdf[blob_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "features": feats,
                    "n_frames": n_frames,
                }
            )

    return df.select("doc_id", blob_col).mapInPandas(kernel, schema=MEDIA_FEATURES)


def decode_image(blob: bytes, fake: bool = False) -> np.ndarray:
    """STUB (same contract as ``decode_media``): real decode needs
    PIL/ffmpeg. With ``fake=True`` returns a deterministic pseudo-image:
    an (h, w) uint8 array whose shape and content derive from the
    payload - stable across executors/retries."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL; run with fake=True for the "
            "deterministic test double"
        )
    h = 8 + (len(blob) % 8)
    w = 8 + (zlib.crc32(blob) % 8)
    rng = np.random.RandomState(zlib.crc32(blob) & 0x7FFFFFFF)
    return (rng.rand(h, w) * 255).astype(np.uint8)


RESIZED = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("src_h", T.IntegerType(), True),
        T.StructField("src_w", T.IntegerType(), True),
        T.StructField("pixels", T.ArrayType(T.IntegerType()), True),
    ]
)


def resize_media(
    df: DataFrame,
    out_h: int = 4,
    out_w: int = 4,
    blob_col: str = "blob",
    fake: bool = True,
) -> DataFrame:
    """Nearest-neighbor resize to (out_h, out_w) as an Arrow-batched
    kernel. The RESIZE math (integer index grid + fancy-indexed gather)
    is real numpy and production-shaped; only the decode underneath is
    the documented stub."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "src_h": [], "src_w": [], "pixels": []}
            for doc_id, b in zip(pdf["doc_id"], pdf[blob_col]):
                if b is None:
                    # same null contract as extract_media_features: one
                    # row per input doc, NULL payload -> NULL output
                    out["doc_id"].append(doc_id)
                    out["src_h"].append(None)
                    out["src_w"].append(None)
                    out["pixels"].append(None)
                    continue
                img = decode_image(b, fake=fake)
                ys = np.arange(out_h) * img.shape[0] // out_h
                xs = np.arange(out_w) * img.shape[1] // out_w
                small = img[ys][:, xs]
                out["doc_id"].append(doc_id)
                out["src_h"].append(img.shape[0])
                out["src_w"].append(img.shape[1])
                out["pixels"].append([int(v) for v in small.ravel()])
            if out["doc_id"]:
                # nullable Int32 dtype: a plain int column with None
                # degrades to float64 and breaks the Arrow int cast
                yield pd.DataFrame(
                    {
                        "doc_id": out["doc_id"],
                        "src_h": pd.array(out["src_h"], dtype="Int32"),
                        "src_w": pd.array(out["src_w"], dtype="Int32"),
                        "pixels": out["pixels"],
                    }
                )

    return df.select("doc_id", blob_col).mapInPandas(kernel, schema=RESIZED)


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 256,
    every_n: int = 4,
    blob_col: str = "blob",
) -> DataFrame:
    """Fixed-stride frame sampling over a video-like binary payload:
    split the blob into ``frame_bytes`` chunks, keep every
    ``every_n``-th. ENTIRELY JVM-side Column algebra (sequence +
    posexplode + binary substr) - zero Python in the plan; parsing a
    real container's frame boundaries would need ffmpeg (the documented
    decode stub), but stride sampling is how the engine bounds work per
    video regardless of codec. -> (doc_id, frame_idx, frame binary)."""
    blob = F.col(blob_col)
    n_frames = F.ceil(F.length(blob) / F.lit(frame_bytes)).cast("int")
    idxs = F.sequence(
        F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n)
    )
    return (
        # empty/NULL payloads produce NO frames (greatest(.., 0) would
        # otherwise map both to a phantom frame 0; round-4 review)
        df.where(F.length(blob) > 0)
        .select("doc_id", blob, F.explode(idxs).alias("frame_idx"))
        .select(
            "doc_id",
            "frame_idx",
            blob.substr(
                F.col("frame_idx") * frame_bytes + 1, F.lit(frame_bytes)
            ).alias("frame"),
        )
    )


def synth_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic binary payloads derived from text (test fixture for
    the multimodal plumbing): documents -> (doc_id, blob binary)."""
    kind = F.pmod(F.col("doc_id"), F.lit(4))
    prefix = (
        F.when(kind == 0, F.lit(bytes.fromhex("89504e")))
        .when(kind == 1, F.lit(b"\xff\xd8\xff"))
        .when(kind == 2, F.lit(b"RIF"))
        .otherwise(F.lit(b"\x00\x00\x00"))
    )
    return df.select(
        "doc_id",
        F.concat(prefix, F.encode(F.col(text_col), "utf-8")).alias("blob"),
    )
