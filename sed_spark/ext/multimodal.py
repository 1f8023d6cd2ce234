"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with metadata structs;
decode / feature-extraction runs as Arrow-batched ``mapInPandas`` so each
batch of payloads is processed vectorized without ever materializing the
binaries on the driver.

The actual media decoding is STUBBED (no image/audio libraries in this
environment): ``decode_stub`` derives deterministic fake features from the
payload bytes so the Spark-side plumbing — schema, batch shape, partition
behavior — is real and testable. Swap ``_fake_decode`` for a real decoder
(PIL/torchaudio/ffmpeg) to productionize; the dataflow does not change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

__all__ = [
    "to_binary_payload",
    "decode_stub",
    "resize_stub",
    "frame_sample_stub",
    "FEATURE_SCHEMA",
    "RESIZE_SCHEMA",
    "FRAME_SCHEMA",
]


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ],
)


def to_binary_payload(
    df: DataFrame, text_col: str = "text", payload_col: str = "payload",
) -> DataFrame:
    """Model a media table: content as an opaque ``binary`` column."""
    return df.withColumn(payload_col, F.encode(F.col(text_col), "UTF-8"))


def _fake_decode(payload: bytes, dim: int = 8) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for a real media decoder.

    Raises NotImplementedError if asked for a real decode; the fake path
    hashes the payload into (width, height, feature-vector).
    """
    h = hashlib.sha256(payload).digest()
    width = 1 + h[0] % 64
    height = 1 + h[1] % 64
    feat = np.frombuffer(h[: dim * 4], dtype=np.uint32).astype(np.float32)
    return width, height, feat / np.float32(2**32)


def decode_stub(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    dim: int = 8,
) -> DataFrame:
    """'Decode' binary payloads to features via mapInPandas.

    Real pattern for 100 TB media: each Arrow batch stays on the executor,
    the decoder is CPU-bound per batch, and output is a typed feature table
    ready for the similarity operators.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                w, h, feat = _fake_decode(data, dim)
                rows.append((doc_id, len(data), w, h, feat.tolist()))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "width", "height", "feature"],
            )

    src = df.select(F.col(id_col), F.col(payload_col))
    if not isinstance(src.schema[payload_col].dataType, BinaryType):
        raise TypeError(f"{payload_col} must be a binary column")
    return src.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ],
)


def resize_stub(
    df: DataFrame,
    target: tuple[int, int] = (32, 32),
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """'Resize' each media payload to ``target`` via mapInPandas.

    The stub emits a deterministic payload of exactly ``w*h`` bytes (the
    sha256 keystream of the input), standing in for a real resampler; a
    production decoder swaps ``_resample`` only. Output stays a binary
    column — resize composes with :func:`decode_stub` / further stages
    without the bytes ever leaving the executors.
    """
    w, h = int(target[0]), int(target[1])

    def _resample(payload: bytes) -> bytes:
        # keystream: sha256(payload || counter) until w*h bytes
        out = bytearray()
        ctr = 0
        while len(out) < w * h:
            out += hashlib.sha256(payload + ctr.to_bytes(4, "little")).digest()
            ctr += 1
        return bytes(out[: w * h])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": np.full(len(pdf), w, dtype=np.int32),
                    "height": np.full(len(pdf), h, dtype=np.int32),
                    "payload": [
                        _resample(bytes(p)) for p in pdf[payload_col]
                    ],
                },
            )

    src = df.select(F.col(id_col), F.col(payload_col))
    if not isinstance(src.schema[payload_col].dataType, BinaryType):
        raise TypeError(f"{payload_col} must be a binary column")
    return src.mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("frame", BinaryType()),
    ],
)


def frame_sample_stub(
    df: DataFrame,
    every: int = 4,
    frame_bytes: int = 16,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Sample every ``every``-th 'frame' from each video payload.

    A 1→N expansion via mapInPandas (the UDTF shape): the stub treats the
    payload as consecutive ``frame_bytes`` chunks and keeps indices
    0, every, 2·every, …. A real implementation replaces the chunker with
    an ffmpeg/pyav demuxer; the Spark contract — exploded (doc, frame_idx,
    frame) rows produced executor-side, partition-parallel — is identical.
    """
    if every < 1:
        raise ValueError(f"every must be >= 1, got {every}")
    if frame_bytes < 1:
        raise ValueError(f"frame_bytes must be >= 1, got {frame_bytes}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                n_frames = max((len(data) + frame_bytes - 1) // frame_bytes, 0)
                for idx in range(0, n_frames, every):
                    rows.append(
                        (
                            doc_id,
                            idx,
                            n_frames,
                            data[idx * frame_bytes:(idx + 1) * frame_bytes],
                        ),
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "n_frames", "frame"],
            )

    src = df.select(F.col(id_col), F.col(payload_col))
    if not isinstance(src.schema[payload_col].dataType, BinaryType):
        raise TypeError(f"{payload_col} must be a binary column")
    return src.mapInPandas(run, FRAME_SCHEMA)
