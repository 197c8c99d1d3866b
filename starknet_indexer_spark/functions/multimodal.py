"""Multimodal column plumbing: opaque ``binary`` media + typed metadata.

The engine treats image/audio/video payloads as opaque BinaryType
columns with a typed metadata projection; per-item decode / feature
extraction / frame sampling run as Arrow-batched Python over
``mapInPandas`` — the 100 TB pattern where a Python media library is
unavoidable. Spark-side plumbing (schemas, batch iteration, partition
preservation) is real and tested; the *decoder* itself is a
deterministic fake because no image/audio libs exist in this
container — swap ``_decode_fake`` for a PIL/libav call in production
(see ``decode_real``).

Scale notes: mapInPandas streams Arrow batches — peak memory is one
batch, not one partition; media tables should be partitioned so one
partition's payload fits an executor (size via
``spark.sql.files.maxPartitionBytes``); the metadata projection stays
JVM-side so filters on modality/size prune *before* any Python cost.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_SAMPLED_FRAMES = 4

MODALITIES = ("image", "audio", "video")

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("byte_offset", T.LongType()),
        T.StructField("frame_len", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)

N_FEATURES = 8


def media_expr(text: Column) -> Column:
    """The opaque payload. Test corpus has no real media, so the bytes
    are the UTF-8 of the text column — opaque to everything downstream,
    which only sees BinaryType."""
    return F.encode(text, "UTF-8")


def modality_expr(source: Column) -> Column:
    """Deterministic source -> modality assignment (md5-based, engine-
    portable; stands in for a real content-type column)."""
    h = F.conv(F.substring(F.md5(source), 1, 2), 16, 10).cast("bigint") % 3
    return (
        F.when(h == 0, MODALITIES[0]).when(h == 1, MODALITIES[1]).otherwise(MODALITIES[2])
    )


def metadata_exprs(media: Column) -> dict[str, Column]:
    """Typed metadata derived from the payload: byte length plus fake
    decoded dimensions (arithmetic on n_bytes — a real decoder would
    read the container header here)."""
    n = F.octet_length(media)
    return {
        "n_bytes": n.cast("bigint"),
        "width": (F.lit(32) + n % 97).cast("bigint"),
        "height": (F.lit(32) + (n / 97).cast("bigint") % 97).cast("bigint"),
        "n_frames": (F.lit(1) + n % 16).cast("bigint"),
    }


def _frame_geometry(n_bytes: int, n_frames: int) -> list[tuple[int, int, int]]:
    """(frame_idx, offset, frame_len) for the evenly-sampled frames.
    Pure integer arithmetic — mirrored exactly by the SQL oracle."""
    frame_len = max(n_bytes // n_frames, 1)
    n_samp = min(n_frames, MAX_SAMPLED_FRAMES)
    out = []
    for k in range(n_samp):
        idx = (k * n_frames) // n_samp
        out.append((idx, idx * frame_len, frame_len))
    return out


def sample_frames(df: DataFrame) -> DataFrame:
    """mapInPandas frame sampler: one output row per sampled frame,
    fingerprinted with md5 over the uppercase-hex rendering of the
    frame bytes (hex-domain so DuckDB can replay it — no BLOB md5
    there). Input needs columns (doc_id, media, n_frames)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, media, n_frames in zip(
                pdf["doc_id"], pdf["media"], pdf["n_frames"]
            ):
                hx = bytes(media).hex().upper()
                for idx, off, flen in _frame_geometry(len(media), int(n_frames)):
                    chunk = hx[off * 2 : (off + flen) * 2]
                    rows.append(
                        (
                            int(doc_id),
                            idx,
                            off,
                            flen,
                            hashlib.md5(chunk.encode()).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "byte_offset", "frame_len", "frame_md5"]
            )

    return df.mapInPandas(gen, FRAME_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extractor: N_FEATURES chunk byte-mean values
    in [0, 1] — the deterministic stand-in for an embedding model
    forward pass. Input needs (doc_id, media)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(media)
                n = len(b)
                step = max(n // N_FEATURES, 1)
                feats = []
                for i in range(N_FEATURES):
                    chunk = b[i * step : (i + 1) * step]
                    feats.append(round(sum(chunk) / (255.0 * len(chunk)), 6) if chunk else 0.0)
                rows.append((int(doc_id), n, feats))
            yield pd.DataFrame(rows, columns=["doc_id", "n_bytes", "features"])

    return df.mapInPandas(gen, FEATURE_SCHEMA)


def decode_real(df: DataFrame, modality: str) -> DataFrame:
    """Hook for a real decoder (PIL / libav / soundfile). Those libs
    are not in this container — the call site is the contract."""
    raise NotImplementedError(
        f"real {modality} decode requires a media library not present in "
        "this environment; use sample_frames/extract_features (deterministic "
        "stubs) or inject a decoder with the same mapInPandas signature"
    )
