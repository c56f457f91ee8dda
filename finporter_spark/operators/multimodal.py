"""Multimodal (image/audio/video) column operators (SURVEY §2B L5).

Design: media travel as opaque ``binary`` columns with typed metadata
structs alongside (path, mime, width/height/duration...). Decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
functions via ``mapInPandas`` — constant Python overhead per batch, media
bytes never round-trip through the driver, and partitioning is by file so
a 100 TB corpus fans out across executors.

The actual codec calls are STUBBED (this container has no image/audio
libraries): ``decode_image_meta`` parses real header bytes for PNG/JPEG/GIF
(pure Python, deterministic), while ``resize_image`` / ``sample_frames`` /
``extract_audio_features`` raise NotImplementedError unless a deterministic
fake is requested. The Spark-side plumbing — schemas, batch iteration,
UDF signatures — is real and tested.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("length", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def decode_image_meta_bytes(content: bytes) -> tuple[str | None, int | None, int | None]:
    """Parse (format, width, height) from real image header bytes.

    Pure-Python header sniffing (PNG IHDR, GIF logical screen, JPEG SOFn)
    — deterministic, no codec library needed.
    """
    if content is None or len(content) < 10:
        return None, None, None
    if content[:8] == b"\x89PNG\r\n\x1a\n" and len(content) >= 24:
        w, h = struct.unpack(">II", content[16:24])
        return "png", w, h
    if content[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", content[6:10])
        return "gif", w, h
    if content[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(content):
            if content[i] != 0xFF:
                break
            marker = content[i + 1]
            seg_len = struct.unpack(">H", content[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", content[i + 5 : i + 9])
                return "jpeg", w, h
            i += 2 + seg_len
        return "jpeg", None, None
    return None, None, None


def attach_image_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """mapInPandas pass adding (format,width,height) metadata columns.

    Arrow-batched: each Python call handles a whole batch of binary cells;
    the binary column itself is passed through untouched (no copy back to
    the driver).
    """
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("format", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf[content_col].map(
                lambda b: decode_image_meta_bytes(bytes(b) if b is not None else None)
            )
            pdf = pdf.assign(
                format=meta.map(lambda m: m[0]),
                width=pd.array([m[1] for m in meta], dtype="Int32"),
                height=pd.array([m[2] for m in meta], dtype="Int32"),
            )
            yield pdf

    return df.mapInPandas(_map, out_schema)


def resize_image(
    df: DataFrame,
    content_col: str = "content",
    size: tuple[int, int] = (224, 224),
    fake: bool = False,
) -> DataFrame:
    """Resize stub: real codec unavailable in this container.

    With ``fake=True`` produces a deterministic pseudo-resize (truncated /
    zero-padded byte buffer of w*h length) so downstream plumbing and batch
    shapes are testable; otherwise raises NotImplementedError inside the
    executor at evaluation time.
    """
    w, h = size
    out_schema = StructType(
        [f for f in df.schema.fields if f.name != content_col]
        + [StructField("resized", BinaryType())]
    )

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image codec not available in this environment; "
                    "pass fake=True for the deterministic test double"
                )
            n = w * h
            resized = pdf[content_col].map(
                lambda b: (bytes(b)[:n]).ljust(n, b"\x00") if b is not None else None
            )
            yield pdf.drop(columns=[content_col]).assign(resized=resized)

    return df.mapInPandas(_map, out_schema)


def sample_frames(
    df: DataFrame,
    content_col: str = "content",
    every_n_bytes: int = 1024,
    fake: bool = False,
) -> DataFrame:
    """Frame-sampling stub (video): emits one row per sampled 'frame'.

    Real implementation would demux with a codec; the fake slices the byte
    stream every ``every_n_bytes`` — same fan-out shape (1 row in, k rows
    out via mapInPandas) as real frame extraction.
    """
    out_schema = StructType(
        [f for f in df.schema.fields if f.name != content_col]
        + [
            StructField("frame_idx", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video codec not available; pass fake=True for the test double"
                )
            rows = []
            for _, row in pdf.iterrows():
                b = bytes(row[content_col]) if row[content_col] is not None else b""
                for i in range(max(1, len(b) // every_n_bytes)):
                    r = row.drop(labels=[content_col]).to_dict()
                    r["frame_idx"] = i
                    r["frame"] = b[i * every_n_bytes : (i + 1) * every_n_bytes]
                    rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(_map, out_schema)


def extract_audio_features(
    df: DataFrame,
    content_col: str = "content",
    frame_bytes: int = 1024,
    fake: bool = False,
) -> DataFrame:
    """Audio feature extraction stub (codec unavailable in this container).

    Real implementation would decode PCM and emit per-frame features;
    the deterministic fake computes byte-level energy/mean per
    ``frame_bytes`` window — same output shape (one feature row per
    frame) and the same Arrow-batched ``mapInPandas`` plumbing.
    """
    out_schema = StructType(
        [f for f in df.schema.fields if f.name != content_col]
        + [
            StructField("frame_idx", IntegerType()),
            StructField("energy", LongType()),
            StructField("byte_mean", LongType()),
        ]
    )

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "audio codec not available; pass fake=True for the "
                    "deterministic test double"
                )
            rows = []
            for _, row in pdf.iterrows():
                b = bytes(row[content_col]) if row[content_col] is not None else b""
                for i in range(max(1, len(b) // frame_bytes)):
                    fr = b[i * frame_bytes : (i + 1) * frame_bytes]
                    r = row.drop(labels=[content_col]).to_dict()
                    r["frame_idx"] = i
                    r["energy"] = sum(x * x for x in fr)
                    r["byte_mean"] = sum(fr) // max(len(fr), 1)
                    rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(_map, out_schema)
