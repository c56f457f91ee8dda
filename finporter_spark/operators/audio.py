"""WAV (RIFF PCM) codec + real audio feature extraction — stdlib + numpy.

WAV is a container, not a codec: 8/16-bit PCM parses with struct/numpy
alone, so the engine can genuinely decode it (MP3 is demuxed to frames
+ metadata below; full MDCT decode stays out of scope).
``extract_wav_features`` is the REAL per-frame feature extractor:
RIFF parse -> int samples -> vectorized numpy reductions per window
(energy, amplitude sum, zero crossings), Arrow-batched via mapInPandas.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def wav_encode(
    samples: np.ndarray, sample_rate: int = 16000, bits: int = 16
) -> bytes:
    """int array (n,) or (n, channels) -> RIFF/WAVE PCM bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if bits == 16:
        payload = samples.astype("<i2").tobytes()
    elif bits == 8:
        payload = (samples.astype(np.int64) + 128).astype(np.uint8).tobytes()
    else:
        raise ValueError("wav_encode supports 8 or 16 bits")
    block = ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, bits
    )
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
    out += b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(payload)) + payload
    return out


def wav_decode(content: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM bytes -> (sample_rate, int32 samples (n, channels)).

    8-bit unsigned and 16-bit signed PCM (format tag 1). Compressed WAV
    (IEEE float, ADPCM, ...) raises NotImplementedError.
    """
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = ch = bits = None
    data = None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        (clen,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError(f"truncated stream at offset {pos} (fmt)")
            tag, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if tag != 1:
                raise NotImplementedError(f"non-PCM WAV (format tag {tag})")
            if bits not in (8, 16):
                raise NotImplementedError(f"{bits}-bit PCM")
        elif cid == b"data":
            data = body
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if bits == 16:
        arr = np.frombuffer(data, "<i2").astype(np.int32)
    else:
        arr = np.frombuffer(data, np.uint8).astype(np.int32) - 128
    return rate, arr.reshape(-1, ch)


def extract_wav_features(
    df: DataFrame,
    content_col: str = "content",
    frame_samples: int = 256,
) -> DataFrame:
    """REAL audio features over a WAV binary column: one row per
    ``frame_samples`` window of channel 0 — (frame_idx, n_samples,
    energy = sum(x²), amp_sum = sum(x), zero_crossings). All reductions
    are exact integer numpy ops, so results are oracle-predictable.
    Trailing partial windows are dropped (frames are fixed-size by
    contract, like training windows)."""
    out_schema = StructType(
        [f for f in df.schema.fields if f.name != content_col]
        + [
            StructField("frame_idx", IntegerType()),
            StructField("n_samples", IntegerType()),
            StructField("energy", LongType()),
            StructField("amp_sum", LongType()),
            StructField("zero_crossings", IntegerType()),
        ]
    )

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            carried = pdf.drop(columns=[content_col])
            idx_list, feats = [], []
            for row_i, b in enumerate(pdf[content_col]):
                if b is None:
                    continue
                _rate, samples = wav_decode(bytes(b))
                x = samples[:, 0].astype(np.int64)
                nfr = len(x) // frame_samples
                if nfr == 0:
                    continue
                fr = x[: nfr * frame_samples].reshape(nfr, frame_samples)
                energy = (fr * fr).sum(axis=1)
                amp = fr.sum(axis=1)
                sign = fr >= 0
                zc = (sign[:, 1:] != sign[:, :-1]).sum(axis=1)
                for k in range(nfr):
                    idx_list.append(row_i)
                    feats.append(
                        (k, frame_samples, int(energy[k]), int(amp[k]),
                         int(zc[k]))
                    )
            out = carried.iloc[idx_list].reset_index(drop=True)
            cols = list(zip(*feats)) if feats else [[], [], [], [], []]
            out["frame_idx"] = pd.array(cols[0], dtype="int32")
            out["n_samples"] = pd.array(cols[1], dtype="int32")
            out["energy"] = pd.array(cols[2], dtype="int64")
            out["amp_sum"] = pd.array(cols[3], dtype="int64")
            out["zero_crossings"] = pd.array(cols[4], dtype="int32")
            yield out[[f.name for f in out_schema.fields]]

    return df.mapInPandas(_map, out_schema)


# ---------------------------------------------------------------------
# MP3 frame-header metadata walk (no entropy decode)
#
# Real corpora ship compressed audio; what a pipeline needs from it at
# ingest is METADATA (duration, rates, frame count) — which the MPEG
# frame-header structure yields without any entropy decoding. Tables
# from the public ISO/IEC 11172-3 (MPEG-1) and 13818-3 (MPEG-2) specs.
# MPEG-1 Layer III only: the synthetic fixtures and the dominant real
# format; other version/layer combinations raise NotImplementedError
# (fail-loud, same contract as the compressed-WAV guard).

_MP3_BITRATES_KBPS = (  # MPEG-1 Layer III, index 1..14 (0=free, 15=bad)
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
_MP3_SAMPLE_RATES = (44100, 48000, 32000)  # MPEG-1, index 0..2
_MP3_SAMPLES_PER_FRAME = 1152  # Layer III MPEG-1


def _syncsafe(n: int) -> bytes:
    return bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )


def mp3_frame_header(bitrate_kbps: int, sample_rate: int, padding: int) -> bytes:
    br_idx = _MP3_BITRATES_KBPS.index(bitrate_kbps)
    sr_idx = _MP3_SAMPLE_RATES.index(sample_rate)
    b0 = 0xFF
    b1 = 0xE0 | 0x18 | 0x02 | 0x01  # sync + MPEG-1 + Layer III + no CRC
    b2 = (br_idx << 4) | (sr_idx << 2) | (padding << 1)
    b3 = 0xC4  # mono, no emphasis-relevant bits for the walk
    return bytes([b0, b1, b2, b3])


def mp3_frame_length(bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    """Layer III frame length: 144 * bitrate / sample_rate + padding,
    exact integer floor — the walk and the mux must agree bit-for-bit."""
    return (144 * bitrate_kbps * 1000) // sample_rate + padding


def mp3_mux(
    frame_bitrates_kbps: list[int],
    sample_rate: int = 44100,
    id3v2_size: int = 0,
    id3v1: bool = False,
) -> bytes:
    """Assemble a structurally-real (silent) MP3: optional ID3v2 tag,
    one spec-correct frame header per entry with zero-filled payload
    (padding bit alternates), optional trailing ID3v1 tag. VBR when the
    bitrate list varies."""
    out = b""
    if id3v2_size:
        out += b"ID3\x04\x00\x00" + _syncsafe(id3v2_size) + b"\x00" * id3v2_size
    for i, kbps in enumerate(frame_bitrates_kbps):
        padding = i % 2
        hdr = mp3_frame_header(kbps, sample_rate, padding)
        out += hdr.ljust(mp3_frame_length(kbps, sample_rate, padding), b"\x00")
    if id3v1:
        out += b"TAG" + b"\x00" * 125
    return out


def mp3_metadata(content: bytes) -> dict:
    """Walk the frame headers -> {n_frames, sample_rate, avg_bitrate_kbps,
    total_samples, duration_ms, vbr}. Skips a leading ID3v2 tag
    (syncsafe size) and a trailing ID3v1 block; raises ValueError on
    lost sync / truncated frames (fail-loud, caller quarantines)."""
    pos = 0
    if content[:3] == b"ID3":
        if len(content) < 10:
            raise ValueError("truncated ID3v2 header")
        sz = content[6:10]
        if any(b & 0x80 for b in sz):
            raise ValueError("malformed ID3v2 syncsafe size")
        pos = 10 + ((sz[0] << 21) | (sz[1] << 14) | (sz[2] << 7) | sz[3])
    n_frames = 0
    kbps_sum = 0
    sample_rate = None
    bitrates = set()
    end = len(content)
    while pos < end:
        if content[pos : pos + 3] == b"TAG" and end - pos == 128:
            break  # ID3v1 trailer
        if pos + 4 > end:
            raise ValueError("truncated MP3 frame header")
        b0, b1, b2, _ = content[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"lost MP3 sync at byte {pos}")
        if (b1 >> 3) & 0x3 != 0x3 or (b1 >> 1) & 0x3 != 0x1:
            raise NotImplementedError(
                "only MPEG-1 Layer III frame walks are implemented"
            )
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0x3
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError(f"invalid bitrate/samplerate index at {pos}")
        kbps = _MP3_BITRATES_KBPS[br_idx]
        sr = _MP3_SAMPLE_RATES[sr_idx]
        if sample_rate is None:
            sample_rate = sr
        elif sr != sample_rate:
            raise ValueError("sample-rate change mid-stream")
        flen = mp3_frame_length(kbps, sr, (b2 >> 1) & 0x1)
        if pos + flen > end:
            raise ValueError(f"truncated MP3 frame at byte {pos}")
        n_frames += 1
        kbps_sum += kbps
        bitrates.add(kbps)
        pos += flen
    if not n_frames:
        raise ValueError("no MP3 frames")
    total_samples = n_frames * _MP3_SAMPLES_PER_FRAME
    return {
        "n_frames": n_frames,
        "sample_rate": sample_rate,
        "avg_bitrate_kbps": kbps_sum // n_frames,
        "total_samples": total_samples,
        "duration_ms": total_samples * 1000 // sample_rate,
        "vbr": len(bitrates) > 1,
    }


def extract_mp3_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Arrow-batched metadata walk over an MP3 binary column — map-only,
    no shuffle; ~4 bytes read per frame regardless of payload size."""
    from pyspark.sql.types import BooleanType

    out_schema = StructType(
        [f for f in df.schema.fields if f.name != content_col]
        + [
            StructField("n_frames", IntegerType()),
            StructField("sample_rate", IntegerType()),
            StructField("avg_bitrate_kbps", LongType()),
            StructField("total_samples", LongType()),
            StructField("duration_ms", LongType()),
            StructField("vbr", BooleanType()),
        ]
    )
    meta_cols = [f.name for f in out_schema.fields[-6:]]

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                mp3_metadata(bytes(b)) if b is not None else None
                for b in pdf[content_col]
            ]
            keep = [i for i, m in enumerate(metas) if m is not None]
            out = pdf.drop(columns=[content_col]).iloc[keep].reset_index(
                drop=True
            )
            for c in meta_cols:
                out[c] = [metas[i][c] for i in keep]
            yield out[[f.name for f in out_schema.fields]]

    return df.mapInPandas(_map, out_schema)
