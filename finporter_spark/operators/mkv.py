"""Minimal but real Matroska (EBML) muxer/demuxer, stdlib-only.

The frame-sampling operator (multimodal.sample_frames) demuxes MKV the
way any Matroska reader does: parse the EBML header, walk the Segment's
element tree to Tracks (pick the video TrackEntry), then iterate the
Clusters' SimpleBlocks for that track and un-lace each block's frames.
This implements the subset RFC 8794 (EBML) + the public Matroska spec
require for that:

- VINT parsing (1-8 byte variable-length integers: leading-zero-count
  length marker, marker bit stripped for sizes, kept for element IDs);
- unknown-size elements (size VINT all value-bits set -> element runs
  to the end of its parent, the streaming-Segment case);
- element tree walk with container recursion (Segment, Tracks,
  TrackEntry, Cluster, BlockGroup);
- SimpleBlock AND BlockGroup/Block payloads: VINT track number, 2-byte
  relative timestamp, flags, then NO / Xiph / fixed-size / EBML lacing
  -- all four lace modes are decoded (Xiph 255-continuation sizes,
  EBML signed-VINT deltas, fixed equal split).

The muxer emits EBML header + Segment{Info, Tracks, Cluster*} with
frames packed ``frames_per_block`` per SimpleBlock under Xiph lacing
(remainder block un-laced), so a round-trip exercises both the laced
and unlaced decode paths. Round-trips through this demuxer byte-exactly.

No reference parity to cite: the reference (openalloc/FINporter) has no
media path; this exists for the training-data-pipeline surface
(SURVEY.md §2 L5/M group). Public-spec citations: RFC 8794 §4 (VINT,
element structure), matroska.org element registry for the IDs used.
"""

from __future__ import annotations

import struct

# element IDs (bytes as stored, marker bits intact)
EBML = b"\x1a\x45\xdf\xa3"
DOCTYPE = b"\x42\x82"
SEGMENT = b"\x18\x53\x80\x67"
INFO = b"\x15\x49\xa9\x66"
TIMESTAMP_SCALE = b"\x2a\xd7\xb1"
TRACKS = b"\x16\x54\xae\x6b"
TRACK_ENTRY = b"\xae"
TRACK_NUMBER = b"\xd7"
TRACK_TYPE = b"\x83"
CODEC_ID = b"\x86"
CLUSTER = b"\x1f\x43\xb6\x75"
CLUSTER_TS = b"\xe7"
SIMPLE_BLOCK = b"\xa3"
BLOCK_GROUP = b"\xa0"
BLOCK = b"\xa1"

_CONTAINERS = {SEGMENT, TRACKS, TRACK_ENTRY, CLUSTER, BLOCK_GROUP, INFO}

TRACK_TYPE_VIDEO = 1


def is_mkv(data: bytes) -> bool:
    return data[:4] == EBML


def _parse_vint(data: bytes, pos: int, keep_marker: bool):
    """Return (value, next_pos). IDs keep the marker bit (they are
    matched as raw bytes elsewhere; this form is used for lace deltas
    and block track numbers too)."""
    if pos >= len(data):
        raise ValueError("EBML: truncated VINT")
    first = data[pos]
    if first == 0:
        raise ValueError("EBML: VINT longer than 8 bytes")
    length = 1
    mask = 0x80
    while not (first & mask):
        length += 1
        mask >>= 1
    if pos + length > len(data):
        raise ValueError("EBML: truncated VINT body")
    value = first if keep_marker else first & (mask - 1)
    for i in range(1, length):
        value = (value << 8) | data[pos + i]
    return value, pos + length, length


def _elements(data: bytes, start: int, end: int):
    """Yield (id_bytes, payload_start, payload_end) for sibling elements
    in data[start:end]; unknown-size payloads extend to ``end``."""
    pos = start
    while pos < end:
        id_start = pos
        _, pos, id_len = _parse_vint(data, pos, keep_marker=True)
        eid = data[id_start : id_start + id_len]
        size, pos, size_len = _parse_vint(data, pos, keep_marker=False)
        if size == (1 << (7 * size_len)) - 1:  # all value-bits set
            payload_end = end
        else:
            payload_end = pos + size
        if payload_end > end:
            raise ValueError(f"EBML: element {eid.hex()} overruns parent")
        yield eid, pos, payload_end
        pos = payload_end


def _find(data: bytes, start: int, end: int, path: tuple[bytes, ...]):
    if not path:
        return [(start, end)]
    out = []
    for eid, ps, pe in _elements(data, start, end):
        if eid == path[0]:
            out.extend(_find(data, ps, pe, path[1:]))
    return out


def _uint_at(data: bytes, start: int, end: int) -> int:
    v = 0
    for b in data[start:end]:
        v = (v << 8) | b
    return v


def _svint(value: int, length: int) -> int:
    """EBML lace deltas are signed VINTs: stored value minus the
    mid-range bias 2**(7*length-1)-1."""
    return value - ((1 << (7 * length - 1)) - 1)


def _block_frames(data: bytes, start: int, end: int) -> tuple[int, list[bytes]]:
    """Decode a (Simple)Block payload -> (track_number, frames)."""
    track, pos, _ = _parse_vint(data, start, keep_marker=False)
    pos += 2  # 2-byte signed relative timestamp (unused here)
    if pos >= end:
        raise ValueError("EBML: truncated block header")
    flags = data[pos]
    pos += 1
    lacing = (flags >> 1) & 0x3
    if lacing == 0:  # no lacing: one frame
        return track, [data[pos:end]]
    if pos >= end:
        raise ValueError("EBML: truncated lace header")
    n_frames = data[pos] + 1
    pos += 1
    sizes: list[int] = []
    if lacing == 0b01:  # Xiph: 255-continued sizes for all but last
        for _ in range(n_frames - 1):
            sz = 0
            while True:
                if pos >= end:
                    raise ValueError("EBML: truncated Xiph lace sizes")
                b = data[pos]
                pos += 1
                sz += b
                if b != 255:
                    break
            sizes.append(sz)
    elif lacing == 0b10:  # fixed-size: equal split of the remainder
        total = end - pos
        if total % n_frames:
            raise ValueError("EBML: fixed lacing with non-divisible payload")
        sizes = [total // n_frames] * (n_frames - 1)
    else:  # 0b11 EBML lacing: first size VINT, then signed deltas
        sz, pos, _ = _parse_vint(data, pos, keep_marker=False)
        sizes.append(sz)
        for _ in range(n_frames - 2):
            raw, pos, ln = _parse_vint(data, pos, keep_marker=False)
            sz += _svint(raw, ln)
            sizes.append(sz)
    frames = []
    for sz in sizes:
        if pos + sz > end:
            raise ValueError("EBML: lace size overruns block")
        frames.append(data[pos : pos + sz])
        pos += sz
    frames.append(data[pos:end])  # last frame: remainder
    return track, frames


def _video_track(data: bytes, seg_start: int, seg_end: int) -> int | None:
    for ts, te in _find(data, seg_start, seg_end, (TRACKS, TRACK_ENTRY)):
        num = ttype = None
        for eid, ps, pe in _elements(data, ts, te):
            if eid == TRACK_NUMBER:
                num = _uint_at(data, ps, pe)
            elif eid == TRACK_TYPE:
                ttype = _uint_at(data, ps, pe)
        if ttype == TRACK_TYPE_VIDEO and num is not None:
            return num
    return None


def mkv_demux(data: bytes) -> list[bytes]:
    """Extract every video frame as its own bytes object, in cluster
    order. Raises ValueError on a malformed file — the caller decides
    whether that quarantines the row."""
    if not is_mkv(data):
        raise ValueError("not an EBML stream")
    # validate the header is a Matroska doctype (catches e.g. webm-ish
    # EBML that this demuxer was never tested against being silently
    # misread — webm uses the same structure and is accepted)
    tops = list(_elements(data, 0, len(data)))
    doctypes = [
        data[ps:pe]
        for eid, hs, he in tops
        if eid == EBML
        for eid2, ps, pe in _elements(data, hs, he)
        if eid2 == DOCTYPE
    ]
    if doctypes and doctypes[0] not in (b"matroska", b"webm"):
        raise ValueError(f"unsupported EBML doctype {doctypes[0]!r}")
    segs = [(ps, pe) for eid, ps, pe in tops if eid == SEGMENT]
    if not segs:
        raise ValueError("no Segment element")
    frames: list[bytes] = []
    for seg_start, seg_end in segs:
        want = _video_track(data, seg_start, seg_end)
        for eid, ps, pe in _elements(data, seg_start, seg_end):
            if eid != CLUSTER:
                continue
            for ceid, cs, ce in _elements(data, ps, pe):
                if ceid == SIMPLE_BLOCK:
                    track, fs = _block_frames(data, cs, ce)
                elif ceid == BLOCK_GROUP:
                    fs = []
                    for geid, gs, ge in _elements(data, cs, ce):
                        if geid == BLOCK:
                            track, bf = _block_frames(data, gs, ge)
                            fs.extend(bf)
                else:
                    continue
                if want is None or track == want:
                    frames.extend(fs)
    return frames


# ---------------------------------------------------------------------
# muxer


def _encode_vint(value: int) -> bytes:
    for length in range(1, 9):
        # all-ones is reserved for "unknown size"; bump to next length
        if value < (1 << (7 * length)) - 1:
            out = value | (1 << (7 * length))
            return out.to_bytes(length, "big")
    raise ValueError("size too large for an 8-byte VINT")


def _uint(value: int) -> bytes:
    n = max(1, (value.bit_length() + 7) // 8)
    return value.to_bytes(n, "big")


def _elem(eid: bytes, payload: bytes) -> bytes:
    return eid + _encode_vint(len(payload)) + payload


def _xiph_block(track: int, rel_ts: int, frames: list[bytes]) -> bytes:
    """SimpleBlock payload; Xiph lacing when multi-frame."""
    head = _encode_vint(track) + struct.pack(">h", rel_ts)
    if len(frames) == 1:
        return _elem(SIMPLE_BLOCK, head + b"\x80" + frames[0])
    lace = bytes([len(frames) - 1])
    for fr in frames[:-1]:
        sz = len(fr)
        lace += b"\xff" * (sz // 255) + bytes([sz % 255])
    return _elem(
        SIMPLE_BLOCK,
        head + bytes([0x80 | 0x02]) + lace + b"".join(frames),
    )


def mkv_mux(
    frames: list[bytes],
    frames_per_block: int = 2,
    codec_id: bytes = b"V_MJPEG",
    ms_per_frame: int = 40,
) -> bytes:
    """Pack frames into a spec-correct single-video-track MKV: one
    Cluster per block, Xiph lacing inside full blocks, the remainder
    block un-laced — so demux exercises both lace paths (the stsc
    two-run trick from mp4_mux, transplanted)."""
    header = _elem(
        EBML,
        _elem(b"\x42\x86", _uint(1))  # EBMLVersion
        + _elem(b"\x42\xf7", _uint(1))  # EBMLReadVersion
        + _elem(b"\x42\xf2", _uint(4))  # EBMLMaxIDLength
        + _elem(b"\x42\xf3", _uint(8))  # EBMLMaxSizeLength
        + _elem(DOCTYPE, b"matroska")
        + _elem(b"\x42\x87", _uint(4))  # DocTypeVersion
        + _elem(b"\x42\x85", _uint(2)),  # DocTypeReadVersion
    )
    info = _elem(INFO, _elem(TIMESTAMP_SCALE, _uint(1_000_000)))
    tracks = _elem(
        TRACKS,
        _elem(
            TRACK_ENTRY,
            _elem(TRACK_NUMBER, _uint(1))
            + _elem(b"\x73\xc5", _uint(1))  # TrackUID
            + _elem(TRACK_TYPE, _uint(TRACK_TYPE_VIDEO))
            + _elem(CODEC_ID, codec_id),
        ),
    )
    clusters = b""
    for i in range(0, len(frames), frames_per_block):
        chunk = frames[i : i + frames_per_block]
        clusters += _elem(
            CLUSTER,
            _elem(CLUSTER_TS, _uint(i * ms_per_frame))
            + _xiph_block(1, 0, chunk),
        )
    return header + _elem(SEGMENT, info + tracks + clusters)
