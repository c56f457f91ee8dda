"""Minimal but real AVI (RIFF) muxer/demuxer, stdlib-only.

AVI is the oldest of the container formats the frame-sampling operator
demuxes, and structurally the simplest: a RIFF chunk tree. The demuxer
does what any AVI reader does (Microsoft's public AVI RIFF spec /
OpenDML): walk the chunk list, recurse into ``LIST`` chunks, find the
``hdrl`` stream headers to pick the video stream, then emit that
stream's ``##dc``/``##db`` chunks from the ``movi`` list in order. The
``idx1`` index, when present, is validated against the frames actually
walked (offset/size per entry) — a torn index fails loudly rather than
silently desyncing.

The muxer emits RIFF('AVI ' LIST(hdrl avih + LIST(strl strh strf)) +
LIST(movi ##dc*) + idx1) with correct even-byte chunk padding — the
detail every real AVI walker has to get right, so round-trip fixtures
exercise it (odd-length frames are padded on disk but returned exact).

No reference parity to cite: the reference (openalloc/FINporter) has no
media path; this exists for the training-data-pipeline surface
(SURVEY.md §2 L5/M group).
"""

from __future__ import annotations

import struct


def is_avi(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for sibling chunks;
    chunk bodies are word-aligned (odd sizes carry a pad byte)."""
    pos = start
    while pos + 8 <= end:
        fourcc, size = struct.unpack_from("<4sI", data, pos)
        ps = pos + 8
        pe = ps + size
        if pe > end:
            raise ValueError(f"RIFF chunk {fourcc!r} overruns parent")
        yield fourcc, ps, pe
        pos = pe + (size & 1)  # even-byte alignment


def _video_stream_index(data: bytes, hdrl_start: int, hdrl_end: int) -> int | None:
    """Walk LIST strl entries in declaration order; AVI stream numbers
    are assigned by that order (stream 0 = first strl)."""
    idx = 0
    for fourcc, ps, pe in _chunks(data, hdrl_start, hdrl_end):
        if fourcc != b"LIST" or data[ps : ps + 4] != b"strl":
            continue
        for c2, q2, e2 in _chunks(data, ps + 4, pe):
            if c2 == b"strh":
                if data[q2 : q2 + 4] == b"vids":
                    return idx
                break
        idx += 1
    return None


def avi_demux(data: bytes) -> list[bytes]:
    """Extract every frame of the video stream as its own bytes object,
    in movi order. Raises ValueError on malformed structure — the caller
    decides whether that quarantines the row."""
    if not is_avi(data):
        raise ValueError("not a RIFF/AVI file")
    riff_end = 8 + struct.unpack_from("<I", data, 4)[0]
    if riff_end > len(data):
        raise ValueError("RIFF size overruns file")
    stream = None
    frames: list[bytes] = []
    frame_pos: list[tuple[int, int]] = []  # (chunk header offset, size)
    movi_start = None
    idx1 = None
    for fourcc, ps, pe in _chunks(data, 12, riff_end):
        if fourcc == b"LIST" and data[ps : ps + 4] == b"hdrl":
            stream = _video_stream_index(data, ps + 4, pe)
        elif fourcc == b"LIST" and data[ps : ps + 4] == b"movi":
            movi_start = ps
            want = (
                None
                if stream is None
                else f"{stream:02d}".encode()
            )
            for cc, qs, qe in _chunks(data, ps + 4, pe):
                if cc[2:4] not in (b"dc", b"db"):
                    continue
                if want is not None and cc[:2] != want:
                    continue
                frames.append(data[qs:qe])
                frame_pos.append((qs - 8, qe - qs))
        elif fourcc == b"idx1":
            idx1 = (ps, pe)
    if movi_start is None:
        raise ValueError("no movi list")
    if idx1 is not None:
        # validate the index against the frames actually walked:
        # idx1 offsets are relative to the movi list's fourcc position
        ps, pe = idx1
        n = (pe - ps) // 16
        entries = [
            struct.unpack_from("<4sIII", data, ps + 16 * i) for i in range(n)
        ]
        vid = [
            (off, sz)
            for cc, _flags, off, sz in entries
            if cc[2:4] in (b"dc", b"db")
        ]
        # idx1 offsets point at the chunk fourcc, measured from 'movi'
        walked = [(off - movi_start, sz) for off, sz in frame_pos]
        if vid != walked:
            raise ValueError("idx1 index disagrees with movi chunk walk")
    return frames


def avi_mux(
    frames: list[bytes],
    width: int = 16,
    height: int = 16,
    fps: int = 25,
    codec: bytes = b"MJPG",
) -> bytes:
    """Pack frames as the single video stream of a spec-correct AVI
    (hdrl with avih+strl/strh/strf, movi with 00dc chunks, idx1)."""

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        return (
            fourcc
            + struct.pack("<I", len(payload))
            + payload
            + (b"\x00" if len(payload) & 1 else b"")
        )

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        0, 0, 0x10,  # max bytes/sec, padding, flags (HASINDEX)
        len(frames), 0, 1, 0,  # total frames, initial, streams, bufsize
        width, height, 0, 0, 0, 0,
    )
    strh = b"vids" + codec + struct.pack(
        "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0, 0
    ) + struct.pack("<4H", 0, 0, width, height)
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, codec, 0, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_payload = b"movi"
    idx_entries = b""
    for fr in frames:
        # idx1 offset points at the chunk's fourcc, relative to 'movi'
        idx_entries += struct.pack(
            "<4sIII", b"00dc", 0x10, len(movi_payload), len(fr)
        )
        movi_payload += chunk(b"00dc", fr)
    movi = chunk(b"LIST", movi_payload)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx_entries)
    return b"RIFF" + struct.pack("<I", len(body)) + body
