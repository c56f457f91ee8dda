"""Minimal but real ISO BMFF (MP4) muxer/demuxer, stdlib-only.

The frame-sampling operator (multimodal.sample_frames) needs a genuine
container demux path: extracting sample bytes means walking the box tree
to the sample tables and slicing ``mdat`` at absolute file offsets —
exactly what any MP4 reader does. This implements the subset the ISO
14496-12 sample-table model requires:

- box walk: 32-bit ``size`` + fourcc ``type`` headers, ``size==1`` ->
  64-bit largesize, ``size==0`` -> to end of enclosing box; containers
  (``moov trak mdia minf stbl``) recursed;
- ``hdlr`` to pick the video track among many;
- ``stsz`` (or fixed ``sample_size``) for per-sample byte lengths;
- ``stco``/``co64`` for chunk start offsets (32/64-bit);
- ``stsc`` runs mapping chunks -> samples-per-chunk (the fiddly one:
  each entry covers [first_chunk, next entry's first_chunk) chunks).

The muxer emits ``ftyp`` + ``mdat`` + a ``moov`` whose sample tables
describe the frames packed into chunks of ``samples_per_chunk`` — a
spec-correct file that round-trips through this demuxer byte-exactly,
and whose layout (multi-chunk, multi-run stsc) exercises every table.

No reference parity to cite: the reference (openalloc/FINporter) has no
media path at all; this exists for the training-data-pipeline surface
(SURVEY.md §2 L5/M group).
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end, header_size) for the
    sibling boxes in data[start:end]."""
    pos = start
    while pos + 8 <= end:
        size, btype = struct.unpack_from(">I4s", data, pos)
        hdr = 8
        if size == 1:
            (largesize,) = struct.unpack_from(">Q", data, pos + 8)
            size, hdr = largesize, 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"malformed box {btype!r} at {pos}")
        yield btype, pos + hdr, pos + size, hdr
        pos += size


def _find(data: bytes, start: int, end: int, path: tuple[bytes, ...]):
    """All payload ranges for boxes matching the type path (recursing
    only through the path's containers)."""
    if not path:
        return [(start, end)]
    out = []
    for btype, ps, pe, _ in _boxes(data, start, end):
        if btype == path[0]:
            out.extend(_find(data, ps, pe, path[1:]))
    return out


def _u32s(data: bytes, pos: int, n: int) -> list[int]:
    return list(struct.unpack_from(f">{n}I", data, pos))


def mp4_demux(data: bytes) -> list[bytes]:
    """Extract every video sample (frame) as its own bytes object.

    Walks moov/trak, picks the track whose ``hdlr`` handler_type is
    ``vide`` (falling back to the first track), resolves the
    stsc/stsz/stco(co64) tables to absolute offsets, and slices the
    file. Raises ValueError on a malformed file — the caller decides
    whether that quarantines the row.
    """
    moovs = _find(data, 0, len(data), (b"moov",))
    if not moovs:
        raise ValueError("no moov box")
    tracks = []
    for ms, me in moovs:
        for ts, te in _find(data, ms, me, (b"trak",)):
            tracks.append((ts, te))
    if not tracks:
        raise ValueError("no trak box")

    def handler(ts: int, te: int) -> bytes:
        for hs, he in _find(data, ts, te, (b"mdia", b"hdlr")):
            return data[hs + 8 : hs + 12]  # version/flags + pre_defined
        return b""

    chosen = next(
        ((ts, te) for ts, te in tracks if handler(ts, te) == b"vide"),
        tracks[0],
    )
    stbl = _find(data, chosen[0], chosen[1], (b"mdia", b"minf", b"stbl"))
    if not stbl:
        raise ValueError("no stbl box")
    ss, se = stbl[0]

    tables: dict[bytes, tuple[int, int]] = {
        btype: (ps, pe) for btype, ps, pe, _ in _boxes(data, ss, se)
    }

    # --- stsz: sample sizes ------------------------------------------
    if b"stsz" not in tables:
        raise ValueError("no stsz box")
    ps, _pe = tables[b"stsz"]
    fixed, count = struct.unpack_from(">II", data, ps + 4)
    sizes = [fixed] * count if fixed else _u32s(data, ps + 12, count)

    # --- stco / co64: chunk offsets ----------------------------------
    if b"stco" in tables:
        ps, _pe = tables[b"stco"]
        (n_chunks,) = struct.unpack_from(">I", data, ps + 4)
        offsets = _u32s(data, ps + 8, n_chunks)
    elif b"co64" in tables:
        ps, _pe = tables[b"co64"]
        (n_chunks,) = struct.unpack_from(">I", data, ps + 4)
        offsets = list(struct.unpack_from(f">{n_chunks}Q", data, ps + 8))
    else:
        raise ValueError("no stco/co64 box")

    # --- stsc: samples per chunk (run-length) ------------------------
    if b"stsc" not in tables:
        raise ValueError("no stsc box")
    ps, _pe = tables[b"stsc"]
    (n_runs,) = struct.unpack_from(">I", data, ps + 4)
    runs = [
        struct.unpack_from(">III", data, ps + 8 + 12 * i)[:2]
        for i in range(n_runs)
    ]  # (first_chunk 1-based, samples_per_chunk)

    # Expand runs across the chunk list, slice samples contiguously
    # from each chunk start.
    frames: list[bytes] = []
    si = 0
    for ci, chunk_off in enumerate(offsets, start=1):
        spc = 0
        for first, samples in runs:
            if first <= ci:
                spc = samples
            else:
                break
        pos = chunk_off
        for _ in range(spc):
            if si >= len(sizes):
                break
            end = pos + sizes[si]
            if end > len(data):
                raise ValueError("sample overruns file")
            frames.append(data[pos:end])
            pos = end
            si += 1
    if si != len(sizes):
        raise ValueError(f"sample tables inconsistent: {si} != {len(sizes)}")
    return frames


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), btype) + payload


def _full(btype: bytes, payload: bytes, version: int = 0) -> bytes:
    return _box(btype, struct.pack(">I", version << 24) + payload)


def mp4_mux(
    frames: list[bytes],
    samples_per_chunk: int = 2,
    timescale: int = 90000,
    sample_delta: int = 3000,
) -> bytes:
    """Pack frames into a minimal spec-correct MP4 (one video track).

    Chunks hold ``samples_per_chunk`` frames each (last chunk takes the
    remainder, giving the stsc table a second run when it's short —
    deliberately, so demux exercises multi-run mapping). Offsets in
    stco are absolute, so moov is laid out AFTER mdat and the mdat
    payload start computed first.
    """
    if not frames:
        raise ValueError("no frames")
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    mdat_payload = b"".join(frames)
    mdat_start = len(ftyp) + 8  # absolute offset of first sample

    n = len(frames)
    full_chunks, rem = divmod(n, samples_per_chunk)
    chunk_sizes = [samples_per_chunk] * full_chunks + ([rem] if rem else [])
    offsets = []
    pos = mdat_start
    fi = 0
    for spc in chunk_sizes:
        offsets.append(pos)
        for _ in range(spc):
            pos += len(frames[fi])
            fi += 1

    stsd = _full(
        b"stsd",
        struct.pack(">I", 1)
        + _box(b"rawv", struct.pack(">6xH", 1) + b"\x00" * 70),
    )
    stts = _full(b"stts", struct.pack(">III", 1, n, sample_delta))
    runs = [(1, samples_per_chunk)]
    if rem and full_chunks:
        runs.append((full_chunks + 1, rem))
    elif rem and not full_chunks:
        runs = [(1, rem)]
    stsc = _full(
        b"stsc",
        struct.pack(">I", len(runs))
        + b"".join(struct.pack(">III", fc, spc, 1) for fc, spc in runs),
    )
    stsz = _full(
        b"stsz",
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stco = _full(
        b"stco",
        struct.pack(">I", len(offsets))
        + b"".join(struct.pack(">I", o) for o in offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    dinf = _box(
        b"dinf",
        _full(b"dref", struct.pack(">I", 1) + _full(b"url ", b"", 0)[:4]
              + b"url " + struct.pack(">I", 1)),
    )
    vmhd = _full(b"vmhd", b"\x00" * 8, 0)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"\x00")
    duration = n * sample_delta
    mdhd = _full(
        b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0)
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd",
        struct.pack(">IIII4x", 0, 0, 1, 0)
        + struct.pack(">I4x2H2H", duration, 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", 16 << 16, 16 << 16),
        version=0,
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">I2H2I", 0x10000, 0x100, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">6I", 0, 0, 0, 0, 0, 0)
        + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov


def is_mp4(data: bytes) -> bool:
    """ISO BMFF sniff: a leading ftyp box (every spec-conformant file)."""
    return len(data) >= 12 and data[4:8] == b"ftyp"
