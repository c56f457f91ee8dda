"""GIF codec (87a/89a) — stdlib + numpy only.

GIF is lossless (palette indices, LZW-packed), so unlike JPEG the whole
decode is exactly reproducible: parse logical screen + color tables,
LZW-decompress the index stream (LSB-first variable-width codes, the
GIF variant), and map indices through the palette to RGB. Interlaced
images are deinterlaced per the spec's four-pass order; animations
return the FIRST frame (frame iteration belongs to sample_frames-style
operators). ``gif_encode`` emits a minimal single-frame GIF89a with a
real LZW compressor — used by tests and the m7 catalog entry to build
deterministic fixtures.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode(mcs: int, data: bytes, max_pixels: int) -> list[int]:
    clear = 1 << mcs
    eoi = clear + 1
    width = mcs + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = mcs + 1
                prev = None
                continue
            if code == eoi:
                return list(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt LZW stream")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= max_pixels:
                return list(out[:max_pixels])
    return list(out)


def _lzw_encode(mcs: int, indices: list[int]) -> bytes:
    clear = 1 << mcs
    eoi = clear + 1
    width = mcs + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for idx in indices:
        wk = w + bytes([idx])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
        w = bytes([idx])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_decode(content: bytes) -> np.ndarray:
    """GIF bytes -> uint8 RGB array (h, w, 3) of the first image."""
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(content) < 13:
        raise ValueError("truncated stream at offset 6 (header)")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", content[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(content, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(content):
        b = content[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while True:
                if pos >= len(content):
                    raise ValueError(f"truncated stream at offset {pos}")
                if not content[pos]:
                    break
                pos += 1 + content[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            if pos + 10 > len(content):
                raise ValueError(f"truncated stream at offset {pos}")
            ix, iy, iw, ih, iflags = struct.unpack(
                "<HHHHB", content[pos + 1 : pos + 10]
            )
            pos += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(content, np.uint8, n * 3, pos).reshape(
                    n, 3
                )
                pos += n * 3
            if pal is None:
                raise ValueError("GIF image without a color table")
            if pos >= len(content):
                raise ValueError(f"truncated stream at offset {pos}")
            mcs = content[pos]
            pos += 1
            lzw = bytearray()
            while True:
                if pos >= len(content):
                    raise ValueError(f"truncated stream at offset {pos}")
                if not content[pos]:
                    break
                ln = content[pos]
                lzw += content[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.array(
                _lzw_decode(mcs, bytes(lzw), iw * ih), dtype=np.int64
            )
            if len(idx) < iw * ih:
                raise ValueError("GIF pixel data truncated")
            img = idx.reshape(ih, iw)
            if iflags & 0x40:  # interlaced: 4-pass row order
                order = np.concatenate(
                    [
                        np.arange(0, ih, 8),
                        np.arange(4, ih, 8),
                        np.arange(2, ih, 4),
                        np.arange(1, ih, 2),
                    ]
                )
                deinter = np.empty_like(img)
                deinter[order] = img
                img = deinter
            return pal[np.clip(img, 0, len(pal) - 1)].astype(np.uint8)
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image data")


def gif_encode(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """(h, w) palette indices + (n, 3) palette -> single-frame GIF89a."""
    h, w = indices.shape
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[:n] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    mcs = max(2, bits)
    out.append(mcs)
    lzw = _lzw_encode(mcs, [int(i) for i in indices.reshape(-1)])
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
