"""Baseline JPEG codec — stdlib + numpy only (ITU T.81 Annex K tables).

Scope: baseline sequential DCT (SOF0), 8-bit, grayscale (1 component)
or 4:4:4 YCbCr (3 components, no subsampling), standard Annex K
quantization and Huffman tables, no restart markers. That covers the
shapes this engine's own encoder produces and lets ``resize_image``
decode real JPEG bytes; progressive/subsampled files from other
encoders raise NotImplementedError (production swap-in: libjpeg).

Design notes for the exact-oracle trick used by the m4 catalog entry:
a block that is CONSTANT with an even value v has DCT = DC-only with
DC = 8*(v-128); the standard luminance DC quant step is 16, so
dequantized DC = 16*round(8*(v-128)/16) = 8*(v-128) exactly (v even ->
(v-128)/2 is an integer), and IDCT returns exactly v. The whole lossy
pipeline becomes losslessly SQL-predictable for such inputs, giving a
hash-checkable oracle over a genuinely real Huffman+DCT codec.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants (ITU T.81 Annex K — public standard tables) -----------

# K.1 luminance / K.2 chrominance quantization tables, natural order
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K Huffman specs: (bits[1..16], values)
HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal DCT-II matrix: block_dct = D @ block @ D.T
_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0)
_D *= 0.5
_D[0, :] *= 1.0 / np.sqrt(2.0)


def _build_code_table(bits, values):
    """Canonical Huffman: symbol -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_table(bits, values):
    """(length, code) -> symbol."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise EOFError("JPEG entropy stream exhausted")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise EOFError("marker inside entropy stream")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size, amplitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(v if v > 0 else -v).bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, v


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _encode_channel_blocks(
    chan: np.ndarray, qt: np.ndarray
) -> np.ndarray:
    """(h, w) uint8 -> quantized coefficient blocks (nby, nbx, 8, 8)."""
    h, w = chan.shape
    nby, nbx = h // 8, w // 8
    blocks = (
        chan.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3).astype(np.float64)
        - 128.0
    )
    coef = np.einsum("ij,abjk,lk->abil", _D, blocks, _D)
    return np.round(coef / qt).astype(np.int64)


def _decode_channel_blocks(
    q: np.ndarray, qt: np.ndarray
) -> np.ndarray:
    """quantized blocks (nby, nbx, 8, 8) -> (h, w) uint8."""
    coef = q.astype(np.float64) * qt
    pix = np.einsum("ji,abjk,kl->abil", _D, coef, _D) + 128.0
    nby, nbx = q.shape[:2]
    out = pix.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def _dqt_segment(qid: int, qt: np.ndarray) -> bytes:
    body = bytes([qid]) + bytes(qt.reshape(-1)[ZIGZAG].astype(np.uint8))
    return b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body


def _dht_segment(tc: int, th: int, spec) -> bytes:
    bits, values = spec
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def jpeg_encode(pixels: np.ndarray) -> bytes:
    """uint8 (h, w) or (h, w, 1|3) -> baseline JFIF bytes.

    Dimensions must be multiples of 8 (no edge-block padding — callers
    resize/crop first; keeps encode<->decode exactly inverse on
    block-constant inputs, see module docstring). RGB uses 4:4:4, the
    JFIF YCbCr transform.
    """
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, ncomp = pixels.shape
    if h % 8 or w % 8:
        raise ValueError("jpeg_encode requires multiple-of-8 dimensions")
    if ncomp == 3:
        rgb = pixels.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128.0
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128.0
        chans = [
            np.clip(np.rint(y), 0, 255).astype(np.uint8),
            np.clip(np.rint(cb), 0, 255).astype(np.uint8),
            np.clip(np.rint(cr), 0, 255).astype(np.uint8),
        ]
        qts = [QT_LUMA, QT_CHROMA, QT_CHROMA]
    elif ncomp == 1:
        chans = [pixels[..., 0]]
        qts = [QT_LUMA]
    else:
        raise ValueError("jpeg_encode supports 1 or 3 channels")

    quant = [_encode_channel_blocks(c, qt) for c, qt in zip(chans, qts)]

    dc_tabs = [_build_code_table(*HT_DC_LUMA)] + [
        _build_code_table(*HT_DC_CHROMA)
    ] * (ncomp - 1)
    ac_tabs = [_build_code_table(*HT_AC_LUMA)] + [
        _build_code_table(*HT_AC_CHROMA)
    ] * (ncomp - 1)

    bw = _BitWriter()
    nby, nbx = quant[0].shape[:2]
    pred = [0] * ncomp
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(ncomp):
                zz = quant[ci][by, bx].reshape(-1)[ZIGZAG]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                size, amp = _magnitude(diff)
                code, length = dc_tabs[ci][size]
                bw.write(code, length)
                if size:
                    bw.write(amp, size)
                run = 0
                last_nz = 0
                nz = np.nonzero(zz[1:])[0]
                last_nz = nz[-1] + 1 if len(nz) else 0
                for k in range(1, last_nz + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        if run == 16:
                            code, length = ac_tabs[ci][0xF0]  # ZRL
                            bw.write(code, length)
                            run = 0
                        continue
                    size, amp = _magnitude(v)
                    code, length = ac_tabs[ci][(run << 4) | size]
                    bw.write(code, length)
                    bw.write(amp, size)
                    run = 0
                if last_nz < 63:
                    code, length = ac_tabs[ci][0x00]  # EOB
                    bw.write(code, length)
    entropy = bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _dqt_segment(0, QT_LUMA)
    if ncomp == 3:
        out += _dqt_segment(1, QT_CHROMA)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])  # 1x1 sampling
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0, 0, HT_DC_LUMA)
    out += _dht_segment(1, 0, HT_AC_LUMA)
    if ncomp == 3:
        out += _dht_segment(0, 1, HT_DC_CHROMA)
        out += _dht_segment(1, 1, HT_AC_CHROMA)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_decode(content: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 (h, w, ncomp).

    Supports what :func:`jpeg_encode` produces: SOF0, 8-bit, 1 or 3
    components at 1x1 sampling, no restart intervals. Anything else
    raises NotImplementedError with the offending feature named.
    """
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_dec: dict[int, dict] = {}
    ac_dec: dict[int, dict] = {}
    comps: list[tuple[int, int, int]] = []  # (id, qid)
    h = w = None
    scan: bytes | None = None
    sos_comps: list[tuple[int, int, int]] = []  # (cs, dc_table, ac_table)
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = content[pos + 1]
        if marker == 0xD9:
            break
        (seg_len,) = struct.unpack(">H", content[pos + 2 : pos + 4])
        seg = content[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(
                    seg, np.uint8, 64, i + 1
                ).astype(np.int32)
                qts[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                values = list(seg[i + 17 : i + 17 + n])
                (dc_dec if tc == 0 else ac_dec)[th] = _build_decode_table(
                    bits, values
                )
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec = seg[0]
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            for ci in range(nc):
                cid, samp, qid = seg[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise NotImplementedError("subsampled JPEG (not 4:4:4)")
                comps.append((cid, qid, 0))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG (SOF%d)" % (marker - 0xC0))
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            for si in range(ns):
                cs, tabs = seg[1 + 2 * si], seg[2 + 2 * si]
                sos_comps.append((cs, tabs >> 4, tabs & 0xF))
            scan = content[pos + 2 + seg_len :]
            break
        pos += 2 + seg_len
    if h is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    # Map each SOS component selector back to its SOF component. The MCU
    # interleave below walks components in SOF order, so a scan whose
    # component order (or id set) differs from SOF would need a reordered
    # walk — spec-valid but unsupported here: fail loudly, never decode
    # with the wrong Huffman tables.
    if [c[0] for c in sos_comps] != [c[0] for c in comps]:
        raise NotImplementedError(
            "SOS component order/ids differ from SOF (unsupported scan layout)"
        )
    scan_map = [(dc, ac) for _, dc, ac in sos_comps]
    ncomp = len(comps)
    if ncomp not in (1, 3):
        raise NotImplementedError("component count %d" % ncomp)

    nby, nbx = (h + 7) // 8, (w + 7) // 8
    quant = [
        np.zeros((nby, nbx, 8, 8), dtype=np.int64) for _ in range(ncomp)
    ]
    br = _BitReader(scan)

    def read_symbol(table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    pred = [0] * ncomp
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(ncomp):
                dct = dc_dec[scan_map[ci][0]]
                act = ac_dec[scan_map[ci][1]]
                zz = np.zeros(64, dtype=np.int64)
                size = read_symbol(dct)
                diff = _extend(br.read_bits(size), size) if size else 0
                pred[ci] += diff
                zz[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = read_symbol(act)
                    run, size = rs >> 4, rs & 0xF
                    if size == 0:
                        if run == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += run
                    if k > 63:
                        raise ValueError("AC run past block end")
                    zz[k] = _extend(br.read_bits(size), size)
                    k += 1
                blk = np.zeros(64, dtype=np.int64)
                blk[ZIGZAG] = zz
                quant[ci][by, bx] = blk.reshape(8, 8)

    chans = [
        _decode_channel_blocks(quant[ci], qts[comps[ci][1]])[:h, :w]
        for ci in range(ncomp)
    ]
    if ncomp == 1:
        return chans[0][:, :, None]
    y = chans[0].astype(np.float64)
    cb = chans[1].astype(np.float64) - 128.0
    cr = chans[2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def split_mjpeg(data: bytes) -> list[bytes]:
    """Split a concatenated-JPEG (MJPEG-style) byte stream into frames.

    Walks the real marker structure — segment lengths for headers,
    stuffed-byte/RST rules inside entropy data — so a 0xFFD9 byte pair
    inside a segment can never be mistaken for end-of-image. Raises on
    malformed streams rather than guessing.
    """
    frames: list[bytes] = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 2] != b"\xff\xd8":
            raise ValueError(f"expected SOI at offset {pos}")
        start = pos
        pos += 2
        in_entropy = False
        while pos < n:
            if not in_entropy:
                if pos + 2 > n:
                    raise ValueError(f"truncated stream at offset {pos}")
                if data[pos] != 0xFF:
                    raise ValueError(f"bad marker alignment at {pos}")
                m = data[pos + 1]
                if m == 0xD9:  # EOI
                    pos += 2
                    frames.append(data[start:pos])
                    break
                if m == 0x01 or 0xD0 <= m <= 0xD7:  # standalone
                    pos += 2
                    continue
                if pos + 4 > n:
                    raise ValueError(f"truncated stream at offset {pos}")
                (seg_len,) = struct.unpack(">H", data[pos + 2 : pos + 4])
                was_sos = m == 0xDA
                pos += 2 + seg_len
                in_entropy = was_sos
            else:
                b = data[pos]
                if b != 0xFF:
                    pos += 1
                    continue
                if pos + 1 >= n:
                    raise ValueError(f"truncated stream at offset {pos}")
                m = data[pos + 1]
                if m == 0x00 or 0xD0 <= m <= 0xD7:  # stuffed / RST
                    pos += 2
                    continue
                in_entropy = False  # real marker ends the scan
        else:
            raise ValueError("stream ended inside a frame")
    return frames
