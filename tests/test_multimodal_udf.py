"""Multimodal binary plumbing (L5) + UDF surface (U1-U4)."""

from __future__ import annotations

import struct

import pandas as pd
import pytest
from pyspark.sql import functions as F

from finporter_spark.operators.multimodal import (
    attach_image_meta,
    decode_image_meta_bytes,
    resize_image,
    sample_frames,
)
from finporter_spark.sources import read_binary
from finporter_spark.udf import flatten_map, grouped_transform, vectorized


def _png(w, h):
    return (
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + struct.pack(">II", w, h) + b"\x00" * 32
    )


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 16


def test_header_parsers():
    assert decode_image_meta_bytes(_png(640, 480)) == ("png", 640, 480)
    assert decode_image_meta_bytes(_gif(32, 16)) == ("gif", 32, 16)
    assert decode_image_meta_bytes(b"garbage!!") == (None, None, None)


@pytest.fixture()
def media_dir(tmp_path):
    (tmp_path / "a.png").write_bytes(_png(640, 480))
    (tmp_path / "b.gif").write_bytes(_gif(32, 16))
    (tmp_path / "c.bin").write_bytes(b"\x00" * 100)
    return str(tmp_path)


def test_binary_source_and_meta(spark, media_dir):
    df = read_binary(spark, media_dir)
    assert {"path", "modificationTime", "length", "content"} <= set(df.columns)
    out = attach_image_meta(df)
    got = {r.path.split("/")[-1]: (r.format, r.width, r.height) for r in out.collect()}
    assert got["a.png"] == ("png", 640, 480)
    assert got["b.gif"] == ("gif", 32, 16)
    assert got["c.bin"] == (None, None, None)


def test_resize_unknown_format_raises_without_fake(spark, media_dir):
    """The real path refuses formats it cannot actually decode instead
    of silently faking them."""
    df = read_binary(spark, media_dir).filter(F.col("path").endswith("c.bin"))
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        resize_image(df).collect()


def test_resize_gif_real_pixels(spark, tmp_path):
    """GIF is lossless: resize decodes real LZW index data and the
    output PNG pixels equal the palette-mapped, index-sampled source."""
    import numpy as np

    from finporter_spark.operators.gif import gif_encode
    from finporter_spark.operators.multimodal import (
        nearest_resize,
        png_decode,
    )

    rng = np.random.RandomState(11)
    pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, (12, 10)).astype(np.int64)
    (tmp_path / "x.gif").write_bytes(gif_encode(idx, pal))
    df = read_binary(spark, str(tmp_path))
    out = resize_image(df, size=(5, 6)).collect()
    arr = png_decode(bytes(out[0].resized))
    assert arr.shape == (6, 5, 3)
    assert (arr == nearest_resize(pal[idx].astype(np.uint8), (5, 6))).all()


def test_gif_codec_roundtrip():
    import numpy as np

    from finporter_spark.operators.gif import gif_decode, gif_encode

    rng = np.random.RandomState(9)
    for ncol, shape in ((4, (10, 7)), (256, (80, 90))):
        pal = rng.randint(0, 256, (ncol, 3)).astype(np.uint8)
        idx = rng.randint(0, ncol, shape).astype(np.int64)
        assert (gif_decode(gif_encode(idx, pal)) == pal[idx]).all()


def test_resize_png_real_pixels(spark, tmp_path):
    """The PNG path is REAL: decode -> nearest-neighbor -> re-encode.
    The resized bytes are a valid PNG of the target dims whose pixels
    equal numpy's index-sampled original."""
    import numpy as np

    from finporter_spark.operators.multimodal import (
        nearest_resize,
        png_decode,
        png_encode,
    )

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, (12, 10, 3), dtype=np.uint8)
    (tmp_path / "real.png").write_bytes(png_encode(px))
    df = read_binary(spark, str(tmp_path))
    out = resize_image(df, size=(5, 6)).collect()
    assert len(out) == 1
    arr = png_decode(bytes(out[0].resized))
    assert arr.shape == (6, 5, 3)
    assert (arr == nearest_resize(px, (5, 6))).all()


def test_png_codec_roundtrip_all_filters():
    """Every PNG filter type (None/Sub/Up/Average/Paeth) and channel
    count (gray/GA/RGB/RGBA) survives encode -> decode bit-exact."""
    import numpy as np

    from finporter_spark.operators.multimodal import png_decode, png_encode

    rng = np.random.RandomState(7)
    for ch in (1, 2, 3, 4):
        px = rng.randint(0, 256, (13, 9, ch), dtype=np.uint8)
        for ft in range(5):
            assert (png_decode(png_encode(px, filter_type=ft)) == px).all()


def test_resize_real_shape(spark, tmp_path):
    """Generic resize plumbing over a mixed-format dir (real PNG + GIF
    files on disk): content column dropped, every output is a real
    8x8 PNG."""
    import numpy as np

    from finporter_spark.operators.gif import gif_encode
    from finporter_spark.operators.multimodal import png_decode, png_encode

    rng = np.random.RandomState(3)
    (tmp_path / "a.png").write_bytes(
        png_encode(rng.randint(0, 256, (24, 16, 3), dtype=np.uint8))
    )
    (tmp_path / "b.gif").write_bytes(
        gif_encode(
            rng.randint(0, 4, (12, 20), dtype=np.uint8),
            np.array(
                [[0, 0, 0], [80, 10, 10], [10, 80, 10], [10, 10, 80]],
                dtype=np.uint8,
            ),
        )
    )
    df = read_binary(spark, str(tmp_path))
    out = resize_image(df, size=(8, 8))
    rows = out.collect()
    assert len(rows) == 2
    assert "content" not in out.columns
    for r in rows:
        assert bytes(r.resized)[:8] == b"\x89PNG\r\n\x1a\n"
        assert png_decode(bytes(r.resized)).shape[:2] == (8, 8)


def test_sample_frames_every_n_subsample(spark):
    """every_n_frames over a REAL MJPEG stream: frame_idx keeps the
    original demux index (0, 2, 4, ...) and each kept frame is a valid
    standalone JPEG."""
    import numpy as np

    from finporter_spark.operators.jpeg import jpeg_decode, jpeg_encode

    frames = [
        jpeg_encode(np.full((8, 8, 1), v, np.uint8))
        for v in (10, 40, 70, 100, 130)
    ]
    df = spark.createDataFrame(
        [(1, b"".join(frames))], "id long, content binary"
    )
    out = sample_frames(df, every_n_frames=2).collect()
    assert [r.frame_idx for r in sorted(out, key=lambda r: r.frame_idx)] == [
        0, 2, 4,
    ]
    means = {
        r.frame_idx: int(jpeg_decode(bytes(r.frame)).mean()) for r in out
    }
    assert means == {0: 10, 2: 70, 4: 130}


# --- UDF surface ---

def test_u1_vectorized_scalar(spark):
    @vectorized("double")
    def plus_tax(price: pd.Series) -> pd.Series:
        return price * 1.08

    df = spark.createDataFrame([(100.0,), (200.0,)], "price double")
    got = sorted(r.t for r in df.select(plus_tax("price").alias("t")).collect())
    assert got == [108.0, 216.0]


def test_u2_grouped_normalize(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 30.0)], "k string, v double"
    )

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.assign(v=pdf.v - pdf.v.mean())

    out = grouped_transform(df, ["k"], center, "k string, v double")
    got = sorted((r.k, r.v) for r in out.collect())
    assert got == [("a", -1.0), ("a", 1.0), ("b", -10.0), ("b", 10.0)]


def test_u3_grouped_agg(spark):
    from finporter_spark.udf import grouped_agg

    @grouped_agg("double")
    def wmean(v: pd.Series, w: pd.Series) -> float:
        return float((v * w).sum() / w.sum())

    df = spark.createDataFrame(
        [("a", 2.0, 1.0), ("a", 4.0, 3.0)], "k string, v double, w double"
    )
    got = df.groupBy("k").agg(wmean("v", "w").alias("m")).first()
    assert got.m == pytest.approx(3.5)


def test_u4_flatten(spark):
    df = spark.createDataFrame([("a,b,c",)], "csv string")

    def split_rows(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = [
            {"tok": t} for s in pdf.csv for t in s.split(",")
        ]
        return pd.DataFrame(rows, columns=["tok"])

    out = flatten_map(df, split_rows, "tok string")
    assert sorted(r.tok for r in out.collect()) == ["a", "b", "c"]


def test_jpeg_codec_block_constant_exact():
    """The oracle property: block-constant EVEN pixel values survive the
    lossy pipeline exactly (DC-only blocks dequantize losslessly)."""
    import numpy as np

    from finporter_spark.operators.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.RandomState(1)
    for _ in range(3):
        bv = (rng.randint(0, 128, (3, 4)) * 2).astype(np.uint8)
        px = np.kron(bv, np.ones((8, 8), dtype=np.uint8))[:, :, None]
        assert (jpeg_decode(jpeg_encode(px)) == px).all()


def test_jpeg_codec_lossy_bounds_and_meta():
    """General inputs roundtrip within quantization error; SOF0 headers
    parse through the shared metadata sniffer."""
    import numpy as np

    from finporter_spark.operators.jpeg import jpeg_decode, jpeg_encode
    from finporter_spark.operators.multimodal import decode_image_meta_bytes

    x = np.linspace(0, 255, 64)
    grad = np.clip(np.rint(np.add.outer(x, x) / 2), 0, 255).astype(
        np.uint8
    )[:, :, None]
    err = np.abs(
        jpeg_decode(jpeg_encode(grad)).astype(int) - grad.astype(int)
    ).max()
    assert err <= 12, err

    rgb = np.zeros((16, 24, 3), np.uint8)
    rgb[..., 0], rgb[..., 1], rgb[..., 2] = 200, 100, 50
    err = np.abs(
        jpeg_decode(jpeg_encode(rgb)).astype(int) - rgb.astype(int)
    ).max()
    assert err <= 6, err

    assert decode_image_meta_bytes(jpeg_encode(rgb)) == ("jpeg", 24, 16)


def test_resize_jpeg_real(spark, tmp_path):
    """resize_image decodes baseline JPEG for real and emits lossless
    PNG bytes of the target dims."""
    import numpy as np

    from finporter_spark.operators.jpeg import jpeg_encode
    from finporter_spark.operators.multimodal import png_decode

    bv = np.array([[100, 200], [50, 150]], dtype=np.uint8)
    px = np.kron(bv, np.ones((8, 8), np.uint8))[:, :, None]
    (tmp_path / "a.jpg").write_bytes(jpeg_encode(px))
    df = read_binary(spark, str(tmp_path))
    out = resize_image(df, size=(4, 4)).collect()
    arr = png_decode(bytes(out[0].resized))
    assert arr.shape == (4, 4, 1)
    # nearest map: src = (dst*16)//4 -> rows 0,4,8,12 -> blocks 0,0,1,1
    want = np.kron(bv, np.ones((2, 2), np.uint8))[:, :, None]
    assert (arr == want).all()


def test_wav_codec_and_features(spark):
    """WAV PCM roundtrips bit-exact; the real feature extractor's
    energy/amp/zero-crossings match hand-computed numpy values."""
    import numpy as np

    from finporter_spark.operators.audio import (
        extract_wav_features,
        wav_decode,
        wav_encode,
    )

    rng = np.random.RandomState(5)
    s = rng.randint(-32768, 32768, (1000, 2), dtype=np.int64)
    rate, dec = wav_decode(wav_encode(s, 44100))
    assert rate == 44100 and (dec == s).all()
    s8 = rng.randint(-128, 128, (64,), dtype=np.int64)
    _, dec8 = wav_decode(wav_encode(s8, 8000, bits=8))
    assert (dec8[:, 0] == s8).all()

    mono = rng.randint(-1000, 1000, (600,), dtype=np.int64)
    df = spark.createDataFrame(
        [(1, bytearray(wav_encode(mono, 16000)))], "id long, content binary"
    )
    rows = extract_wav_features(df, frame_samples=256).collect()
    assert [r.frame_idx for r in rows] == [0, 1]  # 600 // 256
    fr = mono[:512].reshape(2, 256)
    assert [r.energy for r in rows] == [int((f * f).sum()) for f in fr]
    assert [r.amp_sum for r in rows] == [int(f.sum()) for f in fr]
    sign = fr >= 0
    assert [r.zero_crossings for r in rows] == [
        int((sign[k, 1:] != sign[k, :-1]).sum()) for k in range(2)
    ]


def test_wav_rejects_compressed(spark):
    import struct as st

    from finporter_spark.operators.audio import wav_decode

    fmt = st.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32)  # IEEE float tag
    bad = (
        b"RIFF" + st.pack("<I", 4 + 8 + len(fmt)) + b"WAVE"
        + b"fmt " + st.pack("<I", len(fmt)) + fmt
    )
    import pytest as pt

    with pt.raises(NotImplementedError, match="format tag"):
        wav_decode(bad)


def test_sample_frames_real_mjpeg(spark):
    """The real path demuxes concatenated JPEGs by marker structure and
    each extracted frame decodes to its source pixels."""
    import numpy as np

    from finporter_spark.operators.jpeg import jpeg_decode, jpeg_encode

    vals = (40, 120, 250)
    stream = b"".join(
        jpeg_encode(np.full((16, 16, 1), v - (v % 2), np.uint8)) for v in vals
    )
    df = spark.createDataFrame(
        [(1, bytearray(stream))], "id long, content binary"
    )
    rows = sorted(
        sample_frames(df).collect(), key=lambda r: r.frame_idx
    )
    assert [r.frame_idx for r in rows] == [0, 1, 2]
    for r, v in zip(rows, vals):
        assert (jpeg_decode(bytes(r.frame)) == v - (v % 2)).all()
    # every_n_frames subsampling
    assert sorted(
        r.frame_idx
        for r in sample_frames(df, every_n_frames=2).collect()
    ) == [0, 2]


def test_mp4_mux_demux_roundtrip():
    """Every chunk layout round-trips byte-exactly, including the
    remainder chunk that forces a second stsc run."""
    from finporter_spark.operators.mp4 import is_mp4, mp4_demux, mp4_mux

    for spc in (1, 2, 3, 5, 100):
        for nf in (1, 2, 3, 7, 10):
            frames = [bytes([i]) * (10 + 7 * i) for i in range(nf)]
            data = mp4_mux(frames, samples_per_chunk=spc)
            assert is_mp4(data)
            assert mp4_demux(data) == frames


def test_mp4_demux_malformed_raises():
    import pytest

    from finporter_spark.operators.mp4 import mp4_demux, mp4_mux

    with pytest.raises(ValueError, match="no moov"):
        mp4_demux(b"\x00\x00\x00\x08ftyp")
    # truncate a valid file inside mdat: sample tables overrun
    good = mp4_mux([b"x" * 64, b"y" * 64])
    moov_at = good.index(b"moov") - 4
    clipped = good[: moov_at - 40] + good[moov_at:]
    with pytest.raises(ValueError):
        mp4_demux(clipped)


def test_sample_frames_real_mp4(spark):
    """The real container path: box-tree walk to the sample tables,
    mdat sliced at absolute offsets."""
    import numpy as np

    from finporter_spark.operators.jpeg import jpeg_decode, jpeg_encode
    from finporter_spark.operators.mp4 import mp4_mux

    vals = (40, 120, 250)
    frames = [
        jpeg_encode(np.full((16, 16, 1), v - (v % 2), np.uint8)) for v in vals
    ]
    data = mp4_mux(frames, samples_per_chunk=2)  # 2+1 => two stsc runs
    df = spark.createDataFrame(
        [(1, bytearray(data))], "id long, content binary"
    )
    rows = sorted(sample_frames(df).collect(), key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in rows] == [0, 1, 2]
    for r, v in zip(rows, vals):
        assert (jpeg_decode(bytes(r.frame)) == v - (v % 2)).all()


def test_truncated_streams_raise_value_error():
    """Malformed-input contract: every codec raises ValueError (never a
    bare IndexError/struct.error) when the stream is cut mid-structure."""
    import numpy as np

    from finporter_spark.operators.audio import wav_decode, wav_encode
    from finporter_spark.operators.gif import gif_decode, gif_encode
    from finporter_spark.operators.jpeg import jpeg_encode, split_mjpeg

    jpg = jpeg_encode(np.full((16, 16, 1), 100, np.uint8))
    # cut inside entropy data, right before EOI, and mid-segment-header
    for cut in (len(jpg) - 1, len(jpg) - 2, 30, 3):
        with pytest.raises(ValueError):
            split_mjpeg(jpg[:cut])

    gif = gif_encode(
        np.arange(64, dtype=np.int64).reshape(8, 8) % 4,
        np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]]),
    )
    for cut in (10, 14, len(gif) - 2):
        with pytest.raises(ValueError):
            gif_decode(gif[:cut])

    wav = wav_encode(np.arange(-50, 50, dtype=np.int64), 8000)
    with pytest.raises(ValueError):
        wav_decode(wav[:20])  # fmt chunk body cut short


def test_jpeg_sos_order_mismatch_raises():
    """A scan whose component order differs from SOF must fail loudly,
    not decode with swapped Huffman tables."""
    import numpy as np

    from finporter_spark.operators.jpeg import jpeg_decode, jpeg_encode

    jpg = bytearray(jpeg_encode(np.full((8, 8, 3), 90, np.uint8)))
    sos = jpg.index(b"\xff\xda")
    ns = jpg[sos + 4]
    assert ns == 3
    # swap the first two scan-component entries (id + table byte pairs)
    a = sos + 5
    jpg[a : a + 2], jpg[a + 2 : a + 4] = jpg[a + 2 : a + 4], jpg[a : a + 2]
    with pytest.raises(NotImplementedError, match="SOS component"):
        jpeg_decode(bytes(jpg))


def test_mkv_mux_demux_roundtrip():
    """Spec-correct EBML write must demux byte-exactly through the
    independent element-tree walk — all frame counts (even/odd lace
    remainders) and sizes spanning the Xiph 255-continuation."""
    from finporter_spark.operators.mkv import is_mkv, mkv_demux, mkv_mux

    for n in (1, 2, 3, 5):
        for fpb in (1, 2, 3):
            frames = [bytes([i]) * (100 + 200 * i) for i in range(n)]
            data = mkv_mux(frames, frames_per_block=fpb)
            assert is_mkv(data)
            assert mkv_demux(data) == frames


def test_mkv_all_lace_modes_decode():
    """The demuxer must handle every Matroska lace mode, not just the
    ones our muxer emits: fixed-size and EBML-delta laced blocks are
    hand-assembled per the public spec and decoded."""
    import struct

    from finporter_spark.operators.mkv import (
        SIMPLE_BLOCK,
        _block_frames,
        _elem,
        _encode_vint,
    )

    def block(payload):
        e = _elem(SIMPLE_BLOCK, payload)
        return _block_frames(e, len(e) - len(payload), len(e))

    head = _encode_vint(1) + struct.pack(">h", 0)
    # fixed-size lacing: 3 equal frames
    t, fs = block(head + bytes([0x80 | 0x04, 2]) + b"abcXYZ")
    assert (t, fs) == (1, [b"ab", b"cX", b"YZ"])
    # EBML lacing: sizes 3, 3+1, remainder
    sv = _encode_vint(1 + ((1 << 6) - 1))  # signed-VINT delta +1
    t, fs = block(
        head + bytes([0x80 | 0x06, 2]) + _encode_vint(3) + sv + b"AAABBBBCC"
    )
    assert (t, fs) == (1, [b"AAA", b"BBBB", b"CC"])


def test_mkv_demux_malformed_raises():
    from finporter_spark.operators.mkv import mkv_demux, mkv_mux

    with pytest.raises(ValueError):
        mkv_demux(b"\x00\x00\x00\x00")  # not EBML
    good = mkv_mux([b"x" * 64, b"y" * 64, b"z" * 64])
    with pytest.raises(ValueError):
        mkv_demux(good[:-10])  # element overruns parent
    # doctype guard: an EBML stream that isn't matroska/webm
    bad = bytearray(good)
    bad[bad.index(b"matroska") : bad.index(b"matroska") + 8] = b"whatever"
    with pytest.raises(ValueError, match="doctype"):
        mkv_demux(bytes(bad))


def test_sample_frames_real_mkv(spark):
    """The real EBML path end-to-end in Spark: element-tree walk to the
    video track, cluster SimpleBlocks un-laced (2-per-block Xiph + odd
    remainder un-laced)."""
    import numpy as np

    from finporter_spark.operators.jpeg import jpeg_decode, jpeg_encode
    from finporter_spark.operators.mkv import mkv_mux

    vals = (40, 120, 250)
    frames = [
        jpeg_encode(np.full((16, 16, 1), v - (v % 2), np.uint8)) for v in vals
    ]
    data = mkv_mux(frames, frames_per_block=2)  # laced pair + bare block
    df = spark.createDataFrame(
        [(1, bytearray(data))], "id long, content binary"
    )
    rows = sorted(sample_frames(df).collect(), key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in rows] == [0, 1, 2]
    for r, v in zip(rows, vals):
        assert (jpeg_decode(bytes(r.frame)) == v - (v % 2)).all()


def test_mp3_metadata_walk():
    """Frame-header walk: ID3v2 skip, padding-bit frame lengths, VBR
    averaging, ID3v1 trailer stop — and fail-loud on damage."""
    from finporter_spark.operators.audio import mp3_metadata, mp3_mux

    m = mp3_metadata(mp3_mux([32, 40, 48], 44100, id3v2_size=33, id3v1=True))
    assert m == {
        "n_frames": 3, "sample_rate": 44100, "avg_bitrate_kbps": 40,
        "total_samples": 3456, "duration_ms": 78, "vbr": True,
    }
    m = mp3_metadata(mp3_mux([64] * 4, 48000))
    assert (m["avg_bitrate_kbps"], m["vbr"]) == (64, False)
    assert m["duration_ms"] == 4 * 1152 * 1000 // 48000

    good = mp3_mux([32, 32], 44100)
    with pytest.raises(ValueError):
        mp3_metadata(good[:-10])  # truncated final frame
    with pytest.raises(ValueError):
        mp3_metadata(b"\x00" * 64)  # no sync
    with pytest.raises(ValueError):
        mp3_metadata(good[:3])  # truncated header
    # a Layer I header must refuse, not mis-walk
    bad = bytearray(good)
    bad[1] = (bad[1] & ~0x06) | 0x06  # layer bits -> Layer I
    with pytest.raises(NotImplementedError):
        mp3_metadata(bytes(bad))


def test_extract_mp3_metadata_spark(spark):
    from finporter_spark.operators.audio import extract_mp3_metadata, mp3_mux

    df = spark.createDataFrame(
        [
            (1, bytearray(mp3_mux([32, 48], 44100, id3v2_size=11))),
            (2, bytearray(mp3_mux([128] * 3, 32000, id3v1=True))),
        ],
        "id long, content binary",
    )
    rows = {r.id: r for r in extract_mp3_metadata(df).collect()}
    assert rows[1].n_frames == 2 and rows[1].vbr
    assert rows[1].avg_bitrate_kbps == 40
    assert rows[2].sample_rate == 32000 and not rows[2].vbr
    assert rows[2].duration_ms == 3 * 1152 * 1000 // 32000


def test_avi_mux_demux_roundtrip():
    """RIFF chunk walk incl. odd-size word alignment and idx1 validation."""
    from finporter_spark.operators.avi import avi_demux, avi_mux, is_avi

    for sizes in ((9,), (10, 11), (255, 256, 701)):
        frames = [bytes([i]) * s for i, s in enumerate(sizes)]
        data = avi_mux(frames)
        assert is_avi(data)
        assert avi_demux(data) == frames


def test_avi_demux_malformed_raises():
    import struct

    from finporter_spark.operators.avi import avi_demux, avi_mux

    with pytest.raises(ValueError):
        avi_demux(b"RIFF\x00\x00\x00\x00WAVE")  # not AVI
    good = avi_mux([b"x" * 64, b"y" * 65])
    with pytest.raises(ValueError):
        avi_demux(good[:-20])  # truncated
    bad = bytearray(good)
    struct.pack_into("<I", bad, bad.rindex(b"00dc") + 8, 9999)
    with pytest.raises(ValueError, match="idx1"):
        avi_demux(bytes(bad))


def test_sample_frames_real_avi(spark):
    import numpy as np

    from finporter_spark.operators.avi import avi_mux
    from finporter_spark.operators.jpeg import jpeg_decode, jpeg_encode

    vals = (40, 120, 250)
    frames = [
        jpeg_encode(np.full((16, 16, 1), v - (v % 2), np.uint8)) for v in vals
    ]
    df = spark.createDataFrame(
        [(1, bytearray(avi_mux(frames)))], "id long, content binary"
    )
    rows = sorted(sample_frames(df).collect(), key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in rows] == [0, 1, 2]
    for r, v in zip(rows, vals):
        assert (jpeg_decode(bytes(r.frame)) == v - (v % 2)).all()


def test_dhash_invariant_to_reencode_sensitive_to_content(spark):
    """dHash must be identical for a byte-identical re-encode of the
    same pixels (dedup recall) and differ for a visibly different
    pattern (precision); output must be a 64-char bit string."""
    import numpy as np
    from pyspark.sql import Row

    from finporter_spark.operators.multimodal import dhash_image, png_encode

    y, x = np.arange(12)[:, None], np.arange(17)[None, :]
    a = ((3 * y * y + 5 * x * x) % 256).astype(np.uint8)
    b = ((3 * y * y + 5 * x * x + 97) % 256).astype(np.uint8)  # shifted mod
    rows = [
        Row(doc_id=1, content=bytearray(png_encode(a[:, :, None]))),
        Row(doc_id=2, content=bytearray(png_encode(a[:, :, None], filter_type=0))),
        Row(doc_id=3, content=bytearray(png_encode(b[:, :, None]))),
    ]
    out = {
        r["doc_id"]: r["dhash"]
        for r in dhash_image(spark.createDataFrame(rows)).collect()
    }
    assert len(out[1]) == 64 and set(out[1]) <= {"0", "1"}
    assert out[1] == out[2]
    assert out[1] != out[3]
