"""Multimodal plumbing tests: blob attachment schema, mapInPandas
feature extraction verified against a plain-Python oracle, the decode
stub contract, and the frame-sample explosion."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gazelle_plugin_spark.operators.multimodal import (
    attach_blob,
    decode_image,
    extract_byte_features,
    sample_frames,
)
from gazelle_plugin_spark.plans._util import t
from tests.conftest import SF_SMALL


@pytest.fixture()
def docs(spark):
    return t(spark, SF_SMALL, "documents").filter(F.col("doc_id") < 20)


def test_attach_blob_schema(docs):
    d = attach_blob(docs)
    types = dict(d.dtypes)
    assert types["blob"] == "binary"
    assert types["media_meta"].startswith("struct<mime:string,n_bytes:int")


def test_byte_features_match_python(docs):
    got = {
        r.doc_id: (r.n_bytes, r.mean_byte, r.n_distinct_bytes, r.head_byte)
        for r in extract_byte_features(attach_blob(docs)).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        arr = np.frombuffer(row.text.encode(), dtype=np.uint8)
        expected = (arr.size, float(arr.mean()), int(np.unique(arr).size), int(arr[0]))
        assert got[row.doc_id] == expected


def _bmp(w: int, h: int, bpp: int = 24) -> bytes:
    import struct

    return (
        b"BM"
        + struct.pack("<IHHI", 54, 0, 0, 54)      # size, reserved, offset
        + struct.pack("<IiiHH", 40, w, h, 1, bpp)  # BITMAPINFOHEADER head
        + b"\x00" * 24                             # rest of DIB + stub pixels
    )


def test_decode_image_bmp_ppm(spark):
    """Generated BMP / netpbm fixtures decode end-to-end through the
    mapInPandas pipeline (real header parse, no codec library)."""
    rows = [
        (0, _bmp(640, 480)),
        (1, _bmp(32, -16, bpp=32)),             # top-down BMP
        (2, b"P6\n# a comment\n123 77\n255\n" + b"\x01" * 8),
        (3, b"P5 12 34 255 " + b"\x02" * 8),
        (4, b"not an image at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    got = {r.doc_id: r for r in decode_image(df).collect()}
    assert (got[0].format, got[0].width, got[0].height, got[0].mode) == ("BMP", 640, 480, "RGB")
    assert (got[1].format, got[1].width, got[1].height, got[1].mode) == ("BMP", 32, 16, "RGBA")
    assert (got[2].format, got[2].width, got[2].height, got[2].mode) == ("PPM", 123, 77, "RGB")
    assert (got[3].format, got[3].width, got[3].height, got[3].mode) == ("PPM", 12, 34, "L")
    assert got[4].format == "unknown" and got[4].width is None and got[4].mode is None


def _png(w: int, h: int, color_type: int = 6) -> bytes:
    import struct

    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + bytes([8, color_type, 0, 0, 0])
    )


def _jpeg(w: int, h: int, ncomp: int = 3) -> bytes:
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 8 + 3 * ncomp)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + bytes([ncomp])
        + b"\x00" * (3 * ncomp)
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xda\x00\x02"


def _gif(w: int, h: int) -> bytes:
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 5


def _webp_vp8l(w: int, h: int) -> bytes:
    import struct

    bits = (w - 1) | ((h - 1) << 14)
    return (
        b"RIFF" + struct.pack("<I", 20) + b"WEBP"
        + b"VP8L" + struct.pack("<I", 8) + b"\x2f" + struct.pack("<I", bits)
    )


def test_decode_header_compressed_formats(spark):
    """PNG/JPEG/GIF/WEBP dimensions parse from pure struct reads — no
    codec library — through the full mapInPandas pipeline; non-image
    RIFF (WAV) is distinguished from WEBP instead of misflagged."""
    rows = [
        (0, _png(800, 600)),
        (1, _jpeg(640, 480)),
        (2, _gif(320, 200)),
        (3, _webp_vp8l(100, 50)),
        (4, b"RIFF\x00\x00\x00\x00WAVEfmt "),   # audio container
        (5, _png(1, 1)[:10]),                    # truncated PNG
    ]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    got = {r.doc_id: r for r in decode_image(df).collect()}
    assert (got[0].format, got[0].width, got[0].height, got[0].mode) == ("PNG", 800, 600, "RGBA")
    assert (got[1].format, got[1].width, got[1].height, got[1].mode) == ("JPEG", 640, 480, "RGB")
    assert (got[2].format, got[2].width, got[2].height, got[2].mode) == ("GIF", 320, 200, "P")
    assert (got[3].format, got[3].width, got[3].height) == ("WEBP", 100, 50)
    assert got[4].format == "WAV" and got[4].width is None
    # total parse: a truncated blob yields a row, never a batch abort
    assert got[5].format == "PNG" and got[5].width is None


def test_decode_header_bmp_negative_width_flagged():
    """Negative BMP width is invalid per spec — flagged as None, not
    passed through as a nonsense dimension."""
    import struct

    from gazelle_plugin_spark.operators.multimodal import decode_header

    bad = (
        b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
        + struct.pack("<IiiHH", 40, -12, 34, 1, 24) + b"\x00" * 24
    )
    assert decode_header(bad) == ("BMP", None, 34, "RGB")


def test_decode_pixels_native_and_gated():
    """Pixel decode is native for netpbm and uncompressed 24-bit BMP;
    compressed formats keep the documented env-gated
    NotImplementedError (the codec gate lives at the PIXEL grain)."""
    import struct

    from gazelle_plugin_spark.operators.multimodal import decode_pixels

    p5 = b"P5\n2 2\n255\n" + bytes([1, 2, 3, 4])
    assert decode_pixels(p5).tolist() == [[1, 2], [3, 4]]
    # 2x2 24-bit bottom-up BMP: rows stored bottom-first, BGR, 4-byte
    # padded stride (2*3 -> 8). Image: top = red,green; bottom = blue,white.
    pix = (
        bytes([255, 0, 0]) + bytes([255, 255, 255]) + b"\x00\x00"  # bottom row BGR
        + bytes([0, 0, 255]) + bytes([0, 255, 0]) + b"\x00\x00"    # top row BGR
    )
    bmp = (
        b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pix), 0, 0, 0, 0)
        + pix
    )
    raster = decode_pixels(bmp)
    assert raster.shape == (2, 2, 3)
    assert raster[0].tolist() == [[255, 0, 0], [0, 255, 0]]   # red, green
    assert raster[1].tolist() == [[0, 0, 255], [255, 255, 255]]  # blue, white
    with pytest.raises(NotImplementedError, match="codec"):
        decode_pixels(_webp_vp8l(4, 4))
    # arithmetic-coded JPEG (SOF10) keeps the honest codec gate; the
    # old header-only baseline stub is now MALFORMED (it has no
    # tables/scan), not gated — fail-loud, never a silently-wrong
    # raster
    with pytest.raises(NotImplementedError, match="codec"):
        decode_pixels(_jpeg(4, 4).replace(b"\xff\xc0", b"\xff\xca"))
    with pytest.raises(ValueError, match="malformed JPEG"):
        decode_pixels(_jpeg(4, 4))


#: Adam7 pass grid (RFC 2083 §2.6) — mirrored in the decoder.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _encode_png(
    raster,
    color_type: int,
    filters,
    palette: bytes | None = None,
    depth: int = 8,
    interlace: int = 0,
) -> bytes:
    """Minimal PNG encoder for the decode tests: applies the requested
    filter type per scanline (the forward transform of RFC 2083 §6,
    with the left neighbor bpp bytes back so 16-bit samples filter
    correctly), optionally splits into the 7 Adam7 passes, deflates,
    and wraps proper CRC'd chunks."""
    import struct
    import zlib

    import numpy as np

    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    dt = np.uint16 if depth == 16 else np.uint8
    arr = np.asarray(raster, dtype=dt)
    h = arr.shape[0]
    arr = arr.reshape(h, -1, nch)
    w = arr.shape[1]
    bpp = nch * (depth // 8)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    def paeth(a, b_, c):
        p = a + b_ - c
        pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
        return a if pa <= pb and pa <= pc else (b_ if pb <= pc else c)

    def row_bytes(pixels) -> list[int]:
        if depth == 16:
            return list(pixels.astype(">u2").tobytes())
        return [int(v) for v in pixels.reshape(-1)]  # Python ints: the
        # filter predictors need unwrapped arithmetic (Paeth p=a+b-c)

    def encode_sub(sub) -> bytearray:
        """Filter one (sub-)image of pixel rows; prev resets per pass."""
        stride = sub.shape[1] * bpp
        out = bytearray()
        prev = [0] * stride
        for y in range(sub.shape[0]):
            f = filters[y % len(filters)]
            row = row_bytes(sub[y])
            out.append(f)
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                up = prev[i]
                ul = prev[i - bpp] if i >= bpp else 0
                pred = {0: 0, 1: a, 2: up, 3: (a + up) >> 1, 4: paeth(a, up, ul)}[f]
                out.append((row[i] - pred) & 0xFF)
            prev = row
        return out

    out = bytearray()
    if interlace:
        for x0, y0, dx, dy in _ADAM7:
            sub = arr[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                out += encode_sub(sub)
    else:
        out = encode_sub(arr)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    body = chunk(b"IHDR", ihdr)
    if palette is not None:
        body += chunk(b"PLTE", palette)
    return (
        b"\x89PNG\r\n\x1a\n" + body
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


def test_decode_pixels_png_all_filters_and_color_types():
    """PNG pixels decode codec-free (stdlib zlib + numpy unfilter):
    every filter type (None/Sub/Up/Average/Paeth) and every 8-bit
    color type round-trips a planted raster exactly."""
    import numpy as np

    from gazelle_plugin_spark.operators.multimodal import decode_pixels

    rng = np.random.RandomState(7)
    # RGBA, one scanline per filter type (h=5 exercises all five)
    rgba = rng.randint(0, 256, (5, 7, 4), dtype=np.uint8)
    got = decode_pixels(_encode_png(rgba, 6, [0, 1, 2, 3, 4]))
    assert got.shape == (5, 7, 4) and (got == rgba).all()
    # grayscale with the left-recurrence filters
    gray = rng.randint(0, 256, (4, 9), dtype=np.uint8)
    got = decode_pixels(_encode_png(gray, 0, [1, 3, 4, 2]))
    assert got.shape == (4, 9) and (got == gray).all()
    # RGB and gray+alpha
    rgb = rng.randint(0, 256, (3, 5, 3), dtype=np.uint8)
    assert (decode_pixels(_encode_png(rgb, 2, [4, 1, 3])) == rgb).all()
    la = rng.randint(0, 256, (2, 6, 2), dtype=np.uint8)
    assert (decode_pixels(_encode_png(la, 4, [2, 1])) == la).all()
    # palette image expands through PLTE to RGB
    pal = bytes(range(48))  # 16 RGB entries
    idx = rng.randint(0, 16, (3, 4), dtype=np.uint8)
    got = decode_pixels(_encode_png(idx, 3, [0, 1, 2], palette=pal))
    expect = np.frombuffer(pal, np.uint8).reshape(-1, 3)[idx]
    assert got.shape == (3, 4, 3) and (got == expect).all()


def test_decode_pixels_netpbm_16bit():
    """P5/P6 with maxval > 255 decode as big-endian 2-byte samples per
    the netpbm spec (previously misread as uint8 — round-9 advice)."""
    import numpy as np

    from gazelle_plugin_spark.operators.multimodal import decode_pixels

    vals = [0, 300, 65535, 1234]
    p5 = b"P5\n2 2\n65535\n" + b"".join(v.to_bytes(2, "big") for v in vals)
    got = decode_pixels(p5)
    assert got.dtype == np.uint16 and got.tolist() == [[0, 300], [65535, 1234]]
    rgb = list(range(0, 1200, 100))  # 2x2x3 samples
    p6 = b"P6\n2 2\n1023\n" + b"".join(v.to_bytes(2, "big") for v in rgb)
    got = decode_pixels(p6)
    assert got.shape == (2, 2, 3) and got.reshape(-1).tolist() == rgb


def _gif_lzw_encode(indices, min_code: int) -> bytes:
    """Reference GIF-LZW encoder for the decode tests (GIF89a appendix
    F semantics: clear/EOI codes, LSB-first variable-width packing,
    width grows when the next assignable code would overflow it)."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code + 1
    bits: list[tuple[int, int]] = [(clear, width)]
    prev = b""
    for px in indices:
        cur = prev + bytes([px])
        if cur in table:
            prev = cur
            continue
        bits.append((table[prev], width))
        if next_code < 4096:
            table[cur] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        prev = bytes([px])
    if prev:
        bits.append((table[prev], width))
    bits.append((eoi, width))
    out = bytearray()
    acc = nbits = 0
    for code, w in bits:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _encode_gif(idx, palette: bytes, min_code: int = 2, interlace: bool = False) -> bytes:
    """Minimal single-frame GIF encoder (global color table) for the
    decode tests."""
    import struct

    import numpy as np

    arr = np.asarray(idx, dtype=np.uint8)
    h, w = arr.shape
    n = max(2, (len(palette) // 3))
    # color table size field: smallest k with 2^(k+1) >= n
    k = max(0, (n - 1).bit_length() - 1)
    table = palette + b"\x00" * (3 * ((2 << k) - len(palette) // 3))
    rows = arr
    if interlace:
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        rows = arr[order]
    lzw = _gif_lzw_encode(rows.reshape(-1).tolist(), min_code)
    sub = b"".join(
        bytes([len(lzw[i : i + 255])]) + lzw[i : i + 255]
        for i in range(0, len(lzw), 255)
    )
    return (
        b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | k, 0, 0) + table
        + b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
        + bytes([0x40 if interlace else 0])
        + bytes([min_code]) + sub + b"\x00" + b"\x3b"
    )


def test_decode_pixels_gif_lzw():
    """GIF pixels decode codec-free (pure-Python LZW): repetitive data
    (dictionary growth + width growth + KwKwK patterns), random data,
    and 4-pass interlacing all round-trip through the palette."""
    import numpy as np

    from gazelle_plugin_spark.operators.multimodal import decode_pixels

    pal = bytes(range(12))  # 4 RGB entries
    # repetitive pattern: exercises dictionary hits and code-width growth
    idx = np.tile(np.array([[0, 0, 1, 1], [2, 2, 3, 3]], np.uint8), (4, 3))
    got = decode_pixels(_encode_gif(idx, pal, min_code=2))
    expect = np.frombuffer(pal, np.uint8).reshape(-1, 3)[idx]
    assert got.shape == (8, 12, 3) and (got == expect).all()
    # random indices over a 16-color palette
    rng = np.random.RandomState(11)
    pal16 = bytes(rng.randint(0, 256, 48, dtype=np.uint8))
    idx = rng.randint(0, 16, (9, 7), dtype=np.uint8)
    got = decode_pixels(_encode_gif(idx, pal16, min_code=4))
    assert (got == np.frombuffer(pal16, np.uint8).reshape(-1, 3)[idx]).all()
    # interlaced variant restores scanline order
    got = decode_pixels(_encode_gif(idx, pal16, min_code=4, interlace=True))
    assert (got == np.frombuffer(pal16, np.uint8).reshape(-1, 3)[idx]).all()


def test_decode_pixels_gif_padding_after_eoi():
    """Bytes after the EOI code (legal sub-block padding) must be
    ignored, not decoded as further LZW codes — the decoder stops
    consuming the byte stream entirely at EOI (advisory r10 item)."""
    import numpy as np

    from gazelle_plugin_spark.operators.multimodal import decode_pixels

    pal = bytes(range(12))
    idx = np.tile(np.array([[0, 1], [2, 3]], np.uint8), (3, 4))
    blob = _encode_gif(idx, pal, min_code=2)
    # splice an extra data sub-block of junk between the final LZW
    # sub-block and the 0x00 terminator: 0xFF bytes are NOT valid
    # codes for the tiny post-EOI table, so decoding them would raise
    assert blob.endswith(b"\x00\x3b")
    padded = blob[:-2] + bytes([4]) + b"\xff\xff\xff\xff" + b"\x00\x3b"
    got = decode_pixels(padded)
    assert (got == np.frombuffer(pal, np.uint8).reshape(-1, 3)[idx]).all()


def test_decode_pixels_png_16bit():
    """16-bit PNGs round-trip exactly: samples are big-endian byte
    PAIRS on the wire, and the filter left-neighbor is bpp=2*nch bytes
    back — an 8-bit-offset bug would corrupt every Sub/Paeth row."""
    import numpy as np

    from gazelle_plugin_spark.operators.multimodal import decode_pixels

    rng = np.random.RandomState(5)
    gray = rng.randint(0, 65536, (7, 5), np.uint16)
    got = decode_pixels(_encode_png(gray, 0, [0, 1, 2, 3, 4], depth=16))
    assert got.dtype == np.uint16 and got.shape == (7, 5) and (got == gray).all()
    rgb = rng.randint(0, 65536, (6, 4, 3), np.uint16)
    got = decode_pixels(_encode_png(rgb, 2, [4, 1, 3, 2], depth=16))
    assert got.shape == (6, 4, 3) and (got == rgb).all()
    rgba = rng.randint(0, 65536, (3, 8, 4), np.uint16)
    assert (decode_pixels(_encode_png(rgba, 6, [1, 4], depth=16)) == rgba).all()


def test_decode_pixels_png_adam7():
    """Adam7-interlaced PNGs reassemble the original raster: each of
    the 7 passes is an independently filtered sub-image (odd dimensions
    exercise partial and empty passes)."""
    import numpy as np

    from gazelle_plugin_spark.operators.multimodal import decode_pixels

    rng = np.random.RandomState(9)
    for shape, ctype in (((13, 11, 4), 6), ((9, 7, 3), 2), ((5, 3), 0)):
        img = rng.randint(0, 256, shape, np.uint8)
        got = decode_pixels(_encode_png(img, ctype, [0, 1, 2, 3, 4], interlace=1))
        assert (got == img).all(), (shape, ctype)
    # tiny images leave some passes empty entirely
    img = rng.randint(0, 256, (1, 1, 3), np.uint8)
    assert (decode_pixels(_encode_png(img, 2, [4], interlace=1)) == img).all()
    # 16-bit + Adam7 compose
    img16 = rng.randint(0, 65536, (10, 6), np.uint16)
    got = decode_pixels(_encode_png(img16, 0, [3, 4, 1], depth=16, interlace=1))
    assert got.dtype == np.uint16 and (got == img16).all()


def test_decode_pixels_png_unsupported_shapes_fail_loud():
    """Sub-byte depths raise NotImplementedError (not a silently-wrong
    raster); truncated streams raise ValueError."""
    import struct
    import zlib

    import numpy as np

    from gazelle_plugin_spark.operators.multimodal import decode_pixels

    base = _encode_png(np.zeros((2, 2), np.uint8), 0, [0])

    def with_ihdr(depth: int, interlace: int) -> bytes:
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, 0, 0, 0, interlace)
        chunk = struct.pack(">I", 13) + b"IHDR" + ihdr + struct.pack(
            ">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
        )
        return base[:8] + chunk + base[8 + 25:]

    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_pixels(with_ihdr(4, 0))
    with pytest.raises(ValueError, match="malformed PNG"):
        decode_pixels(_png(4, 4))  # header-only stream, no IDAT


# ---------------------------------------------------------------------------
# baseline JPEG: minimal test-side encoder (quality-0 style: all-ones
# quant scaled by qscale, fixed-length canonical Huffman tables — DC
# 12 symbols @ 4 bits, AC 162 symbols @ 8 bits) + decoder round trips
# ---------------------------------------------------------------------------

#: AC symbols in canonical order; code == index, all 8 bits long.
_AC_SYMS = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
_AC_CODE = {sym: i for i, sym in enumerate(_AC_SYMS)}


def _jpeg_dct_basis():
    u = np.arange(8)
    A = 0.5 * np.cos((2 * u[None, :] + 1) * u[:, None] * np.pi / 16)
    A[0] /= np.sqrt(2.0)
    return A


class _BitWriter:
    def __init__(self):
        self.buf, self.acc, self.nb = bytearray(), 0, 0

    def put(self, val: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.nb += 1
            if self.nb == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:  # byte-stuff per T.81 B.1.1.5
                    self.buf.append(0x00)
                self.acc, self.nb = 0, 0

    def flush(self) -> None:  # pad the last byte with 1-bits
        while self.nb:
            self.put(1, 1)


def _encode_jpeg(y, cb=None, cr=None, sampling=(1, 1), dri=0, qscale=1):
    """Minimal baseline-JPEG encoder (test oracle for _jpeg_pixels):
    luma sampling = ``sampling``, chroma always 1x1; full-size cb/cr
    planes are subsampled by top-left pick (exact when the caller keeps
    chroma constant per sampling window)."""
    import struct

    from gazelle_plugin_spark.operators.multimodal import _JPEG_ZZ

    A = _jpeg_dct_basis()
    zz = list(_JPEG_ZZ)
    h, w = y.shape
    hy, vy = sampling
    mcux, mcuy = -(-w // (8 * hy)), -(-h // (8 * vy))

    def pad(plane, bh, bw):
        return np.pad(
            plane.astype(np.float64),
            ((0, bh * 8 - plane.shape[0]), (0, bw * 8 - plane.shape[1])),
            mode="edge",
        )

    comps = [(1, hy, vy, pad(y, mcuy * vy, mcux * hy))]
    if cb is not None:
        comps.append((2, 1, 1, pad(cb[::vy, ::hy], mcuy, mcux)))
        comps.append((3, 1, 1, pad(cr[::vy, ::hy], mcuy, mcux)))

    bw_ = _BitWriter()
    pred = [0] * len(comps)
    rst = 0
    for mcu in range(mcux * mcuy):
        if dri and mcu and mcu % dri == 0:
            bw_.flush()
            bw_.buf += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            pred = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, (_cid, hs, vs, plane) in enumerate(comps):
            for by in range(vs):
                for bx in range(hs):
                    blk = plane[
                        (my * vs + by) * 8 : (my * vs + by) * 8 + 8,
                        (mx * hs + bx) * 8 : (mx * hs + bx) * 8 + 8,
                    ]
                    F_ = np.rint(np.rint(A @ (blk - 128.0) @ A.T) / qscale)
                    vec = F_.reshape(-1)[zz].astype(int)
                    diff = int(vec[0]) - pred[ci]
                    pred[ci] = int(vec[0])
                    s = abs(diff).bit_length()
                    bw_.put(s, 4)  # DC code == symbol == size
                    if s:
                        bw_.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
                    run = 0
                    for k in range(1, 64):
                        v = int(vec[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            bw_.put(_AC_CODE[0xF0], 8)
                            run -= 16
                        s2 = abs(v).bit_length()
                        bw_.put(_AC_CODE[(run << 4) | s2], 8)
                        bw_.put(v if v >= 0 else v + (1 << s2) - 1, s2)
                        run = 0
                    if run:
                        bw_.put(_AC_CODE[0x00], 8)
    bw_.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    dc_counts = bytes([0, 0, 0, 12] + [0] * 12)
    ac_counts = bytes([0] * 7 + [162] + [0] * 8)
    dht = (
        b"\x00" + dc_counts + bytes(range(12))
        + b"\x10" + ac_counts + bytes(_AC_SYMS)
    )
    sof = b"\x08" + struct.pack(">HH", h, w) + bytes([len(comps)])
    sos = bytes([len(comps)])
    for cid, hs, vs, _plane in comps:
        sof += bytes([cid, (hs << 4) | vs, 0])
        sos += bytes([cid, 0x00])
    sos += b"\x00\x3f\x00"  # Ss / Se / AhAl (baseline fixed)
    out = b"\xff\xd8" + seg(0xDB, b"\x00" + bytes([qscale] * 64)) + seg(0xC4, dht)
    out += seg(0xC0, sof)
    if dri:
        out += seg(0xDD, dri.to_bytes(2, "big"))
    out += seg(0xDA, sos) + bytes(bw_.buf) + b"\xff\xd9"
    return out


def test_decode_pixels_jpeg_grayscale_roundtrip():
    """Constant DC-only block decodes EXACTLY (incl. a non-1 quant
    scale); random gray with unit quant round-trips within DCT
    rounding error; odd dimensions crop the MCU padding."""
    from gazelle_plugin_spark.operators.multimodal import decode_pixels

    flat = np.full((8, 8), 130, np.uint8)
    assert (decode_pixels(_encode_jpeg(flat)) == flat).all()
    assert (decode_pixels(_encode_jpeg(flat, qscale=4)) == flat).all()

    rng = np.random.RandomState(7)
    gray = rng.randint(0, 256, (24, 17), dtype=np.uint8)
    got = decode_pixels(_encode_jpeg(gray))
    assert got.shape == (24, 17)
    assert np.abs(got.astype(int) - gray.astype(int)).max() <= 2


def test_decode_pixels_jpeg_color_sampling_and_restarts():
    """3-component YCbCr decodes through 4:4:4, 4:2:2 and 4:2:0
    sampling (constant chroma -> replication upsample is exact) and
    restart markers (DRI=1) reproduce the no-restart raster bit-for-
    bit."""
    from gazelle_plugin_spark.operators.multimodal import decode_pixels

    rng = np.random.RandomState(11)
    h, w = 18, 21  # non-multiple of every MCU size
    y = rng.randint(0, 256, (h, w), dtype=np.uint8)
    cb = np.full((h, w), 90, np.uint8)
    cr = np.full((h, w), 170, np.uint8)

    yf = y.astype(float)
    exp = np.stack(
        [
            yf + 1.402 * (170 - 128.0),
            yf - 0.344136 * (90 - 128.0) - 0.714136 * (170 - 128.0),
            yf + 1.772 * (90 - 128.0),
        ],
        axis=-1,
    )
    exp = np.clip(np.round(exp), 0, 255)

    for sampling in [(1, 1), (2, 1), (2, 2)]:
        got = decode_pixels(_encode_jpeg(y, cb, cr, sampling=sampling))
        assert got.shape == (h, w, 3), sampling
        assert np.abs(got.astype(float) - exp).max() <= 4, sampling

    plain = decode_pixels(_encode_jpeg(y, cb, cr, sampling=(2, 2)))
    restarts = decode_pixels(_encode_jpeg(y, cb, cr, sampling=(2, 2), dri=1))
    assert (plain == restarts).all()


def _jpeg_seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _jpeg_tables_prelude(ncomp: int, sof_marker: int, h: int, w: int, sampling) -> bytes:
    """SOI + all-ones DQT + the fixed-length DHT pair + SOFn for the
    test encoders (components: 1=luma at ``sampling``, chroma 1x1)."""
    import struct

    hy, vy = sampling
    dc_counts = bytes([0, 0, 0, 12] + [0] * 12)
    ac_counts = bytes([0] * 7 + [162] + [0] * 8)
    dht = (
        b"\x00" + dc_counts + bytes(range(12))
        + b"\x10" + ac_counts + bytes(_AC_SYMS)
    )
    sof = b"\x08" + struct.pack(">HH", h, w) + bytes([ncomp])
    for cid in range(1, ncomp + 1):
        hs, vs = (hy, vy) if cid == 1 else (1, 1)
        sof += bytes([cid, (hs << 4) | vs, 0])
    return (
        b"\xff\xd8"
        + _jpeg_seg(0xDB, b"\x00" + bytes([1] * 64))
        + _jpeg_seg(0xC4, dht)
        + _jpeg_seg(sof_marker, sof)
    )


def _encode_jpeg_progressive(y, cb=None, cr=None, sampling=(1, 1)):
    """Spectral-selection-only progressive encoder (test oracle): one
    interleaved DC scan (Ss=0, Se=0) then one full-band AC scan per
    component (Ss=1, Se=63), no successive approximation. Coefficients
    are identical to _encode_jpeg's, so the decoded raster must match
    the baseline encoding bit-for-bit."""
    from gazelle_plugin_spark.operators.multimodal import _JPEG_ZZ

    A = _jpeg_dct_basis()
    zz = list(_JPEG_ZZ)
    h, w = y.shape
    hy, vy = sampling
    mcux, mcuy = -(-w // (8 * hy)), -(-h // (8 * vy))

    def pad(plane, bh, bw):
        return np.pad(
            plane.astype(np.float64),
            ((0, bh * 8 - plane.shape[0]), (0, bw * 8 - plane.shape[1])),
            mode="edge",
        )

    comps = [(1, hy, vy, pad(y, mcuy * vy, mcux * hy))]
    if cb is not None:
        comps.append((2, 1, 1, pad(cb[::vy, ::hy], mcuy, mcux)))
        comps.append((3, 1, 1, pad(cr[::vy, ::hy], mcuy, mcux)))

    coefs = []
    for _cid, _hs, _vs, plane in comps:
        nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
        arr = np.zeros((nby, nbx, 64), np.int64)
        for rr in range(nby):
            for cc in range(nbx):
                blk = plane[rr * 8 : rr * 8 + 8, cc * 8 : cc * 8 + 8]
                arr[rr, cc] = np.rint(A @ (blk - 128.0) @ A.T).reshape(-1)[zz]
        coefs.append(arr)

    # interleaved DC scan
    bw_ = _BitWriter()
    pred = [0] * len(comps)
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci, (_cid, hs, vs, _p) in enumerate(comps):
            for by in range(vs):
                for bx in range(hs):
                    dc = int(coefs[ci][my * vs + by, mx * hs + bx, 0])
                    diff, pred[ci] = dc - pred[ci], dc
                    s = abs(diff).bit_length()
                    bw_.put(s, 4)
                    if s:
                        bw_.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    bw_.flush()
    sos_dc = bytes([len(comps)])
    for cid, _hs, _vs, _p in comps:
        sos_dc += bytes([cid, 0x00])
    sos_dc += bytes([0, 0, 0])
    out = _jpeg_tables_prelude(len(comps), 0xC2, h, w, sampling)
    out += _jpeg_seg(0xDA, sos_dc) + bytes(bw_.buf)

    # one full-band AC scan per component, over its own ceil-block grid
    for ci, (cid, hs, vs, _p) in enumerate(comps):
        cw, ch = -(-(w * hs) // hy), -(-(h * vs) // vy)
        cbx, cby = -(-cw // 8), -(-ch // 8)
        bw_ = _BitWriter()
        for idx in range(cbx * cby):
            rr, cc = divmod(idx, cbx)
            vec = coefs[ci][rr, cc]
            run = 0
            for k in range(1, 64):
                v = int(vec[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    bw_.put(_AC_CODE[0xF0], 8)
                    run -= 16
                s2 = abs(v).bit_length()
                bw_.put(_AC_CODE[(run << 4) | s2], 8)
                bw_.put(v if v >= 0 else v + (1 << s2) - 1, s2)
                run = 0
            if run:
                bw_.put(_AC_CODE[0x00], 8)  # EOB == EOBn run of 1
        bw_.flush()
        out += _jpeg_seg(0xDA, bytes([1, cid, 0x00, 1, 63, 0])) + bytes(bw_.buf)
    return out + b"\xff\xd9"


def test_decode_pixels_jpeg_progressive_spectral_matches_baseline():
    """A spectral-selection progressive stream carrying the SAME
    coefficients as the baseline encoding must decode to the identical
    raster — gray and 4:2:0 color, odd dimensions."""
    from gazelle_plugin_spark.operators.multimodal import decode_pixels

    rng = np.random.RandomState(23)
    gray = rng.randint(0, 256, (19, 13), dtype=np.uint8)
    assert (
        decode_pixels(_encode_jpeg_progressive(gray))
        == decode_pixels(_encode_jpeg(gray))
    ).all()

    y = rng.randint(0, 256, (18, 21), dtype=np.uint8)
    cb = np.full((18, 21), 77, np.uint8)
    cr = np.full((18, 21), 150, np.uint8)
    assert (
        decode_pixels(_encode_jpeg_progressive(y, cb, cr, sampling=(2, 2)))
        == decode_pixels(_encode_jpeg(y, cb, cr, sampling=(2, 2)))
    ).all()


def test_decode_pixels_jpeg_sequential_multiscan():
    """SEQUENTIAL multi-scan (SOF0 + one full-band scan per component,
    T.81 allows it and some encoders emit it) decodes identically to
    the interleaved baseline stream with the same coefficients."""
    from gazelle_plugin_spark.operators.multimodal import decode_pixels

    rng = np.random.RandomState(31)
    y = rng.randint(0, 256, (10, 12), dtype=np.uint8)
    cb = np.full((10, 12), 120, np.uint8)
    cr = np.full((10, 12), 135, np.uint8)
    # reuse the progressive encoder's scan layout but emit SOF0 and
    # full-band (Ss=0..63) single-component scans: splice DC+AC scans
    # into per-component sequential scans by re-encoding
    blob = _encode_jpeg_progressive(y, cb, cr, sampling=(1, 1))
    # progressive blob: DC scan covers Ss=0..0; the per-component AC
    # scans cover 1..63 — retag SOF2 as SOF0 to assert the decoder
    # treats multi-scan SEQUENTIAL frames through the same path
    seq = blob.replace(b"\xff\xc2", b"\xff\xc0", 1)
    assert (
        decode_pixels(seq)
        == decode_pixels(_encode_jpeg(y, cb, cr, sampling=(1, 1)))
    ).all()


def test_decode_pixels_jpeg_progressive_successive_approximation():
    """Hand-built 4-scan successive-approximation stream over ONE 8x8
    gray block: DC first at Al=1, AC first at Al=1 (point-transformed
    values), DC refinement, AC refinement (correction bit for the
    existing coefficient + a newly-nonzero +-1 insertion + EOB).
    Final coefficients: DC=16, zigzag-1 = 5, zigzag-2 = 1."""
    from gazelle_plugin_spark.operators.multimodal import _JPEG_ZZ, decode_pixels

    out = _jpeg_tables_prelude(1, 0xC2, 8, 8, (1, 1))

    # scan 1: DC first pass, Al=1 — sends 16 >> 1 = 8 (size 4)
    bw_ = _BitWriter()
    bw_.put(4, 4)
    bw_.put(8, 4)
    bw_.flush()
    out += _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01])) + bytes(bw_.buf)

    # scan 2: AC first pass band 1..63, Al=1 — 5 -> trunc(5/2)=2
    # (r=0, s=2, bits '10'), 1 -> trunc(1/2)=0 (absent), then EOB
    bw_ = _BitWriter()
    bw_.put(_AC_CODE[0x02], 8)
    bw_.put(2, 2)
    bw_.put(_AC_CODE[0x00], 8)
    bw_.flush()
    out += _jpeg_seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01])) + bytes(bw_.buf)

    # scan 3: DC refinement Ah=1 -> Al=0 — low bit of 16 is 0
    bw_ = _BitWriter()
    bw_.put(0, 1)
    bw_.flush()
    out += _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10])) + bytes(bw_.buf)

    # scan 4: AC refinement Ah=1 -> Al=0 — new coefficient at zigzag-2
    # (rs=0x01, sign bit 1 = +1), correction bit 1 for zigzag-1
    # (2<<1=4 -> 5), then EOB covering the rest of the band
    bw_ = _BitWriter()
    bw_.put(_AC_CODE[0x01], 8)
    bw_.put(1, 1)  # sign: +1
    bw_.put(1, 1)  # correction bit for the existing zigzag-1 coefficient
    bw_.put(_AC_CODE[0x00], 8)
    bw_.flush()
    out += _jpeg_seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10])) + bytes(bw_.buf)
    out += b"\xff\xd9"

    got = decode_pixels(out)

    A = _jpeg_dct_basis()
    nat = np.zeros(64)
    nat[_JPEG_ZZ[0]], nat[_JPEG_ZZ[1]], nat[_JPEG_ZZ[2]] = 16, 5, 1
    exp = np.clip(np.round(A.T @ nat.reshape(8, 8) @ A + 128.0), 0, 255)
    assert (got == exp.astype(np.uint8)).all()


@pytest.mark.parametrize("dims", [(1, 1), (3, 5), (7, 24), (40, 1), (9, 9)])
def test_decode_pixels_jpeg_edge_dimensions(dims):
    """Every (dims x sampling) combination round-trips: tiny images,
    single-row/column, MCU-straddling odd sizes. Gray error bounded by
    DCT rounding (<=2); progressive equals baseline bit-for-bit."""
    from gazelle_plugin_spark.operators.multimodal import decode_pixels

    h, w = dims
    rng = np.random.RandomState(h * 41 + w)
    y = rng.randint(0, 256, (h, w), dtype=np.uint8)
    cb = np.full((h, w), 100, np.uint8)
    cr = np.full((h, w), 140, np.uint8)
    g = decode_pixels(_encode_jpeg(y))
    assert g.shape == (h, w)
    assert np.abs(g.astype(int) - y.astype(int)).max() <= 2
    for sampling in [(1, 1), (2, 2), (2, 1), (1, 2)]:
        c = decode_pixels(_encode_jpeg(y, cb, cr, sampling=sampling))
        assert c.shape == (h, w, 3), sampling
        p = decode_pixels(_encode_jpeg_progressive(y, cb, cr, sampling=sampling))
        assert (p == c).all(), sampling


def test_decode_pixels_jpeg_truncated_fails_loud():
    """A scan cut mid-MCU raises ValueError, never returns a partial
    raster."""
    from gazelle_plugin_spark.operators.multimodal import decode_pixels

    rng = np.random.RandomState(3)
    blob = _encode_jpeg(rng.randint(0, 256, (16, 16), dtype=np.uint8))
    with pytest.raises(ValueError, match="malformed JPEG"):
        decode_pixels(blob[: len(blob) - 40])


def test_byte_features_chunked_matches_unchunked(docs):
    """A tiny chunk bound (forcing one-blob groups) must produce
    byte-identical features to the one-shot path — the memory bound
    changes scratch layout only, never results."""
    base = attach_blob(docs)
    one = {r.doc_id: r for r in extract_byte_features(base).collect()}
    chunked = {
        r.doc_id: r
        for r in extract_byte_features(base, chunk_bytes=8).collect()
    }
    assert set(one) == set(chunked)
    for k in one:
        assert (one[k].n_bytes, one[k].mean_byte, one[k].n_distinct_bytes,
                one[k].head_byte) == (
            chunked[k].n_bytes, chunked[k].mean_byte,
            chunked[k].n_distinct_bytes, chunked[k].head_byte)


def test_sample_frames_explodes(docs):
    d = attach_blob(docs)
    out = sample_frames(d, every_n=100)
    rows = out.select("doc_id", "frame_offset", "frame_chunk").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for row in docs.select("doc_id", "text").collect():
        n_frames = len(range(0, len(row.text.encode()), 100))
        assert len(by_doc[row.doc_id]) == n_frames
        first = min(by_doc[row.doc_id], key=lambda r: r.frame_offset)
        assert bytes(first.frame_chunk) == row.text.encode()[:16]


def test_sample_frames_empty_blob_yields_no_frames(spark):
    """A zero-length blob must produce ZERO frame rows (the sequence
    lower bound would otherwise emit a phantom frame at offset 0 —
    breaking parity with the generate_series oracle)."""
    d = spark.createDataFrame([(1, "abc"), (2, "")], "doc_id long, text string")
    out = sample_frames(attach_blob(d), every_n=2)
    got = {(r.doc_id, r.frame_offset) for r in out.collect()}
    assert got == {(1, 0), (1, 2)}


def test_encode_png_gray16_roundtrip_adam7():
    """The package's planted-fixture encoder (16-bit grayscale, Adam7,
    all five filters) round-trips through decode_pixels exactly — the
    unit-level twin of the driver query mm_png_pixel_stats."""
    from gazelle_plugin_spark.operators.multimodal import (
        decode_pixels,
        encode_png_gray16,
    )

    rng = np.random.default_rng(7)
    for h, w in ((7, 9), (1, 1), (8, 8), (3, 16)):
        raster = rng.integers(0, 65536, (h, w)).astype(np.uint16)
        for interlace in (0, 1):
            got = decode_pixels(encode_png_gray16(raster, interlace=interlace))
            assert got.dtype == np.uint16 and got.shape == (h, w)
            assert (got == raster).all(), (h, w, interlace)


def test_mm_png_pixel_stats_matches_formula(spark):
    """The driver query's decoded pixel stats equal the arithmetic
    formula the DuckDB oracle uses — computed here independently in
    numpy (decode errors in 16-bit/filters/Adam7 would shift px_sum)."""
    from gazelle_plugin_spark.plans import QUERIES
    from gazelle_plugin_spark.plans.multimodal import PNG_DOCS, PNG_H, PNG_W

    rows = {r["doc_id"]: r for r in QUERIES["mm_png_pixel_stats"](spark, SF_SMALL).collect()}
    assert len(rows) == PNG_DOCS
    y, x = np.mgrid[0:PNG_H, 0:PNG_W]
    for d in range(PNG_DOCS):
        v = (9001 * d + 257 * x + 263 * y) % 65536
        r = rows[d]
        assert r["n_px"] == PNG_W * PNG_H
        assert r["px_sum"] == int(v.sum())
        assert r["px_min"] == int(v.min())
        assert r["px_max"] == int(v.max())
    # 16-bit depth is load-bearing: every blob must contain samples > 255
    assert all(r["px_max"] > 255 for r in rows.values())
