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


def test_decode_image_codec_formats_still_gated(spark):
    """PNG/JPEG (codec-requiring) keep the documented
    NotImplementedError — now at the per-blob grain."""
    from gazelle_plugin_spark.operators.multimodal import decode_header

    with pytest.raises(NotImplementedError, match="codec"):
        decode_header(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError, match="codec"):
        decode_header(b"\xff\xd8\xff\xe0....")


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
