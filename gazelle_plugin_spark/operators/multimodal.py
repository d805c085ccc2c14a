"""Multimodal (image/audio/video) column plumbing.

Media assets are opaque ``binary`` columns plus a typed metadata
struct; decode/feature-extract/resize run as Arrow-batched
``mapInPandas`` pipelines (the ColumnarArrowEvalPythonExec analog —
batches cross to Python once, vectorized inside). Codec-free formats
(BMP, netpbm P5/P6) DECODE NATIVELY from their headers; formats that
need a codec library the container lacks (PNG/JPEG/GIF/WEBP) raise a
clearly-marked NotImplementedError at the blob grain. The Spark-side
contract (schemas, batching, partitioning) is real and tested
(tests/test_multimodal.py).

Scale notes (100 TB of media): blobs should live in the lake as
(metadata parquet + object-store URIs or inline binary <= a few MB);
feature extraction is embarrassingly parallel per batch — size
partitions by bytes (maxPartitionBytes), never collect blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Feature schema produced by extract_byte_features.
BYTE_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("n_distinct_bytes", IntegerType()),
        StructField("head_byte", IntegerType()),
    ]
)


def attach_blob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate an ingested media column: utf-8 bytes of ``text_col``
    as the opaque blob + a typed metadata struct (every real media
    table carries one)."""
    blob = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("application/octet-stream").alias("mime"),
        F.length(blob).alias("n_bytes"),
        F.md5(blob).alias("checksum"),
    )
    return df.withColumn("blob", blob).withColumn("media_meta", meta)


def extract_byte_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over the blob column: byte
    statistics computed vectorized in numpy over the WHOLE batch —
    all blobs concatenate into one uint8 view and per-blob stats fall
    out of offset arithmetic (segment sums via cumsum, head bytes via
    start-index gather, distinct counts via an n x 256 presence
    matrix). No per-row Python inside the batch: the mapInPandas
    boundary buys one Arrow crossing, and the body keeps the
    vectorization it paid for (the ColumnarArrowEvalPythonExec
    analog). Swap the body for an image/audio featurizer when codecs
    are available."""
    import numpy as np

    names = [f.name for f in BYTE_FEATURES_SCHEMA.fields]

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            col = list(pdf["blob"])
            n = len(col)
            if n == 0:
                yield pd.DataFrame({k: [] for k in names})
                continue
            lengths = np.fromiter(map(len, col), dtype=np.int64, count=n)
            buf = np.frombuffer(b"".join(col), dtype=np.uint8)
            ends = np.cumsum(lengths)
            starts = ends - lengths
            csum = np.concatenate(([0], np.cumsum(buf, dtype=np.int64)))
            sums = csum[ends] - csum[starts]
            mean = np.where(lengths > 0, sums / np.maximum(lengths, 1), 0.0)
            if buf.size:
                head_at = buf[np.minimum(starts, buf.size - 1)].astype(np.int32)
                head = np.where(lengths > 0, head_at, np.int32(-1))
                presence = np.zeros((n, 256), dtype=bool)
                presence[np.repeat(np.arange(n), lengths), buf] = True
                distinct = presence.sum(axis=1).astype(np.int32)
            else:
                head = np.full(n, -1, dtype=np.int32)
                distinct = np.zeros(n, dtype=np.int32)
            yield pd.DataFrame(
                {
                    names[0]: pdf[id_col].to_numpy(),
                    names[1]: lengths,
                    names[2]: mean,
                    names[3]: distinct,
                    names[4]: head,
                }
            )

    return df.select(id_col, "blob").mapInPandas(featurize, BYTE_FEATURES_SCHEMA)


#: Output schema of decode_image.
IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mode", StringType()),
    ]
)

#: Magic prefixes whose decode requires a real codec library.
_CODEC_MAGICS = {
    b"\x89PNG": "PNG",
    b"\xff\xd8": "JPEG",
    b"GIF8": "GIF",
    b"RIFF": "WEBP/RIFF",
}

_BMP_MODES = {1: "P", 4: "P", 8: "P", 16: "RGB", 24: "RGB", 32: "RGBA"}


def _ppm_header(b: bytes) -> tuple[int, int]:
    """Parse the ASCII (width, height) of a P5/P6 netpbm header,
    skipping '#' comment lines per the spec."""
    i, vals = 2, []
    while len(vals) < 2 and i < min(len(b), 512):
        c = b[i : i + 1]
        if c == b"#":
            while i < len(b) and b[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < len(b) and b[j : j + 1].isdigit():
                j += 1
            vals.append(int(b[i:j]))
            i = j
        else:
            raise ValueError("malformed netpbm header")
    if len(vals) < 2:
        raise ValueError("truncated netpbm header")
    return vals[0], vals[1]


def decode_header(b: bytes) -> tuple[str, int | None, int | None, str | None]:
    """Decode one image blob's (format, width, height, mode) from its
    header alone — O(header bytes), codec-free for BMP (little-endian
    BITMAPINFOHEADER fields) and netpbm P5/P6 (ASCII header). Formats
    that need a real codec (PNG/JPEG/GIF/WEBP) raise the documented
    NotImplementedError; unrecognized blobs come back as 'unknown'."""
    import struct

    for magic, fmt in _CODEC_MAGICS.items():
        if b.startswith(magic):
            raise NotImplementedError(
                f"decode_image: {fmt} needs a codec library; this "
                "environment ships none (BMP and netpbm decode natively)"
            )
    if b.startswith(b"BM") and len(b) >= 30:
        width, height = struct.unpack_from("<ii", b, 18)
        bpp = struct.unpack_from("<H", b, 28)[0]
        # negative height = top-down row order, same raster dimensions
        return "BMP", width, abs(height), _BMP_MODES.get(bpp, "P")
    if b[:2] in (b"P5", b"P6") and len(b) > 2 and b[2:3].isspace():
        w, h = _ppm_header(b)
        return "PPM", w, h, "L" if b[:2] == b"P5" else "RGB"
    return "unknown", None, None, None


def decode_image(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob") -> DataFrame:
    """Decode image blobs to (format, width, height, mode) metadata
    via Arrow-batched mapInPandas — the decode stage of the multimodal
    pipeline. BMP and netpbm (P5/P6) decode natively from their
    headers (no codec library needed; O(header) per blob, not
    O(bytes)); codec-requiring formats raise the documented
    NotImplementedError. tests/test_multimodal.py feeds generated BMP
    and PPM fixtures through this end-to-end."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = [f.name for f in IMAGE_META_SCHEMA.fields]
        for pdf in batches:
            metas = [decode_header(bytes(b)) for b in pdf[blob_col]]
            out = pd.DataFrame(metas, columns=names[1:])
            out.insert(0, names[0], pdf[id_col].to_numpy())
            yield out

    return df.select(id_col, blob_col).mapInPandas(decode, IMAGE_META_SCHEMA)


def sample_frames(df: DataFrame, blob_col: str = "blob", every_n: int = 1000) -> DataFrame:
    """Deterministic fake of video frame sampling: take every
    ``every_n``-th byte of the blob as a 'frame' marker — exercises
    the exploding (1 blob -> N rows) pipeline shape that real frame
    extraction has, without a video codec. A zero-length blob yields
    zero frames (the sequence lower bound would otherwise emit one
    phantom frame at offset 0)."""
    frames = F.expr(
        f"case when length({blob_col}) > 0 then "
        f"transform(sequence(0, cast(length({blob_col}) as int) - 1, {every_n}),"
        f" i -> struct(i as frame_offset, substr({blob_col}, i + 1, 16) as frame_chunk))"
        f" else array() end"
    )
    return (
        df.withColumn("frame", F.explode(frames))
        .select("*", "frame.frame_offset", "frame.frame_chunk")
        .drop("frame")
    )
