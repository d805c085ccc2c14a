"""Multimodal (image/audio/video) column plumbing.

Media assets are opaque ``binary`` columns plus a typed metadata
struct; decode/feature-extract/resize run as Arrow-batched
``mapInPandas`` pipelines (the ColumnarArrowEvalPythonExec analog —
batches cross to Python once, vectorized inside). The container has
no image/audio codecs, so the actual decode is gated behind an
import-try and raises a clearly-marked NotImplementedError — the
Spark-side contract (schemas, batching, partitioning) is real and
tested (tests/test_multimodal.py).

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
    statistics computed vectorized in numpy per batch. This is the
    real multimodal pipeline shape — swap the body for an image/audio
    featurizer when codecs are available."""
    import numpy as np

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf["blob"]):
                arr = np.frombuffer(blob, dtype=np.uint8)
                rows.append(
                    (
                        int(doc_id),
                        int(arr.size),
                        float(arr.mean()) if arr.size else 0.0,
                        int(np.unique(arr).size),
                        int(arr[0]) if arr.size else -1,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in BYTE_FEATURES_SCHEMA.fields]
            )

    return df.select(id_col, "blob").mapInPandas(featurize, BYTE_FEATURES_SCHEMA)


def decode_image(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Decode image blobs to (width, height, mode) metadata.

    STUB: requires an image codec (PIL). The container ships none, so
    this raises NotImplementedError at plan time; the signature and
    output schema are the contract a codec-enabled deployment fills in
    with a mapInPandas body like extract_byte_features."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "decode_image needs an image codec (PIL/pillow) which this "
            "environment does not provide; the Spark-side contract is "
            "extract_byte_features-shaped mapInPandas over the blob column"
        ) from exc
    raise NotImplementedError("codec present but decoder body not implemented")


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
