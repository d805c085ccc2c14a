"""Multimodal pipeline queries over synthesized binary columns.

The testdata has no real media table, so blobs are synthesized from
``documents.text`` (utf-8 bytes) via operators.multimodal.attach_blob
— the pipeline shapes (binary columns + typed metadata, mapInPandas
feature extraction, frame-sample explosion) are the real thing; only
the codec is fake. See operators/multimodal.py for the decode stub
contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gazelle_plugin_spark.operators.multimodal import (
    attach_blob,
    extract_byte_features,
    sample_frames,
)
from gazelle_plugin_spark.plans import query
from gazelle_plugin_spark.plans._util import t


@query(
    "mm_blob_stats",
    oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_checksums,
       CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
FROM documents
GROUP BY source ORDER BY source
""",
)
def mm_blob_stats(spark, sf_dir):
    """Opaque-binary column statistics: byte sizes + checksum
    cardinality per source — metadata-level media accounting, all
    JVM-side (binary length/md5 are built-ins)."""
    d = attach_blob(t(spark, sf_dir, "documents"))
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("media_meta.n_bytes").cast("long")).alias("total_bytes"),
            F.countDistinct("media_meta.checksum").alias("n_checksums"),
            F.max(F.col("media_meta.n_bytes").cast("long")).alias("max_bytes"),
        )
        .orderBy("source")
    )


@query(
    "mm_frame_sample",
    oracle="""
SELECT doc_id, CAST(i.i AS BIGINT) AS frame_offset,
       substring(text, CAST(i.i AS INT) + 1, 16) AS chunk
FROM documents,
     UNNEST(generate_series(0, octet_length(encode(text)) - 1, 100)) AS i(i)
WHERE doc_id < 20
ORDER BY doc_id, frame_offset
""",
)
def mm_frame_sample(spark, sf_dir):
    """Frame-sampling pipeline shape: 1 blob -> N frame rows (every
    100th byte offset + a 16-byte chunk). Real video sampling swaps
    the chunk expression for a codec call; the explode/partitioning
    behavior is identical."""
    d = attach_blob(t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20))
    out = sample_frames(d, every_n=100)
    return out.select(
        "doc_id",
        F.col("frame_offset").cast("long").alias("frame_offset"),
        F.decode("frame_chunk", "UTF-8").alias("chunk"),
    ).orderBy("doc_id", "frame_offset")


@query(
    "mm_byte_features",
    oracle="""
WITH bytes AS (
  SELECT doc_id, text, unnest(string_split(text, '')) AS c
  FROM documents WHERE doc_id < 50
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bytes,
       ROUND(AVG(ascii(c)), 6) AS mean_byte,
       CAST(COUNT(DISTINCT ascii(c)) AS INT) AS n_distinct_bytes,
       CAST(ascii(substring(MIN(text), 1, 1)) AS INT) AS head_byte
FROM bytes GROUP BY doc_id ORDER BY doc_id
""",
)
def mm_byte_features(spark, sf_dir):
    """Arrow-batched mapInPandas feature extraction over blobs (byte
    histogram stats). The testdata text is pure ASCII (1 byte per
    char), so the numpy-computed features ARE SQL-expressible for the
    oracle: DuckDB re-derives them by exploding chars through ascii()
    (round-5 verdict item 6 — upgraded from rows-only). mean_byte is
    an exact integer sum / count in both engines; rounded to 6 for
    hash stability. tests/test_multimodal.py still pins values against
    a plain-Python recomputation."""
    d = attach_blob(t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50))
    return (
        extract_byte_features(d)
        .select(
            "doc_id",
            "n_bytes",
            F.round("mean_byte", 6).alias("mean_byte"),
            "n_distinct_bytes",
            "head_byte",
        )
        .orderBy("doc_id")
    )
