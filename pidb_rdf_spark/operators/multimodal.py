"""Multimodal (image/audio/video) column plumbing.

No counterpart in the reference engine (its only binary-ish path is
RDF literal typing, ``semantics/extension/RDFEndpoint.java:566-586``).
This is the scale extension for multimodal training data: media
travel as opaque ``binary`` columns with a typed metadata struct;
decode / feature-extraction / resize run as Arrow-batched
``mapInPandas`` stages.

The actual codec step is STUBBED in this environment (no
PIL/opencv/ffmpeg in the container): ``decode_media`` raises
``NotImplementedError`` unless ``stub=True``, in which case it
computes a deterministic fake (byte histogram + length features)
with the exact Spark-side contract — schema, Arrow batch shape,
partitioning — that a real decoder drops into.

Scale notes: binary payloads dominate row size, so feature
extraction runs ``mapInPandas`` with Arrow batches sized by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (set it low, e.g.
64-256, for multi-MB media); the metadata struct stays queryable
without touching bytes (column pruning skips the blob entirely when
a query only reads metadata).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

N_HIST_BUCKETS = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("byte_hist", ArrayType(LongType())),
    ]
)


def attach_media(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic fake media table from the documents fixture:
    content = UTF-8 bytes of the text, metadata derived from length.
    Stands in for ``spark.read.format('binaryFile')`` /  a blob-store
    scan; downstream operators only see the column contract:
    (media_id, modality, content: binary, meta: struct)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.struct(
            (F.length(F.col(text_col)) % 64 + 1).cast("int").alias("width"),
            (F.length(F.col(text_col)) % 48 + 1).cast("int").alias("height"),
            F.lit(3).cast("int").alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def decode_media(df: DataFrame, stub: bool = False) -> DataFrame:
    """Decode + featurize media content via Arrow-batched
    ``mapInPandas``: (media_id, n_bytes, first_byte, byte_hist[16]).

    The real path (PIL/soundfile decode) is not available in this
    container — it raises ``NotImplementedError`` so the gap is
    explicit. ``stub=True`` runs the deterministic fake featurizer
    through the identical mapInPandas plumbing.
    """
    if not stub:
        raise NotImplementedError(
            "media codecs (PIL/opencv/ffmpeg) are not installed in this "
            "environment; pass stub=True for the deterministic fake path"
        )

    def featurize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                hist = [0] * N_HIST_BUCKETS
                for byte in b:
                    hist[byte % N_HIST_BUCKETS] += 1
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_bytes": len(b),
                        "first_byte": b[0] if b else -1,
                        "byte_hist": hist,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.select("media_id", "content").mapInPandas(featurize, FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """'Frame sampling' over the binary payload: slice the blob at a
    fixed stride (stand-in for video frame extraction — same plumbing:
    one input row → N frame rows). JVM-side (substring on binary),
    no Python; output explodes to (media_id, frame_idx, frame:
    binary)."""
    n_frames = F.least(
        (F.floor((F.length("content") - 1) / every_n_bytes) + 1).cast("int"),
        F.lit(max_frames),
    )
    return (
        df.select(
            "media_id",
            "content",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        )
        .withColumn(
            "frame",
            F.expr(f"substring(content, frame_idx * {every_n_bytes} + 1, {every_n_bytes})"),
        )
        .select("media_id", F.col("frame_idx").cast("int"), "frame")
    )
