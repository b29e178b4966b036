"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed by Arrow-batched pandas functions.

The container has no image/audio codecs, so the *decode kernels* are
deterministic fakes behind a clearly-marked seam (`_decode_image_real`
raises NotImplementedError); everything Spark-side — schema, mapInPandas
batch shape, partition behavior, metadata extraction — is real and tested.

At 100 TB: binary payloads ride in parquet binary columns; decode/feature
kernels run inside mapInPandas so each task streams Arrow batches (bounded
memory) and the cluster scales by partitions, not driver RAM.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical multimodal record: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 8

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        # double, not float32: the sha-derived values carry ~10 significant
        # digits and the oracle compares them after rounding — float32
        # storage shifts the 4th decimal on some values
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Deterministic media fixture: encode document text as the binary
    payload with synthetic image metadata. Stands in for a real
    image/audio table so the plumbing is exercised end to end."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("image/png").alias("mime"),
            (F.col("n_chars") % 1024).cast("int").alias("width"),
            (F.col("n_chars") % 768).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """JVM-side metadata extraction — no decode needed: byte length, content
    digest, magic-byte sniff. This is the cheap pre-filter stage a real
    pipeline runs before spending decode cycles."""
    return media.select(
        "media_id",
        F.octet_length("content").alias("n_bytes"),
        F.sha2("content", 256).alias("digest"),
        F.col("meta.mime").alias("mime"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


def _decode_image_real(payload: bytes) -> object:
    """Seam for a real decoder (PIL/libvips). Not available in this
    container — the fake kernel below keeps the pipeline testable."""
    raise NotImplementedError(
        "image decode requires PIL/libvips; not installed in this environment"
    )


def _fake_feature(payload: bytes) -> list[float]:
    """Deterministic stand-in feature: FEATURE_DIM floats derived from the
    sha256 digest. Stable across runs/partitions — safe for tests."""
    digest = hashlib.sha256(payload or b"").digest()
    return [
        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32
        for i in range(FEATURE_DIM)
    ]


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction via mapInPandas.

    The iterator-of-batches contract is the real scale shape: each task
    pulls Arrow batches, computes per-row features in pandas, yields
    batches — memory bounded by batch size, not partition size.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["content"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "feature": pdf["content"].map(_fake_feature),
                }
            )

    return media.select("media_id", "content").mapInPandas(
        kernel, schema=_FEATURES_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per planned frame via
    sequence+explode on duration metadata. Decode of the actual frame is the
    stubbed kernel; the row-explosion plumbing (the part Spark owns) is real.
    """
    return (
        media.filter(F.col("meta.duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.col("meta.duration_ms"),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
