"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata (MEDIA_SCHEMA), processed by Arrow-batched
``mapInPandas`` operators.

The container has no image/audio codecs, so the actual decode step is
STUBBED: ``decode_media`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (byte-stats
pseudo-features) exercises the full Spark-side path — schema handling,
Arrow batch shapes, partition-parallel execution — which is the part that
must be right at 100 TB.

Scale notes:
- media rows are large (MBs); keep ``spark.sql.files.maxPartitionBytes``
  at default so scan tasks hold a handful of payloads, and NEVER collect
  payload columns to the driver;
- ``mapInPandas`` streams Arrow batches — peak executor memory is one
  batch of payloads per task, controlled by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (set it low, e.g. 32,
  for multi-MB payloads);
- feature outputs drop the payload column as early as possible so
  downstream stages shuffle features (KBs), not media (MBs).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_mean", DoubleType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def decode_media(payload: bytes, kind: str, fake: bool = False) -> list[float]:
    """Decode a media payload into a feature vector.

    Real decoding needs codec libraries not present in this container —
    callers on a real cluster plug in PIL/librosa/ffmpeg here. The
    deterministic fake derives an 8-dim byte-histogram feature so tests
    cover the distributed plumbing end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs not available in this environment; pass fake=True "
            "for the deterministic byte-stats decoder"
        )
    if payload is None or len(payload) == 0:
        return [0.0] * 8
    buckets = [0] * 8
    for by in payload:
        buckets[by >> 5] += 1
    n = len(payload)
    return [b / n for b in buckets]


def extract_media_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas operator: (media_id, kind, payload) -> features.

    Arrow-batched; each task processes its partition's batches
    independently — embarrassingly parallel, no shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_media(p, k, fake=fake)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "byte_mean": [
                        (sum(p) / len(p)) if p is not None and len(p) else 0.0
                        for p in pdf["payload"]
                    ],
                    "feature": feats,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(run, MEDIA_FEATURE_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize operator shape: passthrough metadata update (the pixel
    transform is part of the stubbed codec layer). Keeps the operator
    surface so pipelines can declare resize steps today and swap in a real
    decoder later."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(width).cast(IntegerType()).alias("width"),
            F.lit(height).cast(IntegerType()).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
            F.col("meta.sample_rate").alias("sample_rate"),
        ),
    )


def frame_sample_stub(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling operator shape: emits (media_id, frame_ts_ms)
    rows from duration metadata — the real frame extraction plugs into the
    codec layer; the row-multiplication plumbing (sequence + explode) is
    real and runs at scale."""
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("meta.duration_ms"), F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
