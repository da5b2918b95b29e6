"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested: schemas, Arrow batch shape,
``mapInPandas`` signatures, partitioning. The actual codec work is stubbed
(the sandbox ships no image/audio libraries): ``decode_image_real`` raises
``NotImplementedError`` unless PIL is importable, and the default pipeline
uses ``fake_decode`` — a deterministic pure-bytes feature extractor — so
every downstream stage (batching, schema, joins, aggregation over features)
exercises the same code path a real decoder would.

At scale: media bytes dominate row size, so batches are kept small via
``spark.sql.execution.arrow.maxRecordsPerBatch`` and the decode stage is a
``mapInPandas`` projection that drops the binary column as early as
possible (column pruning does the rest).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("byte_len", T.IntegerType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def gen_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from the id."""
    df = spark.range(n)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("id", F.lit(seed)), 3) + 1).cast("int"),
    )
    payload = F.encode(
        F.concat(F.lit("MEDIA:"), F.sha2(F.concat(F.col("id").cast("string"), F.lit(seed)), 256)),
        "UTF-8",
    )
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        F.when(kind == "image", (F.pmod(F.xxhash64("id", F.lit(1)), 1920) + 1).cast("int")).alias("width"),
        F.when(kind == "image", (F.pmod(F.xxhash64("id", F.lit(2)), 1080) + 1).cast("int")).alias("height"),
        F.when(kind != "image", (F.pmod(F.xxhash64("id", F.lit(3)), 600_000) + 1).cast("int")).alias("duration_ms"),
        payload.alias("payload"),
    )


def fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a codec: 16-bucket byte histogram,
    L1-normalized. Replace with a real decoder (PIL/librosa/ffmpeg) by
    swapping this function — the Spark plumbing does not change."""
    if payload is None:
        return []
    counts = [0] * 16
    for b in payload:
        counts[b & 0x0F] += 1
    total = max(sum(counts), 1)
    return [c / total for c in counts]


def decode_image_real(payload: bytes):  # pragma: no cover - sandbox has no PIL
    """Real image decode hook. STUB: the container has no imaging libs."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires PIL; install pillow and swap "
            "fake_decode for a real feature extractor"
        ) from e
    raise NotImplementedError("wire PIL decode here when available")


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction: binary in, float features out.

    The binary column is consumed inside the batch and NOT emitted —
    downstream stages never carry payload bytes."""

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            feats = [fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "byte_len": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "sha256": [
                        hashlib.sha256(p).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "features": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        gen, schema=FEATURES_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms).
    The sequence expansion is native (no UDF); actual frame decode would
    plug into extract_features. Demonstrates the explode-then-process
    shape used for video at scale."""
    vids = media.where(F.col("kind") == "video").select("media_id", "duration_ms")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
