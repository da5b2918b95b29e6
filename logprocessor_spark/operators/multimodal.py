"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested: schemas, Arrow batch shape,
``mapInPandas`` signatures, partitioning. Image decode is REAL for the
uncompressed formats a pure-numpy decoder can handle byte-exactly — BMP
(24/32-bit BI_RGB) and binary PPM (P6) — including round-trip encode for
test fixtures, pixel feature extraction, and nearest-neighbor resize.
Compressed formats (JPEG/PNG/...) dispatch to PIL when importable and
raise ``NotImplementedError`` otherwise (the sandbox ships no imaging
libs). ``fake_decode`` — a deterministic pure-bytes feature extractor —
remains the default for the synthetic benchmark table so every downstream
stage (batching, schema, joins, aggregation over features) exercises the
same code path regardless of codec availability.

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


def encode_bmp(arr) -> bytes:
    """Encode an HxWx3 uint8 RGB array as an uncompressed 24-bit BI_RGB
    BMP (bottom-up, 4-byte-padded rows) — a real, byte-exact codec used to
    synthesize decodable test/benchmark payloads without imaging libs."""
    import struct

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # BGR, bottom-up, padded
    bgr = a[::-1, :, ::-1]
    body = b"".join(bgr[r].tobytes() + b"\x00" * pad for r in range(h))
    pixel_off = 14 + 40
    file_size = pixel_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + dib + body


def decode_bmp(payload: bytes):
    """Decode an uncompressed 24/32-bit BI_RGB BMP to an HxWx3 uint8 RGB
    array, pure numpy. Handles bottom-up and top-down (negative height)
    rows and 4-byte row padding. Raises ValueError on compressed or
    palette BMPs."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression not in (0, 3) or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down, h = h < 0, abs(h)
    ch = bpp // 8
    row_bytes = (w * ch + 3) & ~3
    data = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h, offset=pixel_off)
    rows = data.reshape(h, row_bytes)[:, : w * ch].reshape(h, w, ch)
    rgb = rows[..., 2::-1]  # BGR(A) -> RGB
    return np.ascontiguousarray(rgb if top_down else rgb[::-1])


def decode_ppm(payload: bytes):
    """Decode a binary PPM (P6, maxval ≤ 255) to an HxWx3 uint8 RGB array,
    pure numpy."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header: P6 <w> <h> <maxval> with #-comments allowed between tokens
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3).copy()


def resize_nearest(arr, out_w: int, out_h: int):
    """Nearest-neighbor resize of an HxWxC uint8 array, pure numpy (index
    gather, no interpolation kernel) — the cheap thumbnail path."""
    import numpy as np

    a = np.asarray(arr)
    h, w = a.shape[:2]
    ri = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    ci = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return a[ri][:, ci]


def image_features(arr, hist_bins: int = 8) -> list[float]:
    """Feature vector from decoded RGB pixels: [w, h, mean_r, mean_g,
    mean_b, luminance-histogram(hist_bins)] — 5 + hist_bins floats. The
    histogram is L1-normalized so features are resolution-invariant."""
    import numpy as np

    a = np.asarray(arr, dtype=np.float32)
    h, w = a.shape[:2]
    means = a.reshape(-1, a.shape[-1]).mean(axis=0)
    lum = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    hist, _ = np.histogram(lum, bins=hist_bins, range=(0.0, 256.0))
    hist = hist / max(hist.sum(), 1)
    return [float(w), float(h), *(float(m) for m in means[:3]), *map(float, hist)]


def decode_image_real(payload: bytes):
    """Real image decode: BMP and binary PPM are decoded byte-exactly in
    pure numpy (no imaging libs needed); other formats (JPEG/PNG/...)
    dispatch to PIL when importable. Returns an HxWx3 uint8 RGB array."""
    if payload is None or len(payload) < 2:
        raise ValueError("empty payload")
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - sandbox has no PIL
        raise NotImplementedError(
            "compressed-format decode requires PIL; BMP and P6 PPM decode "
            "natively without it"
        ) from e
    import io  # pragma: no cover

    import numpy as np  # pragma: no cover

    return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))  # pragma: no cover


def extract_features(
    media: DataFrame, batch_hint: int = 256, decoder: str = "fake"
) -> DataFrame:
    """mapInPandas feature extraction: binary in, float features out.

    ``decoder="fake"`` uses the byte-histogram stand-in; ``"image"`` runs
    the real pixel pipeline (decode_image_real → image_features). A row
    whose payload fails to decode gets ``features=None`` — per-record
    containment, the same quarantine philosophy as the log pipeline; the
    job never dies on one corrupt JPEG at scale.

    The binary column is consumed inside the batch and NOT emitted —
    downstream stages never carry payload bytes."""

    def decode_one(p):
        if decoder == "fake":
            return fake_decode(p)
        try:
            return image_features(decode_image_real(p))
        except Exception:
            return None

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            feats = [decode_one(p) for p in pdf["payload"]]
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


def gen_media_images(
    spark: SparkSession, n: int, seed: int = 42, w: int = 24, h: int = 16
) -> DataFrame:
    """Media table whose image payloads are REAL decodable BMP bytes:
    deterministic per-id gradient+hash pixels, encoded with encode_bmp.
    Exercises the full decode→features path without imaging libs."""

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for mid in pdf["id"]:
                rng = np.random.default_rng((int(mid) * 2654435761 + seed) % 2**63)
                img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                # horizontal gradient keyed by id so features differ per row
                img[..., 0] = (np.arange(w, dtype=np.uint32) * (int(mid) % 7 + 1)) % 256
                payloads.append(encode_bmp(img))
            yield pd.DataFrame(
                {
                    "media_id": pdf["id"],
                    "kind": "image",
                    "mime": "image/bmp",
                    "width": w,
                    "height": h,
                    "duration_ms": None,
                    "payload": payloads,
                }
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


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
