"""Text-analysis function tests + multimodal plumbing tests."""

import pytest
from pyspark.sql import functions as F

from logprocessor_spark.functions.textstats import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    quality_score,
    rolling_fingerprints,
    token_count,
)
from logprocessor_spark.operators.multimodal import (
    extract_features,
    fake_decode,
    frame_sample_plan,
    gen_media,
)

SF = "/root/testdata/sf0.01"


def _one(spark, text):
    return spark.createDataFrame([(text,)], "text string")


def test_token_count(spark):
    df = _one(spark, "  a b   c ").select(
        token_count(F.col("text")).alias("n"),
        bpe_ish_token_count(F.col("text")).alias("b"),
    )
    r = df.collect()[0]
    assert r.n == 3 and r.b == 3
    assert _one(spark, "").select(token_count(F.col("text")).alias("n")).collect()[0].n == 0
    assert (
        _one(spark, "don't stop-me now2x").select(bpe_ish_token_count(F.col("text")).alias("b")).collect()[0].b
        == 9
    )  # don / ' / t / stop / - / me / now / 2 / x


def test_lang_id(spark):
    cases = {
        "the cat and the dog is in the house": "en",
        "der Hund und die Katze ist nicht ein": "de",
        "le chat et la maison est une belle": "fr",
        "el perro es una casa que los gatos": "es",
        "xyzzy qwerty zzz": "und",
    }
    for text, want in cases.items():
        got = _one(spark, text).select(lang_id(F.col("text")).alias("l")).collect()[0].l
        assert got == want, (text, got, want)


def test_quality_score_ordering(spark):
    good = "the quick brown fox jumps over the lazy dog and runs to the house in a field"
    bad = "!!! ??? ### 123 456 789 $$$ %%% ^^^ &&&"
    s = {
        t: _one(spark, t).select(quality_score(F.col("text")).alias("q")).collect()[0].q
        for t in (good, bad)
    }
    assert 0 <= s[bad] < s[good] <= 1


def test_fingerprint_matches_duckdb(spark):
    import duckdb

    df = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    got = {r.doc_id: r.fp for r in df.select("doc_id", fingerprint(F.col("text")).alias("fp")).collect()}
    want = dict(
        duckdb.sql(
            f"SELECT doc_id, md5(text) FROM '{SF}/documents.parquet' ORDER BY doc_id LIMIT 20"
        ).fetchall()
    )
    assert got == want


def test_rolling_fingerprints(spark):
    df = _one(spark, "x" * 200).select(
        F.size(rolling_fingerprints(F.col("text"), window=64, stride=32)).alias("n")
    )
    # starts at 1..137 step 32 -> 1,33,65,97,129 -> 5
    assert df.collect()[0].n == 5


def test_fake_decode_deterministic():
    a = fake_decode(b"hello world")
    assert a == fake_decode(b"hello world")
    assert abs(sum(a) - 1.0) < 1e-9
    assert fake_decode(None) == []


def test_media_feature_pipeline(spark):
    media = gen_media(spark, 100, seed=1)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 100
    assert all(len(r.features) == 16 for r in rows)
    assert all(r.sha256 and r.byte_len > 0 for r in rows)
    assert "payload" not in feats.columns  # binary dropped early
    # deterministic across runs
    again = {r.media_id: r.sha256 for r in extract_features(media).collect()}
    assert {r.media_id: r.sha256 for r in rows} == again


def test_frame_sample_plan(spark):
    media = gen_media(spark, 60, seed=2)
    plan = frame_sample_plan(media, every_ms=100_000)
    rows = plan.collect()
    vids = media.where("kind = 'video'").count()
    assert len(rows) >= vids  # every video yields >= 1 frame
    assert all(r.frame_ts_ms % 100_000 == 0 for r in rows)


def test_real_decode_compressed_formats_need_pil():
    """JPEG/PNG dispatch to PIL; without it the error names the native
    escape hatch instead of dying opaquely."""
    from logprocessor_spark.operators.multimodal import decode_image_real

    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            decode_image_real(b"\x89PNG\r\n\x1a\n")


def test_bmp_round_trip_byte_exact():
    """encode_bmp -> decode_bmp is the identity on uint8 RGB pixels,
    including odd widths that need 4-byte row padding."""
    import numpy as np

    from logprocessor_spark.operators.multimodal import (
        decode_bmp,
        decode_image_real,
        encode_bmp,
    )

    rng = np.random.default_rng(7)
    for h, w in [(16, 24), (5, 3), (1, 1), (7, 7)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)
        # the magic-byte dispatcher routes BMP to the native decoder
        assert np.array_equal(decode_image_real(encode_bmp(img)), img)


def test_ppm_decode_with_comments():
    import numpy as np

    from logprocessor_spark.operators.multimodal import decode_ppm

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    ppm = b"P6\n# a comment\n11 9\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(ppm), img)


def test_resize_and_features_shape():
    import numpy as np

    from logprocessor_spark.operators.multimodal import (
        image_features,
        resize_nearest,
    )

    img = np.zeros((10, 20, 3), dtype=np.uint8)
    assert resize_nearest(img, 4, 3).shape == (3, 4, 3)
    assert resize_nearest(img, 40, 25).shape == (25, 40, 3)  # upscale too
    f = image_features(img)
    assert len(f) == 13 and f[0] == 20.0 and f[1] == 10.0
    assert abs(sum(f[5:]) - 1.0) < 1e-6  # histogram L1-normalized
    assert f[5] == 1.0  # all-black image: everything in the first bucket


def test_extract_features_real_decode_end_to_end(spark):
    """gen_media_images emits REAL BMP payloads; extract_features with the
    image decoder recovers true width/height in the feature vector, and a
    corrupt payload is contained as features=None, not a task failure."""
    from logprocessor_spark.operators.multimodal import (
        extract_features,
        gen_media_images,
    )

    media = gen_media_images(spark, 40, seed=5, w=24, h=16)
    feats = extract_features(media, decoder="image")
    rows = feats.collect()
    assert len(rows) == 40
    assert all(r.features is not None for r in rows)
    assert all(r.features[0] == 24.0 and r.features[1] == 16.0 for r in rows)
    assert len({tuple(r.features) for r in rows}) > 1  # per-id variation

    # containment: flip one payload to garbage -> that row's features are
    # null, every other row still decodes
    poisoned = media.withColumn(
        "payload",
        F.when(F.col("media_id") == 3, F.lit(b"NOTANIMAGE")).otherwise(
            F.col("payload")
        ),
    )
    out = {r.media_id: r.features for r in extract_features(poisoned, decoder="image").collect()}
    assert out[3] is None
    assert sum(v is None for v in out.values()) == 1


def test_remove_contaminated_spans_golden(spark):
    """Planted contamination: flagged 64-char windows are excised with
    overlapping windows merged; clean docs pass through byte-identical."""
    import hashlib

    from pyspark.sql import functions as F

    from logprocessor_spark.operators.decontam import remove_contaminated_spans

    secret = "S" * 150  # spans several stride-32 windows
    prefix, suffix = "a" * 100, "z" * 40
    train = spark.createDataFrame(
        [
            (1, prefix + secret + suffix),  # contaminated in the middle
            (2, "completely clean document " * 8),
            (3, secret),                    # fully contaminated
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(0, secret)], "doc_id long, text string")
    from logprocessor_spark.operators.decontam import span_grid

    bench_fps = bench.select(
        F.explode(span_grid(F.col("text"))).alias("sp")
    ).select("sp.fp").distinct()
    out = {
        r.doc_id: (r.text, r.n_spans_cut)
        for r in remove_contaminated_spans(train, bench_fps).collect()
    }

    # scalar reference: same grid, same md5, same cut semantics
    def ref_clean(text):
        n = len(text)
        starts = list(range(1, max(n - 63, 1) + 1, 32))
        bench_set = set()
        bn = len(secret)
        for s in range(1, max(bn - 63, 1) + 1, 32):
            bench_set.add(hashlib.md5(secret[s - 1:s - 1 + 64].encode()).hexdigest())
        keep = [True] * n
        ncut = 0
        for s in starts:
            fp = hashlib.md5(text[s - 1:s - 1 + 64].encode()).hexdigest()
            if fp in bench_set:
                ncut += 1
                for i in range(s - 1, min(s - 1 + 64, n)):
                    keep[i] = False
        return "".join(c for c, k in zip(text, keep) if k), ncut

    for doc_id, text in [(1, prefix + secret + suffix), (2, "completely clean document " * 8), (3, secret)]:
        want_text, want_cut = ref_clean(text)
        assert out[doc_id] == (want_text, want_cut), doc_id
    assert out[2][1] == 0 and out[2][0] == "completely clean document " * 8
    assert out[3][1] > 0
