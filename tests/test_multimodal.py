"""Multimodal binary-column plumbing: schema, Arrow batch path, stub
determinism."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from streaming_ml_with_ksql_spark import io as io_mod
from streaming_ml_with_ksql_spark.operators import multimodal


def test_decode_media_schema_and_coverage(spark, sf_small):
    docs = io_mod.load_table(spark, sf_small, "documents")
    out = multimodal.decode_media(multimodal.attach_binary_payload(docs))
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "media_type", "n_bytes", "sha256", "width", "height",
        "n_frames", "decoder",
    ]
    n_docs = docs.count()
    assert out.count() == n_docs  # one decoded row per doc, none dropped
    assert out.filter(F.col("decoder") != "stub").count() == 0
    assert out.select("media_type").distinct().count() == 3


def test_decode_stub_is_deterministic_vs_local(spark, sf_small):
    """The stub's outputs must equal a local recomputation from the raw
    text bytes — pins the Arrow round-trip (no mangling of binary data)."""
    docs = io_mod.load_table(spark, sf_small, "documents").limit(20)
    out = (
        multimodal.decode_media(multimodal.attach_binary_payload(docs))
        .select("doc_id", "n_bytes", "sha256", "width")
        .collect()
    )
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    for row in out:
        raw = texts[row["doc_id"]].encode("utf-8")
        assert row["n_bytes"] == len(raw)
        assert row["sha256"] == hashlib.sha256(raw).hexdigest()
        assert row["width"] == raw[0] % 64 + 1


def test_stub_kernel_is_active_and_named(spark):
    """This component is PARTIAL by design: the active decode kernel in
    this container must be `_stub_decode` (no media libraries installed),
    and the real-codec swap point is `_real_decode` — one function, same
    signature. If a media library ever appears here, this test fails on
    purpose: wire `_real_decode` and flip the assertion."""
    assert multimodal._try_real_decoder() is None
    assert multimodal._active_decode_kernel() is multimodal._stub_decode
    # the stub itself is pure + deterministic on raw bytes
    one = multimodal._stub_decode(7, "image/png", b"abc")
    two = multimodal._stub_decode(7, "image/png", b"abc")
    assert one == two and one["decoder"] == "stub"


def test_extract_features_deterministic_fixed_dim(spark, sf_small):
    from streaming_ml_with_ksql_spark import io as io_mod
    from streaming_ml_with_ksql_spark.operators import multimodal

    docs = io_mod.load_table(spark, sf_small, "documents")
    feats = multimodal.extract_features(multimodal.attach_binary_payload(docs))
    rows = feats.collect()
    assert len(rows) == docs.count()
    assert all(len(r.features) == multimodal.FEATURE_DIM for r in rows)
    # distributions sum to ~1 (byte histogram over non-empty payloads)
    assert all(abs(sum(r.features) - 1.0) < 1e-4 for r in rows)
    again = {
        r.doc_id: r.features
        for r in multimodal.extract_features(
            multimodal.attach_binary_payload(docs)
        ).collect()
    }
    assert all(again[r.doc_id] == r.features for r in rows)


def test_resize_meta_preserves_aspect(spark, sf_small):
    from pyspark.sql import functions as F

    from streaming_ml_with_ksql_spark import io as io_mod
    from streaming_ml_with_ksql_spark.operators import multimodal

    docs = io_mod.load_table(spark, sf_small, "documents")
    decoded = multimodal.decode_media(multimodal.attach_binary_payload(docs))
    resized = multimodal.resize_meta(decoded, max_side=32)
    assert resized.count() > 0
    bad = resized.filter(
        (F.greatest("target_width", "target_height") > 32)
        | (F.col("target_width") < 1)
        | (F.col("target_height") < 1)
    )
    assert bad.count() == 0


def test_wav_roundtrip_is_real_riff(spark):
    """The audio path is NOT a stub: bytes produced by the encoder must be
    a genuine RIFF/WAVE container (magic bytes checked here directly) and
    the decode must recover the container fields through the stdlib
    parser, not from the doc_id."""
    from streaming_ml_with_ksql_spark.operators import multimodal

    raw = multimodal._wav_bytes(7)
    assert raw[0:4] == b"RIFF" and raw[8:12] == b"WAVE"

    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    out = {
        r.doc_id: r
        for r in multimodal.decode_audio(
            multimodal.synthesize_wav_payload(docs)
        ).collect()
    }
    for i in range(12):
        r = out[i]
        n = 100 + i % 400
        assert r.n_samples == n
        assert r.n_bytes == 44 + n
        assert (r.n_channels, r.sample_width, r.sample_rate) == (1, 1, 8000)
        assert abs(r.duration_ms - n * 1000.0 / 8000) < 1e-9
        assert r.decoder == "stdlib-wave"


def test_wav_decode_rejects_garbage(spark):
    """Malformed payloads must raise through the real parser (no silent
    fake fallback on the audio path)."""
    import pytest
    from pyspark.sql import functions as F

    from streaming_ml_with_ksql_spark.operators import multimodal

    bad = spark.createDataFrame([(1, "audio/wav")], "doc_id long, media_type string")
    bad = bad.withColumn("payload", F.lit(b"not a wav file"))
    with pytest.raises(Exception):
        multimodal.decode_audio(bad).collect()


def test_bmp_roundtrip_is_real_dib(spark):
    """The image path is real for BMP: encoder output carries the BM magic
    and spec-compliant padding; the decoder recovers geometry from the
    INFOHEADER and pixel statistics from the actual array."""
    from streaming_ml_with_ksql_spark.operators import multimodal

    raw = multimodal._bmp_bytes(11)
    assert raw[0:2] == b"BM"

    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    out = {
        r.doc_id: r
        for r in multimodal.decode_image(
            multimodal.synthesize_bmp_payload(docs)
        ).collect()
    }
    for i in range(10):
        r = out[i]
        w, h = multimodal._bmp_dims(i)
        stride = (3 * w + 3) // 4 * 4
        assert (r.width, r.height, r.bpp) == (w, h, 24)
        assert r.n_bytes == 54 + stride * h
        assert abs(r.mean_pixel - sum((i + y) % 256 for y in range(h)) / h) < 1e-12
        assert r.decoder == "struct-bmp"


def test_bmp_decode_rejects_garbage():
    import pytest

    from streaming_ml_with_ksql_spark.operators import multimodal

    with pytest.raises(ValueError):
        multimodal._bmp_parse(b"JFIF not a bmp")


def test_audio_features_come_from_decoded_samples(spark):
    """RMS/ZC/peak must derive from the decoded PCM array, not payload
    bytes: verified against a straight numpy recomputation of the known
    sample series."""
    import numpy as np

    from streaming_ml_with_ksql_spark.operators import multimodal

    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    out = {
        r.doc_id: r
        for r in multimodal.audio_features(
            multimodal.synthesize_wav_payload(docs)
        ).collect()
    }
    for i in range(8):
        n = 100 + i % 400
        s = np.array([((i * 31 + k * 7) % 256) - 128 for k in range(n)], dtype=np.int64)
        r = out[i]
        assert r.n_samples == n
        assert abs(r.rms - float(np.sqrt(float((s * s).sum()) / n))) < 1e-12
        assert r.zero_crossings == int(((s[:-1] * s[1:]) < 0).sum())
        assert r.peak == int(np.abs(s).max())


def test_resize_image_preserves_aspect_and_samples_real_pixels(spark):
    """Resize must clamp the long side, keep >=1 px per dim, and the
    resized mean must come from the actual resampled array (verified by
    numpy recomputation over the decoded source)."""
    import numpy as np

    from streaming_ml_with_ksql_spark.operators import multimodal

    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    out = {
        r.doc_id: r
        for r in multimodal.resize_image(
            multimodal.synthesize_bmp_payload(docs), max_side=16
        ).collect()
    }
    for i in range(10):
        r = out[i]
        w, h = multimodal._bmp_dims(i)
        assert (r.src_w, r.src_h) == (w, h)
        assert max(r.dst_w, r.dst_h) <= 16
        assert r.dst_w >= 1 and r.dst_h >= 1
        row_idx = (np.arange(r.dst_h) * h) // r.dst_h
        expect = float(np.mean([(i + y) % 256 for y in row_idx]))
        assert abs(r.resized_mean - expect) < 1e-9


def test_nn_resample_preserves_channels():
    """The resample's column map must be per-PIXEL (then channel-expanded):
    a per-byte map stitches destination pixels from different source
    pixels/channels whenever w/dst_w is non-integral — invisible on the
    synthetic B=G=R images, wrong on real 24-bit data."""
    import numpy as np

    from streaming_ml_with_ksql_spark.operators.multimodal import _nn_resample

    w, h, ch = 24, 8, 3
    px = np.zeros((h, w * ch), dtype=np.uint8)
    for x in range(w):
        for c in range(ch):
            px[:, x * ch + c] = (x * 3 + c) % 251
    out = _nn_resample(px, w, h, 16, 8, ch)
    px_idx = (np.arange(16) * w) // 16
    for i in range(16):
        for c in range(ch):
            assert out[0, i * ch + c] == (px_idx[i] * 3 + c) % 251
