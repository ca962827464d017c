"""Multimodal column plumbing (north-star surface, BASELINE.json).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; decode / feature-extraction runs as Arrow-batched pandas over
``mapInPandas``. The container has no image/video libraries, so those
codec kernels are STUBBED (import-gated): when PIL/cv2 are absent we emit
a deterministic fake decode derived from the bytes, keeping the Spark-side
plumbing — schema, partitioning, UDF signature, Arrow batch shape — real
and tested. Two codec paths are NOT stubbed: `synthesize_wav_payload` /
`decode_audio` encode and parse genuine RIFF/WAVE containers, and
`synthesize_bmp_payload` / `decode_image` genuine uncompressed BMP
containers (including real pixel statistics from the decoded array) —
both with the Python standard library + numpy, end-to-end in-sandbox.
Only compressed codecs (PNG/JPEG/MP4) remain stubbed.

Scale notes:
- mapInPandas streams Arrow record batches; peak executor memory is one
  batch of binary payloads (`spark.sql.execution.arrow.maxRecordsPerBatch`
  bounds it), not one partition.
- The decode stage is a narrow map — partitioning is inherited from the
  scan, no shuffle. Real media work at 100 TB wants
  `spark.sql.files.maxPartitionBytes` tuned down so a partition of blobs
  fits in worker memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "attach_binary_payload",
    "decode_media",
    "extract_features",
    "sample_frames",
    "resize_meta",
    "synthesize_wav_payload",
    "decode_audio",
    "synthesize_bmp_payload",
    "decode_image",
    "audio_features",
    "resize_image",
    "DECODED_SCHEMA",
    "FEATURES_SCHEMA",
    "AUDIO_DECODED_SCHEMA",
    "IMAGE_DECODED_SCHEMA",
]

DECODED_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, sha256 string, "
    "width int, height int, n_frames int, decoder string"
)

_MEDIA_TYPES = ("image/png", "audio/wav", "video/mp4")


def attach_binary_payload(documents: DataFrame) -> DataFrame:
    """Build an opaque binary payload column + typed metadata from the
    documents table (the driver testdata has no real media; the payload is
    the utf-8 text bytes, which is exactly as opaque to the decode stage as
    a real codec stream)."""
    media = F.element_at(
        F.array(*[F.lit(m) for m in _MEDIA_TYPES]),
        (F.col("doc_id") % len(_MEDIA_TYPES) + 1).cast("int"),
    )
    return documents.select(
        "doc_id",
        media.alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


def _try_real_decoder():
    try:
        import PIL.Image  # noqa: F401

        return "pillow"
    except ImportError:
        return None


def _stub_decode(doc_id: int, media_type: str, payload: bytes) -> dict:
    """THE STUB. Deterministic pseudo-metadata derived from the payload
    bytes — a stand-in for a real codec, because this container has no
    media libraries (PARTIAL component; see README 'Multimodal columns').
    Same signature as _real_decode; everything else in the pipeline is
    real (Arrow batching, schema, partitioning)."""
    import hashlib

    first = payload[0] if payload else 0
    second = payload[1] if len(payload) > 1 else 0
    return {
        "n_bytes": len(payload),
        "sha256": hashlib.sha256(payload).hexdigest(),
        "width": first % 64 + 1,
        "height": second % 64 + 1,
        "n_frames": doc_id % 30 + 1,
        "decoder": "stub",
    }


def _real_decode(doc_id: int, media_type: str, payload: bytes) -> dict:
    """The one function to swap for production: open `payload` with
    PIL/librosa/cv2 according to `media_type` and return the same dict
    shape as _stub_decode. Raises here because the container has no media
    libraries and no real media testdata."""
    raise NotImplementedError(
        "real media decode not wired: container lacks media libraries"
    )


def _active_decode_kernel():
    """Single dispatch point: the real codec when a media library is
    importable, the deterministic stub otherwise."""
    return _real_decode if _try_real_decoder() else _stub_decode


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batch decode: per-row kernel dispatch inside Arrow-sized
    batches. The per-row Python loop IS the codec boundary — a real decoder
    is per-payload work regardless; Arrow keeps the transfer vectorized."""
    kernel = _active_decode_kernel()
    for pdf in batches:
        metas = [
            kernel(int(d), m, bytes(p))
            for d, m, p in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"])
        ]
        cols = ["n_bytes", "sha256", "width", "height", "n_frames", "decoder"]
        out = pd.DataFrame(metas, columns=cols).astype(
            {"n_bytes": "int32", "width": "int32", "height": "int32", "n_frames": "int32"}
        )
        out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
        out.insert(1, "media_type", pdf["media_type"].to_numpy())
        yield out


def decode_media(with_payload: DataFrame) -> DataFrame:
    """documents-with-payload → decoded metadata frame (mapInPandas)."""
    return with_payload.mapInPandas(_decode_batches, schema=DECODED_SCHEMA)


FEATURES_SCHEMA = "doc_id long, media_type string, features array<double>"

FEATURE_DIM = 16


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Feature-extraction kernel: a real pipeline would run an image/audio
    encoder here; the stub derives a deterministic FEATURE_DIM-dim vector
    from byte histograms so the Arrow plumbing (array<double> output
    column, batch shape) is real and testable."""
    import numpy as np

    for pdf in batches:
        feats = []
        for b in pdf["payload"]:
            arr = np.frombuffer(bytes(b), dtype=np.uint8)
            if len(arr) == 0:
                feats.append([0.0] * FEATURE_DIM)
                continue
            hist, _ = np.histogram(arr % FEATURE_DIM, bins=FEATURE_DIM, range=(0, FEATURE_DIM))
            feats.append((hist / len(arr)).round(6).tolist())
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "features": feats,
            }
        )


def extract_features(with_payload: DataFrame) -> DataFrame:
    """Binary payload → fixed-dim feature vector (Arrow mapInPandas; the
    encoder is the stub kernel above). Narrow map — no shuffle; the
    output column is ``array<double>`` ready for the similarity operators."""
    return with_payload.mapInPandas(_feature_batches, schema=FEATURES_SCHEMA)


def sample_frames(
    with_payload: DataFrame, *, stride: int = 5
) -> DataFrame:
    """Frame sampling for video-typed rows: emit every ``stride``-th frame
    index with a deterministic per-frame content fingerprint
    (md5(payload ++ frame_idx)). Pure JVM (posexplode of a sequence) — the
    frame *decode* would slot into the mapInPandas kernel; the row
    explosion shape is what matters for the pipeline."""
    frames = F.sequence(
        F.lit(0),
        F.col("n_frames") - 1,
        F.lit(stride),
    )
    decoded = with_payload.withColumn(
        "n_frames", (F.col("doc_id") % 30 + 1).cast("int")
    )
    return (
        decoded.filter(F.col("media_type") == "video/mp4")
        .select(
            "doc_id",
            "n_frames",
            F.explode(frames).alias("frame_idx"),
            F.col("payload"),
        )
        .select(
            "doc_id",
            "n_frames",
            "frame_idx",
            F.md5(F.concat(F.col("payload"), F.col("frame_idx").cast("string").cast("binary"))).alias(
                "frame_fingerprint"
            ),
        )
    )


def resize_meta(
    decoded: DataFrame, *, max_side: int = 32
) -> DataFrame:
    """Resize planning for image-typed rows: compute the target (width,
    height) preserving aspect ratio with the long side clamped to
    ``max_side`` — the metadata half of a resize (the pixel work belongs
    in the mapInPandas kernel). JVM expressions only."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")),
    )
    return decoded.filter(F.col("media_type") == "image/png").select(
        "doc_id",
        "width",
        "height",
        F.greatest(F.round(F.col("width") * scale).cast("int"), F.lit(1)).alias(
            "target_width"
        ),
        F.greatest(F.round(F.col("height") * scale).cast("int"), F.lit(1)).alias(
            "target_height"
        ),
    )


# --------------------------------------------------------------------------
# REAL codec path: WAV (RIFF) via the Python standard library. Unlike the
# image/video kernels above (stubbed — no PIL/cv2 in this container), the
# audio path needs no third-party library: `wave` writes and parses the
# RIFF/WAVE container for real, so encode → bytes → decode is exercised
# end-to-end in-sandbox and the decode is a genuine container parse, not a
# byte-derived fake.
# --------------------------------------------------------------------------

WAV_SAMPLE_RATE = 8000

AUDIO_PAYLOAD_SCHEMA = "doc_id long, media_type string, payload binary"

AUDIO_DECODED_SCHEMA = (
    "doc_id long, n_bytes int, n_channels int, sample_width int, "
    "sample_rate int, n_samples int, duration_ms double, decoder string"
)


def _wav_bytes(doc_id: int) -> bytes:
    """Deterministic 8-bit mono PCM WAV: 100 + doc_id % 400 samples at
    WAV_SAMPLE_RATE, sample i = (doc_id * 31 + i * 7) % 256. Standard
    44-byte RIFF header + data ⇒ n_bytes = 44 + n_samples (the closed
    form the oracle states)."""
    import io as _io
    import wave

    n = 100 + doc_id % 400
    buf = _io.BytesIO()
    w = wave.open(buf, "wb")
    try:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(WAV_SAMPLE_RATE)
        w.writeframes(bytes((doc_id * 31 + i * 7) % 256 for i in range(n)))
    finally:
        w.close()
    return buf.getvalue()


def _wav_encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": "audio/wav",
                "payload": [_wav_bytes(int(d)) for d in pdf["doc_id"]],
            }
        )


def synthesize_wav_payload(documents: DataFrame) -> DataFrame:
    """documents → (doc_id, 'audio/wav', genuine RIFF/WAVE payload bytes).
    Narrow Arrow map; the per-row Python loop is the encoder boundary,
    exactly where a real media transcode would run."""
    return documents.select("doc_id").mapInPandas(
        _wav_encode_batches, schema=AUDIO_PAYLOAD_SCHEMA
    )


def _wav_decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL decode kernel: parse each payload's RIFF/WAVE container with
    the stdlib `wave` reader. Raises on malformed payloads (no silent
    fake fallback on this path)."""
    import io as _io
    import wave

    for pdf in batches:
        rows = []
        for d, p in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(p)
            r = wave.open(_io.BytesIO(payload), "rb")
            try:
                rate = r.getframerate()
                nf = r.getnframes()
                rows.append(
                    {
                        "doc_id": int(d),
                        "n_bytes": len(payload),
                        "n_channels": r.getnchannels(),
                        "sample_width": r.getsampwidth(),
                        "sample_rate": rate,
                        "n_samples": nf,
                        "duration_ms": (nf * 1000.0) / rate,
                        "decoder": "stdlib-wave",
                    }
                )
            finally:
                r.close()
        out = pd.DataFrame(rows)
        yield out.astype(
            {
                "n_bytes": "int32",
                "n_channels": "int32",
                "sample_width": "int32",
                "sample_rate": "int32",
                "n_samples": "int32",
            }
        )


def decode_audio(with_wav_payload: DataFrame) -> DataFrame:
    """WAV payload → audio metadata via a REAL container parse (stdlib
    `wave`), Arrow-batched mapInPandas, narrow map — the production shape
    for audio decode at 100 TB (batch-bounded memory, no shuffle)."""
    return with_wav_payload.mapInPandas(
        _wav_decode_batches, schema=AUDIO_DECODED_SCHEMA
    )


# --------------------------------------------------------------------------
# REAL codec path #2: BMP (uncompressed DIB) via stdlib struct + numpy.
# Like the WAV path, no third-party library is needed: the 54-byte
# BITMAPFILEHEADER/BITMAPINFOHEADER and the padded BGR pixel array are
# written and parsed for real, including actual pixel statistics from the
# decoded array — so the image decode is exercised end-to-end in-sandbox.
# Compressed codecs (PNG/JPEG/MP4) remain behind the import-gated stub.
# --------------------------------------------------------------------------

IMAGE_DECODED_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, bpp int, "
    "mean_pixel double, decoder string"
)


def _bmp_dims(doc_id: int) -> tuple[int, int]:
    return 8 + doc_id % 25, 8 + (doc_id * 3) % 17


def _bmp_bytes(doc_id: int) -> bytes:
    """Deterministic 24-bit BMP: width/height from _bmp_dims, every pixel
    in row y (bottom-up, as BMP stores them) has B=G=R=(doc_id + y) % 256.
    Rows are zero-padded to 4-byte boundaries per the BMP spec."""
    import struct

    w, h = _bmp_dims(doc_id)
    stride = (3 * w + 3) // 4 * 4
    pixel_bytes = stride * h
    off = 54
    header = struct.pack(
        "<2sIHHI", b"BM", off + pixel_bytes, 0, 0, off
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(h):
        val = (doc_id + y) % 256
        rows.append(bytes([val]) * (3 * w) + b"\x00" * (stride - 3 * w))
    return header + b"".join(rows)


def _bmp_px(payload: bytes):
    """Shared REAL BMP decode: validate magic, read geometry, return
    (width, height, bpp, pixel-array) with stride padding stripped."""
    import struct

    import numpy as np

    magic, _file_size, _r1, _r2, off = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    _hsize, w, h, _planes, bpp = struct.unpack_from("<IiiHH", payload, 14)
    stride = (bpp // 8 * w + 3) // 4 * 4
    arr = np.frombuffer(payload, dtype=np.uint8, offset=off)
    rows = arr[: stride * h].reshape(h, stride)[:, : bpp // 8 * w]
    return w, h, bpp, rows


def _bmp_parse(payload: bytes) -> dict:
    """Container metadata + mean channel value from the decoded array."""
    import numpy as np

    w, h, bpp, rows = _bmp_px(payload)
    # integer sum (exact in float64 far beyond these sizes) / exact count
    mean_pixel = float(rows.astype(np.float64).sum() / rows.size)
    return {
        "n_bytes": len(payload),
        "width": w,
        "height": h,
        "bpp": bpp,
        "mean_pixel": mean_pixel,
        "decoder": "struct-bmp",
    }


def _nn_resample(px, w: int, h: int, dst_w: int, dst_h: int, channels: int):
    """Nearest-neighbor resample with PER-PIXEL floor index maps, expanded
    by the channel offset — a per-BYTE column map would stitch a
    destination pixel from different source pixels/channels whenever
    w/dst_w is non-integral (caught in review; invisible on the synthetic
    B=G=R images, wrong on any real 24-bit data)."""
    import numpy as np

    row_idx = (np.arange(dst_h) * h) // dst_h
    px_idx = (np.arange(dst_w) * w) // dst_w
    col_idx = (px_idx[:, None] * channels + np.arange(channels)[None, :]).reshape(-1)
    return px[row_idx][:, col_idx]


def _bmp_encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": "image/bmp",
                "payload": [_bmp_bytes(int(d)) for d in pdf["doc_id"]],
            }
        )


def synthesize_bmp_payload(documents: DataFrame) -> DataFrame:
    """documents → (doc_id, 'image/bmp', genuine BMP payload bytes)."""
    return documents.select("doc_id").mapInPandas(
        _bmp_encode_batches, schema=AUDIO_PAYLOAD_SCHEMA
    )


def _bmp_decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for d, p in zip(pdf["doc_id"], pdf["payload"]):
            meta = _bmp_parse(bytes(p))
            meta["doc_id"] = int(d)
            rows.append(meta)
        out = pd.DataFrame(rows)
        yield out.astype(
            {"n_bytes": "int32", "width": "int32", "height": "int32", "bpp": "int32"}
        )


def decode_image(with_bmp_payload: DataFrame) -> DataFrame:
    """BMP payload → image metadata + real pixel statistics (Arrow
    mapInPandas, narrow map)."""
    return with_bmp_payload.mapInPandas(
        _bmp_decode_batches, schema=IMAGE_DECODED_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = (
    "doc_id long, n_samples int, rms double, zero_crossings int, peak int"
)


def _audio_feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL DSP kernel over REAL decoded samples: parse the WAV container,
    read the PCM frames, and compute signal features from the sample
    array — not from payload bytes. Offset-binary 8-bit PCM centers at
    128; RMS/peak/zero-crossings are the standard first-pass audio
    quality/segmentation features."""
    import io as _io
    import wave

    import numpy as np

    for pdf in batches:
        rows = []
        for d, p in zip(pdf["doc_id"], pdf["payload"]):
            r = wave.open(_io.BytesIO(bytes(p)), "rb")
            try:
                raw = r.readframes(r.getnframes())
            finally:
                r.close()
            s = np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
            # integer sums are exact in float64 at these sizes, so rms is
            # one correctly-rounded sqrt of an exact ratio — cross-engine
            # reproducible
            rms = float(np.sqrt(float((s * s).sum()) / len(s)))
            zc = int(((s[:-1] * s[1:]) < 0).sum())
            rows.append(
                {
                    "doc_id": int(d),
                    "n_samples": len(s),
                    "rms": rms,
                    "zero_crossings": zc,
                    "peak": int(np.abs(s).max()),
                }
            )
        yield pd.DataFrame(rows).astype(
            {"n_samples": "int32", "zero_crossings": "int32", "peak": "int32"}
        )


def audio_features(with_wav_payload: DataFrame) -> DataFrame:
    """WAV payload → (n_samples, rms, zero_crossings, peak) computed from
    the DECODED sample array (Arrow mapInPandas, narrow map)."""
    return with_wav_payload.mapInPandas(
        _audio_feature_batches, schema=AUDIO_FEATURES_SCHEMA
    )


RESIZED_SCHEMA = (
    "doc_id long, src_w int, src_h int, dst_w int, dst_h int, "
    "resized_mean double"
)


def _resize_batches(max_side: int):
    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """REAL pixel resample: decode the BMP array, nearest-neighbor
        downsample with integer floor index maps (floor keeps the index
        arithmetic bit-identical to the SQL oracle — round() differs
        between Python's banker's rounding and SQL half-up), and compute
        the resized image's mean from the actual resampled array."""
        import numpy as np

        for pdf in batches:
            rows = []
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                w, h, bpp, px = _bmp_px(bytes(p))
                mx = max(w, h)
                dst_w = max(1, (w * max_side) // mx) if mx > max_side else w
                dst_h = max(1, (h * max_side) // mx) if mx > max_side else h
                resized = _nn_resample(px, w, h, dst_w, dst_h, bpp // 8)
                rows.append(
                    {
                        "doc_id": int(d),
                        "src_w": w,
                        "src_h": h,
                        "dst_w": dst_w,
                        "dst_h": dst_h,
                        "resized_mean": float(
                            resized.astype(np.float64).sum() / resized.size
                        ),
                    }
                )
            yield pd.DataFrame(rows).astype(
                {"src_w": "int32", "src_h": "int32", "dst_w": "int32", "dst_h": "int32"}
            )

    return _batches


def resize_image(with_bmp_payload: DataFrame, *, max_side: int = 16) -> DataFrame:
    """BMP payload → nearest-neighbor downsample (long side clamped to
    ``max_side``) with the mean computed from the RESAMPLED pixel array —
    the pixel half of resize that resize_meta only planned. Arrow
    mapInPandas, narrow map."""
    return with_bmp_payload.mapInPandas(
        _resize_batches(max_side), schema=RESIZED_SCHEMA
    )
