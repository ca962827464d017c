"""Multimodal column plumbing (north-star surface, BASELINE.json).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; decode / feature-extraction runs as Arrow-batched pandas over
``mapInPandas``. The container has no media libraries, so the actual codec
step is STUBBED (import-gated): when PIL/librosa/cv2 are absent we emit a
deterministic fake decode derived from the bytes, keeping the Spark-side
plumbing — schema, partitioning, UDF signature, Arrow batch shape — real
and tested.

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

__all__ = ["attach_binary_payload", "decode_media", "DECODED_SCHEMA"]

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


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batch decode kernel. Real decode would open the payload with
    the media library; the stub derives deterministic pseudo-metadata from
    the payload bytes so tests pin the full pipeline shape."""
    import hashlib

    decoder = _try_real_decoder()
    for pdf in batches:
        if decoder is not None:
            # Real path (never taken in this container): PIL.Image.open on
            # BytesIO(payload) etc. Kept explicit so swapping in the real
            # codec is a one-function change.
            raise NotImplementedError(
                "real media decode not wired: container lacks test media"
            )
        payloads = pdf["payload"]
        sha = payloads.map(lambda b: hashlib.sha256(b).hexdigest())
        n_bytes = payloads.map(len).astype("int32")
        first = payloads.map(lambda b: b[0] if len(b) else 0).astype("int32")
        second = payloads.map(lambda b: b[1] if len(b) > 1 else 0).astype("int32")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": n_bytes,
                "sha256": sha,
                "width": first % 64 + 1,
                "height": second % 64 + 1,
                "n_frames": (pdf["doc_id"] % 30 + 1).astype("int32"),
                "decoder": "stub",
            }
        )


def decode_media(with_payload: DataFrame) -> DataFrame:
    """documents-with-payload → decoded metadata frame (mapInPandas)."""
    return with_payload.mapInPandas(_decode_batches, schema=DECODED_SCHEMA)
