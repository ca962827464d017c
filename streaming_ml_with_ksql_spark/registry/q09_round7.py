"""Round-7 additions: streaming maintenance twin for the perceptual
image-dedup family (VERDICT r6 #6) and subsequent round-7 operators.

Imported LAST from ``registry/__init__.py`` so the registration tail
order of all earlier queries is untouched.
"""

from __future__ import annotations

from ._core import *  # noqa: F401,F403
from ._core import _REGISTRY, _t, register  # noqa: F401
from .q04_streamksql import _STREAM_SEQ  # noqa: F401
from .q06_sketchseries import _replay_documents  # noqa: F401


@register(
    "streaming_image_dedup",
    # The streamed document set is the FULL corpus (stateless append
    # emits every row; no watermark filtering), so the batch family
    # composite's verified oracle applies verbatim — the strongest
    # batch≡stream check available (same idiom as streaming_corpus_ingest).
    _REGISTRY["image_dedup_groups"].oracle,
)
def q_streaming_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the perceptual image-dedup family (the last
    north-star family without one — embeddings got ivf_ingest in r6):
    documents replayed as a file stream, PNG payloads synthesized and
    dHashed with the SAME narrow Arrow kernels as the batch path (both
    stages stateless → the append emission set equals the batch hash
    table exactly), then the continuously-maintained hash table is
    resolved into dedup groups by the banded-Hamming pair join + star
    components — the same split as the streaming quantile/rollup twins:
    ingest is continuous, resolution reads the drained state. Reference
    analog: the continuous topic-materialization pattern
    (README.md:41-52)."""
    docs = _t(spark, sf_dir, "documents")
    stream = _replay_documents(spark, sf_dir)
    hashes = multimodal.image_dhash(multimodal.synthesize_png_payload(stream))
    drained = stream_sinks.run_to_memory(
        hashes, f"reg_stream_imgdedup_{next(_STREAM_SEQ)}"
    )
    pairs = multimodal.image_near_dup_pairs_dhash(drained, max_hamming=3)
    return graph.dedup_groups(
        docs,
        pairs,
        id_col="doc_id",
        a_col="doc_a",
        b_col="doc_b",
        algorithm="star",
    )
