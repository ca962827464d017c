"""Round-7 continuation (third block): density-based clustering over
the embedding table — the DBSCAN family member alongside integer
k-means (centroid view) and the components-based semantic dedup
(transitive view).

Imported LAST from ``registry/__init__.py`` so the registration tail
order of all earlier queries is untouched.
"""

from __future__ import annotations

from ._core import *  # noqa: F401,F403
from ._core import _REGISTRY, _t, register  # noqa: F401
from ..operators import clustering


def _dbscan_oracle(min_neighbors: int = 2) -> str:
    """Nest the VERIFIED embedding_near_dup_pairs statement as the
    eps-neighborhood generator (the corpus_curation_pipeline composition
    rule), then express core/border/noise and the core-core components
    fixpoint as a recursive CTE — min-label closure over integers is
    exact, so it replays Spark's star-contraction labels verbatim."""
    pairs_sql = _REGISTRY["embedding_near_dup_pairs"].oracle
    return f"""
    WITH RECURSIVE pairs AS (
      SELECT vec_a, vec_b FROM ({pairs_sql}) q),
    edges AS (SELECT vec_a AS u, vec_b AS v FROM pairs
              UNION ALL SELECT vec_b, vec_a FROM pairs),
    deg AS (SELECT u, count(*) AS d FROM edges GROUP BY u),
    core AS (SELECT u FROM deg WHERE d >= {min_neighbors}),
    cedges AS (
      SELECT e.u, e.v FROM edges e
      JOIN core a ON e.u = a.u JOIN core b ON e.v = b.u),
    reach(u, label) AS (
      SELECT u, u FROM core
      UNION
      SELECT e.v, r.label FROM reach r JOIN cedges e ON e.u = r.u),
    comp AS (SELECT u, min(label) AS cid FROM reach GROUP BY u),
    border AS (
      SELECT e.u, min(c.cid) AS cid
      FROM edges e JOIN comp c ON c.u = e.v
      WHERE e.u NOT IN (SELECT u FROM core)
      GROUP BY e.u)
    SELECT v.vec_id,
           CASE WHEN cc.cid IS NOT NULL THEN 'core'
                WHEN bc.cid IS NOT NULL THEN 'border'
                ELSE 'noise' END AS role,
           CAST(coalesce(cc.cid, bc.cid, -1) AS DOUBLE) AS cluster_id_d
    FROM embeddings v
    LEFT JOIN comp cc ON cc.u = v.vec_id
    LEFT JOIN border bc ON bc.u = v.vec_id
    """


@register("dbscan_embedding_clusters", _dbscan_oracle(2))
def q_dbscan_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN over the embedding corpus: eps-neighborhoods from the
    exact-rescored blocked-GEMM pair generator (bit-identical to the
    all-pairs SQL at cosine >= 0.4), then core (>= 2 eps-neighbors),
    clusters (min-core-id components over core-core edges, star
    contraction), border (min core-neighbor cluster), noise (-1) —
    the density view of the embedding space that k-means' centroids
    and the dedup components' transitive closure both miss (a sparse
    bridge point is 'noise' here but merges components there).
    Per-vertex output over ALL vec_ids; deterministic at any
    partitioning (operators/clustering.py dbscan_from_pairs)."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = similarity.embedding_near_dup_pairs_blocked(emb)
    out = clustering.dbscan_from_pairs(emb, pairs, min_neighbors=2)
    return out.select(
        "vec_id",
        "role",
        F.col("cluster_id").cast("double").alias("cluster_id_d"),
    )
