"""Bloom-filter semi-join reduction (pre-shuffle fact pruning).

When a join's dimension side is too large to broadcast but its KEY SET
still fits a few kilobytes of bitmap, a Bloom filter built from the dim
keys prunes the fact side BEFORE the shuffle — the dominant cost of a big
join at 100 TB is shuffling fact rows that will never match. Spark's
optimizer does this automatically for some shapes
(spark.sql.optimizer.runtime.bloomFilter.enabled, Spark 3.3+); this
operator is the explicit, planner-independent form with a deterministic,
engine-agnostic hash family.

Design:
- Build side: k = ``num_hashes`` positions per key via xxhash64(key, i)
  mod m, folded into an m-bit bitmap as m/64 longs with ONE distributed
  groupBy(word) + bit_or — the shuffle carries set bit-words only, and
  only the final <= m/64 rows (a few KB) land on the driver. This is the
  same driver-sized footprint as a broadcast-join build, not a
  collect-the-data antipattern.
- Probe side: the membership test is a pure Catalyst expression over a
  literal long-array (element_at + bitwiseAND), so the filter runs inside
  whole-stage codegen on the fact scan — upstream of the join's exchange.
  No false negatives (Bloom property), so following with the EXACT join
  yields exactly the plain join's result; false positives only cost
  shuffled bytes, bounded by (1 - e^(-k·n/m))^k.
- The join itself is hinted shuffle_hash: with a broadcastable dim the
  bloom would be pointless (the broadcast probe is already a filter);
  the operator models the dim-too-big-to-broadcast regime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["build_bloom_words", "might_contain", "bloom_pruned_join"]


def build_bloom_words(
    keys: DataFrame, key: str, *, num_bits: int = 1 << 16, num_hashes: int = 4
) -> list[int]:
    """Aggregate dim keys into an m-bit Bloom bitmap, returned as a dense
    list of m/64 longs (index = bit_position div 64)."""
    positions = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(num_bits))
                    for i in range(num_hashes)
                ]
            )
        ).alias("pos")
    )
    words = (
        positions.select(
            F.expr("pos div 64").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    dense = [0] * (num_bits // 64)
    for r in words:
        dense[r["w"]] = r["bits"]
    return dense


def might_contain(
    col: Column, words: list[int], *, num_hashes: int = 4
) -> Column:
    """Catalyst membership test: true iff all k hash positions of ``col``
    are set in ``words``. Stays inside whole-stage codegen."""
    num_bits = len(words) * 64
    arr = F.array(*[F.lit(w) for w in words])
    cond = F.lit(True)
    for i in range(num_hashes):
        pos = F.pmod(F.xxhash64(col, F.lit(i)), F.lit(num_bits))
        # word index = pos div 64, bit index = pos mod 64 — as shifts/masks
        # so the whole test is integer ops on one hash evaluation per i.
        word = F.element_at(arr, (F.shiftright(pos, 6) + 1).cast("int"))
        bit = F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            pos.bitwiseAND(F.lit(63)).cast("int"),
        )
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    *,
    num_bits: int = 1 << 16,
    num_hashes: int = 4,
) -> DataFrame:
    """Exact inner join with Bloom pre-pruning of the fact side: build the
    bitmap from dim keys, filter fact rows through it before the shuffle,
    then shuffle-hash-join exactly. Result ≡ plain inner join (no false
    negatives); the bloom only shrinks the exchange."""
    words = build_bloom_words(
        dim.select(dim_key), dim_key, num_bits=num_bits, num_hashes=num_hashes
    )
    pruned = fact.filter(
        might_contain(F.col(fact_key), words, num_hashes=num_hashes)
    )
    return pruned.join(
        dim.hint("shuffle_hash"), F.col(fact_key) == F.col(dim_key)
    )
