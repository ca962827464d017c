"""Size-aware fan-out (operators/sizing.py, VERDICT r4 fix): cheap
kernels must stop paying full-width task overhead on small frames, heavy
kernels must keep the full configured width, and io.load_table's footer
row hint must make the sizing free (no count job needed)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_ml_with_ksql_spark import io as sio
from streaming_ml_with_ksql_spark.operators import multimodal, sizing


def test_load_table_attaches_footer_row_hint(spark, sf_small):
    docs = sio.load_table(spark, sf_small, "documents")
    hint = sizing.row_hint(docs)
    assert hint == docs.count()  # exact, from parquet footer metadata


def test_fan_out_clamps_small_frames(spark):
    df = spark.range(100)
    n_max = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert sizing.fan_out(df, rows_per_task=50).rdd.getNumPartitions() == 2
    assert sizing.fan_out(df, rows_per_task=1).rdd.getNumPartitions() == n_max
    assert sizing.fan_out(df, rows_per_task=10**6).rdd.getNumPartitions() == 1
    assert (
        sizing.fan_out(df, parallelism=7).rdd.getNumPartitions() == 7
    )  # explicit override wins


def test_fan_out_uses_hint_over_count(spark):
    df = spark.range(10)
    n_max = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # an (over)estimated ancestor hint widens the fan-out — the safe
    # direction after filters drop rows
    wide = sizing.fan_out(df, rows_per_task=10, approx_rows=100)
    assert wide.rdd.getNumPartitions() == min(n_max, 10)


def test_cheap_codec_narrow_heavy_codec_wide(spark, sf_small):
    """The per-codec weights: WAV synthesis (cheap PCM write) fans out
    narrower than JPEG synthesis (DCT+Huffman) on the same 500-doc frame."""
    docs = sio.load_table(spark, sf_small, "documents")
    n_max = int(spark.conf.get("spark.sql.shuffle.partitions"))
    wav = multimodal.synthesize_wav_payload(docs)
    jpg = multimodal.synthesize_jpeg_payload(docs)
    n_wav = wav.rdd.getNumPartitions()
    n_jpg = jpg.rdd.getNumPartitions()
    assert n_wav == 1  # 500 rows / 1024 rows-per-task
    assert n_jpg == min(n_max, 8)  # 500 rows / 64 rows-per-task
    # results are fan-out-invariant: same decode output either way
    a = sorted(
        (r.doc_id, r.n_samples)
        for r in multimodal.decode_audio(wav).select("doc_id", "n_samples").collect()
    )
    b = sorted(
        (r.doc_id, r.n_samples)
        for r in multimodal.decode_audio(
            multimodal.synthesize_wav_payload(docs.repartition(16))
        )
        .select("doc_id", "n_samples")
        .collect()
    )
    assert a == b and len(a) == 500


def test_fan_out_never_counts_derived_lineage(spark):
    """A hint-less frame whose lineage contains a join/aggregate must NOT
    be sized by count() — that re-executes the whole upstream DAG once per
    fan-out (ADVICE r5: corpus_curation_pipeline re-ran its
    clean+decontaminate join DAG inside bpe_tokenize). Such frames keep
    the full configured width; the proof that no count ran is a kernel
    poison pill that would make the count job fail."""
    import pyspark.sql.functions as F

    n_max = int(spark.conf.get("spark.sql.shuffle.partitions"))

    @F.udf("long")
    def boom(v):
        raise RuntimeError("fan_out executed the derived DAG to size it")

    a = spark.range(50).select(F.col("id"), boom(F.col("id")).alias("x"))
    b = spark.range(50).withColumnRenamed("id", "id2")
    derived = a.join(b, a.id == b.id2).groupBy("id").count()
    # sizing must not trigger a job; materializing the fan-out plan lazily
    # is fine — only .count()/.collect() would detonate the pill
    assert not sizing._count_is_cheap(derived)
    out = sizing.fan_out(derived, rows_per_task=10)
    assert out.rdd.getNumPartitions() == n_max

    # scan-shaped lineage still counts (and clamps) as before
    assert sizing._count_is_cheap(spark.range(100))
    assert sizing.fan_out(spark.range(100), rows_per_task=50).rdd.getNumPartitions() == 2


def test_cogroup_lineage_is_expensive(spark):
    """FlatMapCoGroupsInPandas (cogroup applyInPandas — the pq_search /
    ivfpq_search query side) must register as expensive lineage: its
    node name lacked the old 'FlatMapGroupsIn' substring, so a
    cogroup-derived frame would have been count()ed — re-executing its
    Python DAG (ADVICE r6)."""
    import pandas as pd
    import pyspark.sql.functions as F

    a = spark.range(10).withColumn("k", F.lit(1))
    b = spark.range(5).withColumn("k", F.lit(1))

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [len(left) + len(right)]})

    co = a.groupBy("k").cogroup(b.groupBy("k")).applyInPandas(
        merge, schema="n long"
    )
    assert not sizing._count_is_cheap(co)
