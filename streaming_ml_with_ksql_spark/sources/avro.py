"""Avro encode/decode seam (capability-gated).

The reference's topics are Avro with schemas in Confluent Schema Registry
(reference: README.md:27,39 ``VALUE_FORMAT='AVRO'``; producers register
schemas explicitly, traffic-generator/generator.py:167-187). Spark's
equivalent is ``pyspark.sql.avro.functions.from_avro/to_avro`` with the
writer schema supplied as JSON — registry integration is one
``GET /subjects/{topic}-value/versions/latest`` away and deliberately out
of engine scope (SURVEY.md §2.1 S1).

The spark-avro module ships with Spark but may be absent from a stripped
classpath, so decode/encode raise a clear capability error instead of an
opaque ClassNotFoundException mid-query. When it IS absent (this sandbox:
avro_available() measures False), ``sources/avro_py.py`` implements the
Avro BINARY value encoding itself, pure-Python from the public spec — so
VALUE_FORMAT='AVRO' round-trips end-to-end in-sandbox and the
``avro_source_roundtrip`` registry query hash-checks it against the
parquet oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession

__all__ = ["avro_available", "decode_avro", "encode_avro"]


def avro_available(spark: SparkSession) -> bool:
    """True iff the Avro SQL functions are actually USABLE in this session.

    Neither a Python import (the pyspark wrapper always ships) nor a JVM
    Class.forName (some org.apache.spark.sql.avro classes ride inside
    spark-sql even when the spark-avro data source module is absent — in
    which case calls fail with AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE)
    is an honest probe. The only reliable check is evaluating a one-row
    to_avro expression end-to-end.
    """
    try:
        from pyspark.sql import functions as F
        from pyspark.sql.avro.functions import to_avro

        spark.range(1).select(to_avro(F.struct("id"))).collect()
        return True
    except Exception:
        return False


def decode_avro(data: Column, writer_schema_json: str) -> Column:
    """``from_avro`` over a binary column (e.g. a Kafka record value)."""
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "spark-avro is not on the classpath; add the spark-avro module "
            "to decode Avro-encoded streams"
        ) from e
    return from_avro(data, writer_schema_json)


def encode_avro(data: Column, schema_json: str | None = None) -> Column:
    """``to_avro`` for topic sinks (reference: derived streams materialize
    back to Avro topics, README.md:28,41,62)."""
    try:
        from pyspark.sql.avro.functions import to_avro
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "spark-avro is not on the classpath; add the spark-avro module "
            "to encode Avro-encoded streams"
        ) from e
    return to_avro(data) if schema_json is None else to_avro(data, schema_json)
